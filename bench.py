"""Benchmark: end-to-end 32-shell MSI inference + novel-view render.

The BASELINE.md north star: 640x320, 32 PSV planes x 2 eyes in, 32 RGBA
shells out, one novel ERP view — under 10 ms/frame on one TPU chip.

Prints ONE JSON line:
  {"metric": "msi_e2e_fps_640x320", "value": <frames/sec>, "unit": "fps",
   "vs_baseline": <value / 100fps-baseline>}
plus component timings on stderr for profiling.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # Amortize the (slow, esp. remotely) TPU compiles across runs.
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/matry_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from matryodshka_tpu.geometry import sweep as sweep_lib
    from matryodshka_tpu.models import msi as msi_lib
    from matryodshka_tpu.training import state as state_lib

    cfg = _flagship_cfg()

    def _render_opts(cfg):
        if cfg.compute_dtype == "bfloat16":
            return {"dtype": jnp.bfloat16}
        return None

    # Device enumeration through the axon tunnel can hang indefinitely
    # when the relay's TPU pool is unreachable (observed multi-hour
    # outages); fail fast and loud instead of wedging the caller.
    import threading

    def _init_watchdog():
        print("[bench] FATAL: TPU backend init exceeded 900 s — "
              "tunnel down? aborting without a number", file=sys.stderr)
        sys.stderr.flush()
        import os
        os._exit(3)

    _t = threading.Timer(900.0, _init_watchdog)
    _t.daemon = True
    _t.start()
    print(f"[bench] devices: {jax.devices()}", file=sys.stderr)
    _t.cancel()
    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    batch = _synthetic_batch(cfg)
    psv_depths = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_psv_planes))
    msi_depths = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_msi_planes))

    # The whole-net kernel is new TPU surface: probe-compile it at the
    # real shape first and fall back to the XLA net if Mosaic rejects
    # anything, so the bench always produces a number.
    fused_net = msi_lib.fused_net_ops(model, state.params, cfg)
    if fused_net is not None and jax.default_backend() == "tpu":
        try:
            from matryodshka_tpu.ops import pallas_net
            pc = cfg.num_psv_planes * 3
            xp = jnp.zeros((pc, cfg.height + 2 * pallas_net.X_ROW_PAD,
                            cfg.width), cfg.jnp_compute_dtype)
            jax.block_until_ready(pallas_net.unet_forward(
                (xp, xp), fused_net[0], fused_net[1], fused_net[2],
                flipped=fused_net[3], variant=fused_net[4]))
            print("[bench] fused net kernel: ok", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — any compile failure
            print(f"[bench] fused net kernel unavailable ({type(e).__name__}: "
                  f"{str(e)[:200]}) — falling back to the XLA net",
                  file=sys.stderr)
            fused_net = None

    # Re-arm compile-sensitive flags (net_x2, roll16) iff the relay's
    # compile backend changed since the last arming: a fingerprint
    # match costs one file read; a mismatch costs one probe compile per
    # flag and re-wins e.g. net_x2's measured 0.3 ms automatically.
    if jax.default_backend() == "tpu":
        try:
            from matryodshka_tpu.ops import perf_probe
            perf_probe.ensure_armed(
                fused_net=fused_net, height=cfg.height, width=cfg.width,
                psv_planes=cfg.num_psv_planes,
                dtype=cfg.jnp_compute_dtype,
                _log=lambda m: print(m, file=sys.stderr))
        except Exception as e:  # noqa: BLE001 — never cost the metric
            print(f"[bench] perf probe failed ({type(e).__name__}: "
                  f"{str(e)[:200]}) — keeping stored flags",
                  file=sys.stderr)

    from matryodshka_tpu.ops import pallas_render as _pr

    def _make_e2e_prepared(blend_fused):
        def _e2e_prepared(params, batch):
            outs = msi_lib.infer_msi_prepared(
                lambda p, x: model.apply(p, x), params, cfg, batch,
                psv_depths, fused_net=fused_net,
                blend_fused=blend_fused)
            if outs is None:
                return None
            b = outs["msi_pred"].shape[0]
            eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
            return msi_lib.render_equirect_view_from_prepared(
                outs, eye, batch["tgt_pose"], msi_depths, cfg.height)
        return _e2e_prepared

    # probe cascade: blend-fused FTB (if enabled) -> prepared stack ->
    # round-2 path; each level falls back if Mosaic rejects it
    use_prepared = (cfg.use_pallas and cfg.input_type == "ODS"
                    and jax.default_backend() == "tpu")
    _e2e_prepared = None
    _picked_bf = None
    if use_prepared:
        candidates = ([True, False] if _pr.DEFAULT_FTBB else [False])
        for bf in candidates:
            fn = _make_e2e_prepared(bf)
            try:
                jax.block_until_ready(jax.jit(fn)(state.params, batch))
                print(f"[bench] prepared pipeline (blend_fused={bf}): ok",
                      file=sys.stderr)
                _e2e_prepared = fn
                _picked_bf = bf
                break
            except Exception as e:  # noqa: BLE001
                print(f"[bench] prepared pipeline (blend_fused={bf}) "
                      f"unavailable ({type(e).__name__}: "
                      f"{str(e)[:200]})", file=sys.stderr)
        if _picked_bf:
            # guard a silently-wrong blend-fused kernel: its output must
            # match the prepared-stack pipeline (same sweep + net)
            try:
                a = jax.jit(_make_e2e_prepared(False))(state.params,
                                                       batch)
                b_ = jax.jit(_e2e_prepared)(state.params, batch)
                dd = float(jnp.max(jnp.abs(a - b_)))
                print(f"[bench] blend_fused-vs-prepared max err: "
                      f"{dd:.2e}", file=sys.stderr)
                if not (dd < 0.02):
                    print("[bench] blend_fused output DIVERGES — "
                          "dropping to the prepared pipeline",
                          file=sys.stderr)
                    _e2e_prepared = _make_e2e_prepared(False)
            except Exception as e:  # noqa: BLE001
                print(f"[bench] blend_fused check failed "
                      f"({type(e).__name__}) — keeping prepared "
                      f"pipeline", file=sys.stderr)
                _e2e_prepared = _make_e2e_prepared(False)
        use_prepared = _e2e_prepared is not None
        if not use_prepared:
            print("[bench] falling back to the round-2 path",
                  file=sys.stderr)

    @jax.jit
    def e2e(params, batch):
        if use_prepared:
            out = _e2e_prepared(params, batch)
            if out is not None:
                return out
        outputs = msi_lib.infer_msi(lambda p, x: model.apply(p, x), params,
                                    cfg, batch, psv_depths)
        rgba = outputs["rgba_layers"]
        b = rgba.shape[0]
        eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
        return msi_lib.render_equirect_view(rgba, eye, batch["tgt_pose"],
                                            msi_depths,
                                            use_pallas=cfg.use_pallas,
                                            pallas_opts=_render_opts(cfg))

    # Through the remote-TPU relay, per-dispatch round trips (~25-35 ms)
    # dwarf the compute; chain K frames inside ONE jit with a data
    # dependency so the measurement is steady-state device time.
    CHAIN = 20

    @jax.jit
    def e2e_chain(params, batch):
        def body(_, ref):
            b2 = dict(batch)
            b2["ref_image"] = ref
            out = e2e(params, b2)
            return jnp.clip(out, 0.0, 1.0)
        return jax.lax.fori_loop(0, CHAIN, body, batch["ref_image"])

    def timeit(fn, *args, iters=5, warmup=2, chain=1):
        for _ in range(warmup):
            jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / (iters * chain) * 1000.0

    # Full-pipeline exactness: the hot path (fused sweep/net/render
    # kernels, bf16 storage) against the reference-semantics path (XLA
    # net + f32 gather render). Bounds every kernel divergence at once.
    hot_out = jax.jit(e2e)(state.params, batch)

    @jax.jit
    def e2e_reference(params, batch):
        outputs = msi_lib.infer_msi(lambda p, x: model.apply(p, x),
                                    params, cfg, batch, psv_depths)
        rgba = outputs["rgba_layers"].astype(jnp.float32)
        b = rgba.shape[0]
        eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
        return msi_lib.render_equirect_view(rgba, eye, batch["tgt_pose"],
                                            msi_depths, use_pallas=False)

    ref_out = e2e_reference(state.params, batch)
    err = float(jnp.max(jnp.abs(hot_out - ref_out)))
    print(f"[bench] hot-path vs reference-semantics e2e max err: "
          f"{err:.2e}", file=sys.stderr)

    # ---- stage breakdown: CHAINED timers on the hot path's OWN
    # operands, so the stages compose to ≈ e2e (no layout-mismatched
    # legacy stages; VERDICT r3 item 4) ----
    planar = (use_prepared and fused_net is not None and fused_net[3])
    stage_msg = None
    if planar:
        from matryodshka_tpu.ops import pallas_net, pallas_sweep
        net_ops, ngf, k_out, flipped, net_variant = fused_net
        pad = pallas_sweep.NET_ROW_PAD
        hp = cfg.height + 2 * pad

        @jax.jit
        def stage_sweep(batch):
            def body(_, rr):
                r = msi_lib.preprocess_image(rr)
                s = msi_lib.preprocess_image(batch["src_image"])
                fgP, _ = pallas_sweep.ods_sweep_identity_planar(
                    r, s, psv_depths, batch["intrinsics"],
                    out_dtype=cfg.jnp_compute_dtype)
                return jnp.clip(
                    rr * 0.999 + fgP.astype(jnp.float32).mean() * 1e-6,
                    0.0, 1.0)
            return jax.lax.fori_loop(0, CHAIN, body, batch["ref_image"])

        @jax.jit
        def _mk_operands(batch):
            r = msi_lib.preprocess_image(batch["ref_image"])
            s = msi_lib.preprocess_image(batch["src_image"])
            return pallas_sweep.ods_sweep_identity_planar(
                r, s, psv_depths, batch["intrinsics"],
                out_dtype=cfg.jnp_compute_dtype)

        fgP0, bgP0 = _mk_operands(batch)
        b_, p_, c_ = fgP0.shape[0], fgP0.shape[1], fgP0.shape[2]

        def _net(fgP, bgP):
            return jnp.stack([pallas_net.unet_forward(
                (fgP[i].reshape(p_ * c_, hp, cfg.width),
                 bgP[i].reshape(p_ * c_, hp, cfg.width)),
                net_ops, ngf, k_out, flipped=flipped,
                variant=net_variant) for i in range(b_)])

        @jax.jit
        def stage_net(fgP, bgP):
            def body(_, xs):
                a, bb = xs
                y = _net(a, bb)
                dep = (y.astype(jnp.float32).mean() * 1e-6).astype(
                    a.dtype)
                return (a * 0.999 + dep, bb)
            return jax.lax.fori_loop(0, CHAIN, body, (fgP, bgP))

        pred0 = jax.jit(_net)(fgP0, bgP0)

        @jax.jit
        def stage_assemble_render(pred, fgP, bgP, tgt_pose):
            def body(_, pp):
                outs = msi_lib.assemble_outputs_planar(
                    cfg, pp, fgP, bgP, blend_fused=bool(_picked_bf))
                eye = jnp.tile(jnp.eye(4)[None], (b_, 1, 1))
                img = msi_lib.render_equirect_view_from_prepared(
                    outs, eye, tgt_pose, msi_depths, cfg.height)
                return pp * 0.999 + img.mean().astype(pp.dtype) * 1e-6
            return jax.lax.fori_loop(0, CHAIN, body, pred)

        ms_sw = timeit(stage_sweep, batch, iters=3, chain=CHAIN)
        ms_nt = timeit(stage_net, fgP0, bgP0, iters=3, chain=CHAIN)
        ms_ar = timeit(stage_assemble_render, pred0, fgP0, bgP0,
                       batch["tgt_pose"], iters=3, chain=CHAIN)
        stage_msg = (f"[bench] stages (chained, hot-path operands, "
                     f"blend_fused={bool(_picked_bf)}): sweep={ms_sw:.2f} "
                     f"net={ms_nt:.2f} assemble+render={ms_ar:.2f} "
                     f"sum={ms_sw + ms_nt + ms_ar:.2f} ms")
    else:
        # Fallback pipelines get the coarse (non-additive) component
        # timings — enough to see which piece regressed.
        @jax.jit
        def sweep_only(batch):
            ref = msi_lib.preprocess_image(batch["ref_image"])
            src = msi_lib.preprocess_image(batch["src_image"])
            return sweep_lib.format_network_input(
                ref, src, batch["ref_pose"], batch["src_pose"],
                batch["ref_pose_inv"], psv_depths, batch["intrinsics"],
                use_pallas=cfg.use_pallas)

        net_input = sweep_only(batch)

        @jax.jit
        def net_only(params, net_input):
            return model.apply(params, net_input)

        pred = net_only(state.params, net_input)
        rgba = msi_lib.assemble_rgba(cfg.which_color_pred, pred,
                                     net_input,
                                     cfg.num_msi_planes)["rgba_layers"]

        @jax.jit
        def render_only(rgba, tgt_pose):
            b = rgba.shape[0]
            eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
            return msi_lib.render_equirect_view(
                rgba, eye, tgt_pose, msi_depths,
                use_pallas=cfg.use_pallas,
                pallas_opts=_render_opts(cfg))

        ms_sweep = timeit(sweep_only, batch, iters=20)
        ms_net = timeit(net_only, state.params, net_input, iters=20)
        ms_render = timeit(render_only, rgba, batch["tgt_pose"],
                           iters=20)
        stage_msg = (f"[bench] stages (FALLBACK path, non-additive): "
                     f"sweep={ms_sweep:.2f} net={ms_net:.2f} "
                     f"render={ms_render:.2f} ms")

    # Headline: min over 3 repeated timing groups — the relay's
    # per-dispatch RTT occasionally stalls a group (observed 12.91 vs
    # 14.25 ms for the identical program minutes apart); the min of
    # group means rejects those transients while each group still
    # amortizes dispatch overhead over iters*CHAIN frames.
    ms_e2e = min(timeit(e2e_chain, state.params, batch, chain=CHAIN)
                 for _ in range(3))

    print(stage_msg + f" | e2e={ms_e2e:.2f} ms", file=sys.stderr)
    from matryodshka_tpu.ops import pallas_net as _pn
    print(f"[bench] flags: ftb={_pr.DEFAULT_FTB} ftbb={_pr.DEFAULT_FTBB} "
          f"vtap={_pr.DEFAULT_VTAP} net_x2={_pn._default_net_x2()} "
          f"wb={_pr.default_wb(cfg.width)} "
          f"net={'fused-' + fused_net[4] if fused_net else 'xla'} "
          f"pipeline={'blend_fused' if _picked_bf else ('prepared' if use_prepared else 'round2')}",
          file=sys.stderr)

    # Training throughput (VERDICT r3 item 3): the jitted DP train step
    # at the production shape, pixel loss, fed keys the way the real
    # loop does (fold_in; loop.py:90). Compile is amortized by the
    # persistent cache; any failure must not cost the bench metric.
    import os as _os
    if _os.environ.get("BENCH_TRAIN", "1") != "0":
        try:
            from matryodshka_tpu.parallel import dp as _dp
            from matryodshka_tpu.parallel import mesh as _mesh_lib
            from matryodshka_tpu.training import state as _state_lib
            tcfg = cfg.replace(which_loss="pixel", coord_net=True)
            tmesh = _mesh_lib.make_mesh(data=1)
            tstate, tmodel = _state_lib.init_state(
                tcfg, jax.random.PRNGKey(0))
            # Scan form: K steps chained in ONE dispatch. Python-loop
            # timings through the relay are unreliable in BOTH
            # directions (block_until_ready returns on enqueue-ack;
            # per-dispatch host pathologies add seconds — STATUS.md
            # round 4, tools/train_probe3.py).
            K = 5
            tstep = _dp.make_dp_train_multi_step(
                tcfg, tmodel.apply, _state_lib.build_optimizer(tcfg),
                tmesh, steps_per_call=K)
            hb = {k: np.asarray(v) for k, v in batch.items()}
            tbatch = _dp.stack_batches([hb] * K, tmesh)
            tkey = jax.random.PRNGKey(1)
            tstate, tm = tstep(tstate, tbatch, tkey)   # compile
            jax.block_until_ready(tm["total_loss"])
            n_calls = 2
            t0 = time.perf_counter()
            for i in range(n_calls):
                tstate, tm = tstep(tstate, tbatch, tkey)
            jax.block_until_ready(tm["total_loss"])
            tms = (time.perf_counter() - t0) / (n_calls * K) * 1000.0
            print(f"[bench] train step (DP, pixel, b{tcfg.batch_size}, "
                  f"scan x{K}): {tms:.1f} ms/step "
                  f"({1000.0 / tms:.2f} steps/s; "
                  f"140k steps = {tms * 140_000 / 3.6e6:.1f} h)",
                  file=sys.stderr)

            # Forward-only split (VERDICT r4 item 3): the same loss,
            # scanned with a batch data-dependency so XLA cannot hoist
            # the loop-invariant loss out of the chain. bwd+update =
            # full step - this; a healthy ratio is fwd*(2-3x).
            from matryodshka_tpu.training.step import make_loss_fn
            floss = make_loss_fn(tcfg, tmodel.apply)
            KF = 10

            @jax.jit
            def fwd_chain(params, batch, rng):
                def body(i, carry):
                    b2 = dict(batch)
                    # ~1e-20 nudge: numerically invisible, but makes
                    # each iteration's loss depend on the previous one
                    b2["tgt_image"] = (batch["tgt_image"]
                                       + carry * 1e-20)
                    loss, _ = floss(params, b2,
                                    jax.random.fold_in(rng, i))
                    return loss
                return jax.lax.fori_loop(
                    0, KF, body, jnp.float32(0.0))

            fb = {k: jnp.asarray(np.asarray(v))
                  for k, v in batch.items()}
            jax.block_until_ready(fwd_chain(tstate.params, fb, tkey))
            t0 = time.perf_counter()
            jax.block_until_ready(fwd_chain(tstate.params, fb, tkey))
            fms = (time.perf_counter() - t0) / KF * 1000.0
            print(f"[bench] train fwd-only (pixel, scan x{KF}): "
                  f"{fms:.1f} ms/step -> bwd+update = "
                  f"{tms - fms:.1f} ms = {max(tms - fms, 0) / max(fms, 1e-9):.1f}x fwd",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — never cost the metric
            print(f"[bench] train-step timing unavailable "
                  f"({type(e).__name__}: {str(e)[:160]})",
                  file=sys.stderr)

    # GCN forward timing (VERDICT r4 item 8): secondary metric on
    # stderr. Only runs when the production mesh assets are already
    # cached (generation is ~2.5 min of host CPU — never inside bench).
    if _os.environ.get("BENCH_GCN", "1") != "0":
        gcache = _os.path.join("glob", "train", "gcn",
                               f"sphere7_{cfg.height}x{cfg.width}.npz")
        if _os.path.exists(gcache):
            try:
                from matryodshka_tpu.training import state as _sl
                gcfg = cfg.replace(gcn=True, subdiv=7)
                gstate, gmodel = _sl.init_state(gcfg,
                                                jax.random.PRNGKey(0))
                _, gcoords, gp2v = _sl.build_gcn(gcfg)

                @jax.jit
                def gcn_fwd_chain(params, batch):
                    def body(_, ref):
                        b2 = dict(batch)
                        b2["ref_image"] = ref
                        outs = msi_lib.infer_gcn_msi(
                            lambda p, x: gmodel.apply(p, x), params,
                            gcfg, b2, psv_depths, gcoords, gp2v)
                        dep = outs["rgba_layers"].astype(
                            jnp.float32).mean() * 1e-6
                        return jnp.clip(ref * 0.999 + dep, 0.0, 1.0)
                    return jax.lax.fori_loop(0, CHAIN, body,
                                             batch["ref_image"])

                gms = timeit(gcn_fwd_chain, gstate.params, batch,
                             iters=3, chain=CHAIN)
                print(f"[bench] gcn forward (subdiv7, "
                      f"{cfg.width}x{cfg.height}x"
                      f"{cfg.num_psv_planes}): {gms:.2f} ms",
                      file=sys.stderr)
            except Exception as e:  # noqa: BLE001 — never cost the metric
                print(f"[bench] gcn timing unavailable "
                      f"({type(e).__name__}: {str(e)[:160]})",
                      file=sys.stderr)
        else:
            print(f"[bench] gcn timing skipped (no mesh cache at "
                  f"{gcache})", file=sys.stderr)

    fps = 1000.0 / ms_e2e
    print(json.dumps({
        "metric": "msi_e2e_fps_640x320",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 100.0, 4),
    }))


if __name__ == "__main__":
    main()
