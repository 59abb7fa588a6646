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

    # component pieces for the stderr breakdown
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

    @jax.jit
    def render_only(rgba, tgt_pose):
        b = rgba.shape[0]
        eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
        return msi_lib.render_equirect_view(rgba, eye, tgt_pose, msi_depths,
                                            use_pallas=cfg.use_pallas,
                                            pallas_opts=_render_opts(cfg))

    pred = net_only(state.params, net_input)
    rgba = msi_lib.assemble_rgba(cfg.which_color_pred, pred, net_input,
                                 cfg.num_msi_planes)["rgba_layers"]

    # prepared-path component stages (the layout-tax-free hot path)
    if use_prepared:
        from matryodshka_tpu.geometry import render as render_geo
        from matryodshka_tpu.ops import pallas_render, pallas_sweep

        planar = fused_net is not None and fused_net[3]

        @jax.jit
        def sweep_prepared(batch):
            ref = msi_lib.preprocess_image(batch["ref_image"])
            src = msi_lib.preprocess_image(batch["src_image"])
            if planar:
                return pallas_sweep.ods_sweep_identity_planar(
                    ref, src, psv_depths, batch["intrinsics"],
                    out_dtype=cfg.jnp_compute_dtype)
            _, fg, bg = pallas_sweep.ods_sweep_identity_prepared(
                ref, src, psv_depths, batch["intrinsics"],
                out_dtype=cfg.jnp_compute_dtype)
            return fg, bg

        fgV, bgV = sweep_prepared(batch)       # padded planar if planar
        if planar:
            pad = pallas_sweep.NET_ROW_PAD
            fgF = fgV[:, :, :, pad:pad + cfg.height]
            bgF = bgV[:, :, :, pad:pad + cfg.height]
        else:
            fgF, bgF = fgV, bgV
        cap_pad = render_geo._cap_band_pad(cfg.height, cfg.width,
                                           pallas_render.CAP_ROWS)

        if fused_net is not None:
            from matryodshka_tpu.ops import pallas_net

            @jax.jit
            def net_fused(fgV, bgV):
                net_ops, ngf, k, flipped, net_variant = fused_net
                if planar:
                    p_, c_, hp_, w_ = fgV.shape[1:]
                    return pallas_net.unet_forward(
                        (fgV[0].reshape(p_ * c_, hp_, w_),
                         bgV[0].reshape(p_ * c_, hp_, w_)),
                        net_ops, ngf, k, flipped=flipped,
                        variant=net_variant)

                def _rm(v):
                    p_, c_, h_, w_ = v.shape
                    u = v if flipped else jnp.flip(v, axis=3)
                    u = u.reshape(p_ * c_, h_, w_)
                    return jnp.transpose(u, (1, 0, 2))
                x_rm = jnp.concatenate([_rm(fgV[0]), _rm(bgV[0])],
                                       axis=1)
                return pallas_net.unet_forward(
                    x_rm.astype(cfg.jnp_compute_dtype), net_ops, ngf, k,
                    flipped=flipped, variant=net_variant)

        @jax.jit
        def assemble_render(msi_pred, fgF, bgF, tgt_pose):
            per = [msi_lib.assemble_rgba_prepared(
                cfg.which_color_pred, msi_pred[i], fgF[i], bgF[i],
                cfg.num_msi_planes, cap_pad=cap_pad,
                dtype=cfg.jnp_compute_dtype)
                for i in range(msi_pred.shape[0])]
            outs = {k: jnp.stack([d[k] for d in per])
                    for k in ("prepared", "cap_top", "cap_bot")}
            b = msi_pred.shape[0]
            eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
            return msi_lib.render_equirect_view_from_prepared(
                outs, eye, tgt_pose, msi_depths, cfg.height)

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

    # exactness of the fused render vs the gather path on this input
    # (the kernel's ladder is exact; bf16 storage adds ~2e-3 quantization)
    gather_out = jax.jit(lambda r, t: msi_lib.render_equirect_view(
        r.astype(jnp.float32), jnp.tile(jnp.eye(4)[None], (r.shape[0], 1, 1)),
        t, msi_depths))(rgba, batch["tgt_pose"])
    pallas_out = render_only(rgba, batch["tgt_pose"])
    err = float(jnp.max(jnp.abs(gather_out - pallas_out)))
    print(f"[bench] pallas-vs-gather max err: {err:.2e}", file=sys.stderr)

    ms_sweep = timeit(sweep_only, batch, iters=20)
    ms_net = timeit(net_only, state.params, net_input, iters=20)
    ms_render = timeit(render_only, rgba, batch["tgt_pose"], iters=20)
    if use_prepared:
        err_p = float(jnp.max(jnp.abs(
            gather_out - assemble_render(pred, fgF, bgF,
                                         batch["tgt_pose"]))))
        print(f"[bench] prepared-vs-gather max err: {err_p:.2e}",
              file=sys.stderr)
        ms_sweep_p = timeit(sweep_prepared, batch, iters=20)
        ms_ar = timeit(assemble_render, pred, fgF, bgF,
                       batch["tgt_pose"], iters=20)
        msg = (f"[bench] sweep_prepared={ms_sweep_p:.2f}ms "
               f"assemble+render={ms_ar:.2f}ms")
        if fused_net is not None:
            ms_nf = timeit(net_fused, fgV, bgV, iters=20)
            msg += f" net_fused={ms_nf:.2f}ms"
        print(msg, file=sys.stderr)
    ms_e2e = timeit(e2e_chain, state.params, batch, chain=CHAIN)

    print(f"[bench] sweep={ms_sweep:.2f}ms net={ms_net:.2f}ms "
          f"render={ms_render:.2f}ms e2e={ms_e2e:.2f}ms", file=sys.stderr)

    fps = 1000.0 / ms_e2e
    print(json.dumps({
        "metric": "msi_e2e_fps_640x320",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 100.0, 4),
    }))


if __name__ == "__main__":
    main()
