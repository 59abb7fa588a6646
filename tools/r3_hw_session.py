#!/usr/bin/env python3
"""One-process TPU measurement session for round 3.

The axon tunnel allows a single JAX process at a time and costs
minutes of init + compile, so every hardware question is batched here:

  1. profile_r3 stage budget (sweep/net/assemble/uv/ladder/caps)
  2. bench.py e2e JSON line
  3. (--sweeps) ladder rb/wb and cap sweeps

Run:  python tools/r3_hw_session.py [--sweeps]
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def phase(name, fn):
    print(f"\n===== {name} =====", flush=True)
    t0 = time.perf_counter()
    try:
        fn()
        print(f"===== {name}: done ({time.perf_counter() - t0:.0f}s) =====",
              flush=True)
    except Exception:  # noqa: BLE001 — keep later phases alive
        print(f"===== {name}: FAILED ({time.perf_counter() - t0:.0f}s) =====",
              flush=True)
        traceback.print_exc(limit=5)


def main():
    import jax
    print("devices:", jax.devices(), flush=True)

    # decision-critical numbers first, in case the tunnel flaps:
    # 1. the headline e2e (production path), 2. the flag-flip A/Bs,
    # 3. the fine-grained stage budget, 4. tuning sweeps.
    import bench
    phase("bench", bench.main)

    phase("blend-fused e2e A/B", ftbb_ab)
    phase("ftb A/B", ftb_ab)
    phase("mosaic atan2/sqrt probe", mosaic_trig_probe)

    from tools import profile_r3
    phase("profile_r3", profile_r3.main)

    if "--sweeps" in sys.argv:
        from tools import bench_net_stages
        phase("net stage-prefix", bench_net_stages.main)
        from tools import exp_ladder_rb_wb
        phase("ladder rb/wb sweep", exp_ladder_rb_wb.main)
        phase("cap sweep", cap_sweep)


def mosaic_trig_probe():
    """Can Mosaic lower atan2/sqrt/division on [8, 128] f32 tiles? Gates
    moving intersect_sphere's projection INTO the render kernel (would
    fold the 0.8 ms XLA uv+tables stage into the ladder)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, o_ref):
        x = x_ref[...]
        y = jnp.sqrt(x * x + 1.0)
        o_ref[...] = jnp.arctan2(x, y)

    x = jnp.asarray(np.random.RandomState(0).randn(8, 128),
                    jnp.float32)
    try:
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    except NotImplementedError as e:
        # measured 2026-08-18: Mosaic TC has no atan2 lowering — the
        # uv projection stays in XLA (or needs a hand-rolled polynomial)
        print(f"[probe] atan2/sqrt in-kernel: UNSUPPORTED ({e})",
              flush=True)
        return
    want = np.arctan2(np.asarray(x), np.sqrt(np.asarray(x) ** 2 + 1))
    err = float(jnp.max(jnp.abs(out - want)))
    print(f"[probe] atan2/sqrt in-kernel: OK, max err {err:.2e}",
          flush=True)


def _arm_flag(name, on):
    """Persist a winning kernel flag to perf_flags.json (read by
    pallas_render at import, so the driver's bench picks it up)."""
    import json

    from matryodshka_tpu.ops import pallas_render as pr
    flags, path = pr._read_perf_flags()
    if flags.get(name) == on:
        return
    flags[name] = on
    with open(path, "w") as f:
        json.dump(flags, f, indent=1)
    print(f"[flags] {name} = {on} -> {path}", flush=True)


def ftbb_ab():
    """Full inference e2e: prepared-stack pipeline vs the blend-fused
    FTB pipeline (assemble inside the render kernel), production shape.
    Arms the ftbb flag when it wins by >3% and matches the prepared
    pipeline numerically."""
    import time

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from matryodshka_tpu.geometry import sweep as sweep_lib
    from matryodshka_tpu.models import msi as msi_lib
    from matryodshka_tpu.training import state as state_lib

    cfg = _flagship_cfg()
    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    batch = _synthetic_batch(cfg)
    psv = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_psv_planes))
    msid = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_msi_planes))
    fused = msi_lib.fused_net_ops(model, state.params, cfg)
    CHAIN = 20

    def make(blend_fused):
        @jax.jit
        def e2e_chain(params, batch):
            def body(_, ref):
                b2 = dict(batch)
                b2["ref_image"] = ref
                outs = msi_lib.infer_msi_prepared(
                    lambda p, x: model.apply(p, x), params, cfg, b2,
                    psv, fused_net=fused, blend_fused=blend_fused)
                b = outs["msi_pred"].shape[0]
                eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
                img = msi_lib.render_equirect_view_from_prepared(
                    outs, eye, b2["tgt_pose"], msid, cfg.height)
                # real data dependency so the render isn't DCE'd
                return jnp.clip(ref * 0.999
                                + img.mean().astype(ref.dtype) * 1e-6,
                                0.0, 1.0)
            return jax.lax.fori_loop(0, CHAIN, body,
                                     batch["ref_image"])
        return e2e_chain

    def timeit(fn, *args, iters=3, warmup=2):
        for _ in range(warmup):
            jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / (iters * CHAIN) * 1000.0

    def one_frame(params, batch, bf):
        # bf is baked statically by the caller's jit wrapper
        outs = msi_lib.infer_msi_prepared(
            lambda p, x: model.apply(p, x), params, cfg, batch, psv,
            fused_net=fused, blend_fused=bf)
        b = outs["msi_pred"].shape[0]
        eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
        return msi_lib.render_equirect_view_from_prepared(
            outs, eye, batch["tgt_pose"], msid, cfg.height)

    results = {}
    for bf in (False, True):
        try:
            ms = timeit(make(bf), state.params, batch)
            results[bf] = ms
            print(f"[ftbb] blend_fused={bf}: e2e {ms:.2f} ms "
                  f"({1000.0 / ms:.1f} fps)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[ftbb] blend_fused={bf}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    if False in results and True in results:
        img_a = jax.jit(lambda p, b: one_frame(p, b, False))(
            state.params, batch)
        img_b = jax.jit(lambda p, b: one_frame(p, b, True))(
            state.params, batch)
        err = float(jnp.max(jnp.abs(img_a - img_b)))
        win = results[True] < 0.97 * results[False]
        exact = err < (0.02 if cfg.compute_dtype == "bfloat16" else 1e-4)
        print(f"[ftbb] exactness {err:.2e}; win={win} exact={exact}",
              flush=True)
        _arm_flag("ftbb", bool(win and exact))


def ftb_ab():
    """Plane-major hybrid ladder vs the front-to-back early-termination
    kernel, at the production shape, for random (non-saturating) and
    saturating alpha content."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from matryodshka_tpu.geometry import intersect
    from matryodshka_tpu.geometry import sweep as sweep_lib
    from matryodshka_tpu.ops import pallas_render as pr

    H, W, P, CAP, RB = 320, 640, 32, 16, 32
    rng = np.random.RandomState(0)
    radii = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, P))
    pose = jnp.eye(4)
    kh, kv = pr.default_bounds(H, W, CAP)
    CHAIN = 20

    def timeit(fn, *args, iters=3, warmup=2):
        for _ in range(warmup):
            jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / (iters * CHAIN) * 1000.0

    def make(fn, uvv, **kw):
        u, v = uvv

        @jax.jit
        def chain(lay):
            def body(_, l):
                o = fn(l, u, v, CAP, RB, kh, kv, **kw)
                return l + o.mean().astype(l.dtype) * 1e-6
            return jax.lax.fori_loop(0, CHAIN, body, lay)
        return chain

    contents = {}
    rgba = np.asarray(rng.rand(H, W, P, 4), np.float32)
    contents["uniform"] = rgba.copy()
    sat = rgba.copy()
    sat[..., 3] = np.clip(sat[..., 3] * 1.5, 0, 1)
    contents["saturating"] = sat
    sparse = rgba.copy()   # trained-MSI-like: most shells transparent
    sparse[..., 3] = np.where(rng.rand(H, W, P) < 0.12,
                              sparse[..., 3] * 0.9 + 0.1, 0.015)
    contents["sparse"] = sparse

    wins = []
    for tname, tgt in (("bench", jnp.asarray([0.05, 0.0, 0.0])),
                       ("diag", jnp.asarray([0.05, 0.05, 0.05]))):
        u, v = intersect.intersect_sphere_uv(pose, tgt, radii, W, H)
        um = jax.block_until_ready(u[:, CAP:H - CAP].astype(jnp.float32))
        vm = jax.block_until_ready(v[:, CAP:H - CAP].astype(jnp.float32))
        for cname, arr in contents.items():
            lay = jax.block_until_ready(pr.prepare_layers(
                jnp.asarray(arr), CAP, RB, kv, jnp.bfloat16))
            pm = timeit(make(pr._ladder_render_mid_uv, (um, vm),
                             wb=pr.default_wb(W)), lay)
            try:
                ftb = timeit(make(pr._ladder_render_mid_ftb, (um, vm),
                                  wb=pr.default_wb(W),
                                  eps=pr.FTB_EPS), lay)
            except Exception as e:  # noqa: BLE001
                print(f"[ftb] {tname}/{cname}: FTB FAIL "
                      f"{type(e).__name__}: {str(e)[:150]}", flush=True)
                wins.append(False)
                continue
            print(f"[ftb] {tname}/{cname}: plane-major {pm:.2f} ms, "
                  f"ftb {ftb:.2f} ms", flush=True)
            if cname == "uniform":          # the bench distribution
                wins.append(ftb < 0.97 * pm)
    if wins:
        _arm_flag("ftb", all(wins))


def cap_sweep():
    """CAP_ROWS trade: fewer gather-cap rows (the expensive per-row
    stage) vs wider ladder rung bounds near the new cap boundary."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from matryodshka_tpu.geometry import intersect
    from matryodshka_tpu.geometry import render as render_geo
    from matryodshka_tpu.geometry import sweep as sweep_lib
    from matryodshka_tpu.ops import pallas_render as pr

    H, W, P = 320, 640, 32
    rng = np.random.RandomState(0)
    radii = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, P))
    pose = jnp.eye(4)
    rgba = jnp.asarray(rng.rand(H, W, P, 4).astype(np.float32))
    CHAIN = 20

    def timeit(fn, *args, iters=3, warmup=2):
        for _ in range(warmup):
            jax.block_until_ready(fn(*args))
        import time
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / (iters * CHAIN) * 1000.0

    for tname, tgt in (("bench", jnp.asarray([0.05, 0.0, 0.0])),
                       ("diag", jnp.asarray([0.05, 0.05, 0.05]))):
        uv = jax.block_until_ready(
            intersect.intersect_sphere(pose, tgt, radii, W, H))
        # (cap, row_block): H - 2*cap must divide by the row block
        for cap, rb in ((8, 16), (12, 8), (16, 32), (24, 16)):
            kh, kv = pr.default_bounds(H, W, cap)
            layers = jax.block_until_ready(pr.prepare_layers(
                rgba, cap, rb, kv, jnp.bfloat16))
            bp = render_geo._cap_band_pad(H, W, cap)

            def full(lay, uv, cap=cap, kh=kh, kv=kv, bp=bp, rb=rb):
                def body(_, l):
                    um = jnp.transpose(uv[:, cap:H - cap],
                                       (0, 3, 1, 2)).astype(jnp.float32)
                    mid = pr._ladder_render_mid(l, um, cap,
                                                rb, kh, kv,
                                                wb=pr.default_wb(W))
                    top = render_geo._cap_over(rgba, uv[:, :cap], True,
                                               cap)
                    bot = render_geo._cap_over(rgba, uv[:, H - cap:],
                                               False, cap)
                    out = jnp.concatenate([top, mid, bot], axis=0)
                    return l + out.mean().astype(l.dtype) * 1e-6
                return jax.lax.fori_loop(0, CHAIN, body, lay)

            try:
                ms = timeit(jax.jit(full), layers, uv)
                print(f"[cap] pose={tname} cap={cap} kh={kh} kv={kv} "
                      f"bp={bp}: mid+caps {ms:.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"[cap] pose={tname} cap={cap}: FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
