#!/usr/bin/env python3
"""A/B the kpair ladder rung form on real TPU hardware (see
tools/exp_mpair.py — same harness; kpair processes two horizontal
rungs per k-loop iteration from two rolled bands offset by one rung).
Run: python tools/exp_kpair.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/matry_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from matryodshka_tpu.geometry import intersect
    from matryodshka_tpu.geometry import sweep as sweep_lib
    from matryodshka_tpu.ops import pallas_render as pr

    H, W, P, CAP, RB = 320, 640, 32, pr.CAP_ROWS, pr.ROW_BLOCK
    rng = np.random.RandomState(0)
    radii = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, P))
    pose = jnp.eye(4)
    kh, kv = pr.default_bounds(H, W, CAP)
    wb = pr.default_wb(W)
    CHAIN = 20
    _, _, pad = pr._band_geometry(CAP, RB, kv)

    rgba = np.asarray(rng.rand(H, W, P, 4), np.float32)
    fgP = jnp.asarray(rng.rand(P, 3, H + 2 * pad, W), jnp.bfloat16)
    bgP = jnp.asarray(rng.rand(P, 3, H + 2 * pad, W), jnp.bfloat16)
    pred = jnp.asarray(rng.rand(H, 2 * P, W) * 2 - 1, jnp.float32)

    def timeit(fn, *args, iters=3, warmup=2):
        for _ in range(warmup):
            jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / (iters * CHAIN) * 1000.0

    for tname, tgt in (("bench", jnp.asarray([0.05, 0.0, 0.0])),
                       ("diag", jnp.asarray([0.05, 0.05, 0.05]))):
        u, v = intersect.intersect_sphere_uv(pose, tgt, radii, W, H)
        uf = jax.block_until_ready(u.astype(jnp.float32))
        vf = jax.block_until_ready(v.astype(jnp.float32))
        um = jax.block_until_ready(u[:, CAP:H - CAP].astype(jnp.float32))
        vm = jax.block_until_ready(v[:, CAP:H - CAP].astype(jnp.float32))
        layers = jax.block_until_ready(pr.prepare_layers(
            jnp.asarray(rgba), CAP, RB, kv, jnp.bfloat16))

        # (mpair, kpair) combos: baseline mpair (the armed production
        # form) vs kpair alone vs both.
        for mp, kp in ((True, False), (False, True), (True, True)):
            @jax.jit
            def chain_tiled(lay, mp=mp, kp=kp):
                def body(_, l):
                    o = pr._ladder_render_mid_uv(
                        l, um, vm, CAP, RB, kh, kv, wb=wb, mpair=mp,
                        kpair=kp)
                    return l + o.mean().astype(l.dtype) * 1e-6
                return jax.lax.fori_loop(0, CHAIN, body, lay)

            @jax.jit
            def chain_ftbb(f, mp=mp, kp=kp):
                def body(_, ff):
                    o = pr.render_mid_fused_blend(
                        ff, bgP, pred, uf, vf, pad, cap=CAP,
                        row_block=RB, kh_max=kh, kv_max=kv, mpair=mp,
                        kpair=kp)
                    return ff + o.mean().astype(ff.dtype) * 1e-6
                return jax.lax.fori_loop(0, CHAIN, body, f)

            for kname, fn, arg in (("tiled", chain_tiled, layers),
                                   ("ftbb", chain_ftbb, fgP)):
                try:
                    ms = timeit(fn, arg)
                    print(f"[kpair] {tname}/{kname}/mp={int(mp)}"
                          f"kp={int(kp)}: {ms:.2f} ms", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"[kpair] {tname}/{kname}/mp={int(mp)}"
                          f"kp={int(kp)}: FAIL {type(e).__name__}: "
                          f"{str(e)[:200]}", flush=True)

        try:
            a = pr._ladder_render_mid_uv(layers, um, vm, CAP, RB, kh,
                                         kv, wb=wb, mpair=False,
                                         kpair=False)
            for mp in (False, True):
                b = pr._ladder_render_mid_uv(layers, um, vm, CAP, RB,
                                             kh, kv, wb=wb, mpair=mp,
                                             kpair=True)
                err = float(jnp.max(jnp.abs(a - b)))
                print(f"[kpair] {tname}/tiled mp={int(mp)} exactness: "
                      f"max|d|={err:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[kpair] {tname} exactness: FAIL "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
