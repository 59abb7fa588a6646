#!/usr/bin/env python3
"""A/B the dyn_m ladder rung form on real TPU hardware.

dyn_m replaces the static 2*kv_max+2-level @pl.when vertical-tap
cascade with a runtime-sized fori over the tile's actual m range
(dynamic sublane band slice). The r4 parts split put the cascade's
coefficient+branch machinery at 2.06 ms of the 4.75 ms bench-pose mid
— this measures whether trading scalar branches for dynamic-slice
relayouts wins on the live backend.

Times BOTH production forms at production shape (640x320x32, bf16
layers): the plane-major tiled mid (_ladder_render_mid_uv) and the
blend-fused FTB mid (the armed pipeline), at the bench and diagonal
poses. Run: python tools/exp_dyn_m.py
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

        for dyn in (False, True):
            @jax.jit
            def chain_tiled(lay, dyn=dyn):
                def body(_, l):
                    o = pr._ladder_render_mid_uv(
                        l, um, vm, CAP, RB, kh, kv, wb=wb, dyn_m=dyn)
                    return l + o.mean().astype(l.dtype) * 1e-6
                return jax.lax.fori_loop(0, CHAIN, body, lay)

            @jax.jit
            def chain_ftbb(f, dyn=dyn):
                def body(_, ff):
                    o = pr.render_mid_fused_blend(
                        ff, bgP, pred, uf, vf, pad, cap=CAP,
                        row_block=RB, kh_max=kh, kv_max=kv,
                        dyn_m=dyn)
                    return ff + o.mean().astype(ff.dtype) * 1e-6
                return jax.lax.fori_loop(0, CHAIN, body, f)

            for kname, fn, arg in (("tiled", chain_tiled, layers),
                                   ("ftbb", chain_ftbb, fgP)):
                try:
                    ms = timeit(fn, arg)
                    print(f"[dyn_m] {tname}/{kname}/dyn={int(dyn)}: "
                          f"{ms:.2f} ms", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"[dyn_m] {tname}/{kname}/dyn={int(dyn)}: "
                          f"FAIL {type(e).__name__}: {str(e)[:200]}",
                          flush=True)

        # exactness on hardware (bit-equal contract)
        try:
            a = pr._ladder_render_mid_uv(layers, um, vm, CAP, RB, kh,
                                         kv, wb=wb, dyn_m=False)
            b = pr._ladder_render_mid_uv(layers, um, vm, CAP, RB, kh,
                                         kv, wb=wb, dyn_m=True)
            err = float(jnp.max(jnp.abs(a - b)))
            print(f"[dyn_m] {tname}/tiled exactness: max|d|={err:.2e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[dyn_m] {tname} exactness: FAIL "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
