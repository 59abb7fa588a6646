#!/usr/bin/env python3
"""A/B the ladder band height at 640x320: default_bounds' resolution-
scaled kv_max=9 (band_lead 16, band8 64 in ftbb) vs the legacy kv=7
(band_lead 8, band 48) — a 25% roll-volume cut IF the production poses'
vertical residuals fit +-7 px (checked here with residual_ok_uv).
Run: python tools/exp_kv7.py
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
    wb = pr.default_wb(W)
    CHAIN = 20

    kh9, kv9 = pr.default_bounds(H, W, CAP)
    import math
    amp = 1.0 / math.sin((CAP + 0.5) * math.pi / H)
    variants = [("kv9", kh9, kv9),
                ("kv7", int(math.ceil(7 * amp)) + 2, 7)]
    for nm, kh, kv in variants:
        bl, band, pad = pr._band_geometry(CAP, RB, kv)
        print(f"[kv7] {nm}: kh={kh} kv={kv} band_lead={bl} band={band} "
              f"band8={8 * -(-band // 8)} pad={pad}", flush=True)
    pad9 = pr._band_geometry(CAP, RB, kv9)[2]
    pad7 = pr._band_geometry(CAP, RB, 7)[2]
    assert pad9 == pad7, (pad9, pad7)   # same operand layout

    rgba = np.asarray(rng.rand(H, W, P, 4), np.float32)
    fgP = jnp.asarray(rng.rand(P, 3, H + 2 * pad9, W), jnp.bfloat16)
    bgP = jnp.asarray(rng.rand(P, 3, H + 2 * pad9, W), jnp.bfloat16)
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

        outs = {}
        for nm, kh, kv in variants:
            ok = bool(pr.residual_ok_uv(uf, vf, CAP, kh, kv))
            print(f"[kv7] {tname}/{nm}: residual_ok={ok}", flush=True)
            layers = jax.block_until_ready(pr.prepare_layers(
                jnp.asarray(rgba), CAP, RB, kv, jnp.bfloat16))

            @jax.jit
            def chain_tiled(lay, kh=kh, kv=kv):
                def body(_, l):
                    o = pr._ladder_render_mid_uv(
                        l, um, vm, CAP, RB, kh, kv, wb=wb, mpair=True,
                        kpair=True)
                    return l + o.mean().astype(l.dtype) * 1e-6
                return jax.lax.fori_loop(0, CHAIN, body, lay)

            @jax.jit
            def chain_ftbb(f, kh=kh, kv=kv):
                def body(_, ff):
                    o = pr.render_mid_fused_blend(
                        ff, bgP, pred, uf, vf, pad9, cap=CAP,
                        row_block=RB, kh_max=kh, kv_max=kv)
                    return ff + o.mean().astype(ff.dtype) * 1e-6
                return jax.lax.fori_loop(0, CHAIN, body, f)

            for kname, fn, arg in (("tiled", chain_tiled, layers),
                                   ("ftbb", chain_ftbb, fgP)):
                try:
                    ms = timeit(fn, arg)
                    print(f"[kv7] {tname}/{kname}/{nm}: {ms:.2f} ms",
                          flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"[kv7] {tname}/{kname}/{nm}: FAIL "
                          f"{type(e).__name__}: {str(e)[:200]}",
                          flush=True)
            try:
                outs[nm] = pr._ladder_render_mid_uv(
                    layers, um, vm, CAP, RB, kh, kv, wb=wb, mpair=True,
                    kpair=True)
            except Exception:  # noqa: BLE001
                pass
        if len(outs) == 2:
            err = float(jnp.max(jnp.abs(outs["kv9"] - outs["kv7"])))
            print(f"[kv7] {tname}/tiled kv9-vs-kv7: max|d|={err:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
