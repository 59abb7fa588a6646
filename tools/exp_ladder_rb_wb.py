#!/usr/bin/env python3
"""Sweep the ladder kernel's (row_block, wb) at the production shape.

The hybrid column-tiled kernel predicates FMA per 128-lane tile but
rolls full-width; smaller row blocks tighten both the vertical tap
span and the per-block rung union (fewer rolls) at 2x block fixed
cost. Times the bench pose and a diagonal pose; asserts exactness
against the (32, None) reference.

Run:  python tools/exp_ladder_rb_wb.py
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

    H, W, P, CAP = 320, 640, 32, 16
    rng = np.random.RandomState(0)
    radii = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, P))
    pose = jnp.eye(4)
    layers = jnp.asarray(rng.rand(H, W, P, 4).astype(np.float32))
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

    poses = {"bench": jnp.asarray([0.05, 0.0, 0.0]),
             "diag": jnp.asarray([0.05, 0.05, 0.05])}
    uvms = {}
    for name, tgt in poses.items():
        uv = intersect.intersect_sphere(pose, tgt, radii, W, H)
        uvms[name] = jax.block_until_ready(jnp.transpose(
            uv[:, CAP:H - CAP], (0, 3, 1, 2)).astype(jnp.float32))

    kh, kv = pr.default_bounds(H, W, CAP)
    refs = {}
    for rb in (32, 16):
        lay = jax.block_until_ready(pr.prepare_layers(
            layers, CAP, rb, kv, jnp.bfloat16))
        # wb must divide W (640) and be 128-aligned: only 128 works
        for wb in (None, 128):
            line = f"[exp] rb={rb} wb={wb}:"
            for pname, uvm in uvms.items():
                @jax.jit
                def chainf(lay, uvm, rb=rb, wb=wb):
                    def body(_, l):
                        o = pr._ladder_render_mid(l, uvm, CAP, rb, kh,
                                                  kv, wb=wb)
                        return l + o.mean().astype(l.dtype) * 1e-6
                    return jax.lax.fori_loop(0, CHAIN, body, lay)

                try:
                    ms = timeit(chainf, lay, uvm)
                    out = pr._ladder_render_mid(lay, uvm, CAP, rb, kh,
                                                kv, wb=wb)
                    if pname not in refs:
                        refs[pname] = out
                    err = float(jnp.max(jnp.abs(out - refs[pname])))
                    line += f"  {pname}={ms:.2f}ms(err {err:.1e})"
                except Exception as e:  # noqa: BLE001
                    line += (f"  {pname}=FAIL {type(e).__name__}: "
                             f"{str(e)[:120]}")
            print(line, flush=True)


if __name__ == "__main__":
    main()
