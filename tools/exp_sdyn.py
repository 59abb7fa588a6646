#!/usr/bin/env python3
"""A/B the sweep kernel's dynamic-base barrel (perf_flags "sdyn") on
real TPU hardware: full static barrel (ceil(log2 W) roll+select passes
per block) vs one dynamic-shift rotate + runtime-gated residual bits.
Run: python tools/exp_sdyn.py
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

    from matryodshka_tpu.geometry import sweep as sweep_lib
    from matryodshka_tpu.ops import pallas_sweep as psw

    H, W, P = 320, 640, 32
    rng = np.random.RandomState(0)
    ref = jnp.asarray(rng.rand(H, W, 3), jnp.float32)
    src = jnp.asarray(rng.rand(H, W, 3), jnp.float32)
    depths = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, P))
    intr = jnp.asarray([[0.032, 0, 0], [0, 1, 0], [0, 0, 1.0]],
                       jnp.float32)
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

    outs = {}
    for dyn in (False, True):
        @jax.jit
        def chain(r, s, dyn=dyn):
            def body(_, carry):
                rr, acc = carry
                fg, bg = psw._ods_sweep_dual_stack(
                    rr, s, depths, intr, H, W, out_dtype=jnp.bfloat16,
                    out_row_pad=psw.NET_ROW_PAD, dynshift=dyn)
                return (rr + acc * 1e-9, fg.astype(jnp.float32).mean())
            return jax.lax.fori_loop(
                0, CHAIN, body, (r, jnp.float32(0)))[1]

        try:
            ms = timeit(chain, ref, src)
            print(f"[sdyn] dual/dyn={int(dyn)}: {ms:.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[sdyn] dual/dyn={int(dyn)}: FAIL "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
            continue
        outs[dyn] = jax.tree.map(
            np.asarray, psw._ods_sweep_dual_stack(
                ref, src, depths, intr, H, W, out_dtype=jnp.bfloat16,
                out_row_pad=psw.NET_ROW_PAD, dynshift=dyn))
    if len(outs) == 2:
        err = max(float(np.abs(a.astype(np.float32)
                               - b.astype(np.float32)).max())
                  for a, b in zip(outs[False], outs[True]))
        print(f"[sdyn] exactness: max|d|={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
