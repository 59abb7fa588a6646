#!/usr/bin/env python3
"""Experiment: ladder kernel cost vs kv_max static-unroll width and
row_block, at fixed work (same pose/tables). Hypothesis: the 2*kv+2
predicated vertical-rung branches dominate (serialization), so a
small-kv specialization should collapse the runtime.
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
    tgt = jnp.asarray([0.05, 0.0, 0.0])
    layers = jnp.asarray(rng.rand(H, W, P, 4).astype(np.float32))

    uv = jax.block_until_ready(
        intersect.intersect_sphere(pose, tgt, radii, W, H))
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

    ref = None
    for kv in (8, 4, 2):
        for rb in (32, 16):
            hm = H - 2 * CAP
            if hm % rb:
                continue
            lay = jax.block_until_ready(pr.prepare_layers(
                layers, CAP, rb, kv, jnp.bfloat16))
            uvm = jax.block_until_ready(jnp.transpose(
                uv[:, CAP:H - CAP], (0, 3, 1, 2)).astype(jnp.float32))

            @jax.jit
            def chainf(lay, uvm, kv=kv, rb=rb):
                def body(_, l):
                    o = pr._ladder_render_mid(l, uvm, CAP, rb, 64, kv)
                    return l + o.mean().astype(l.dtype) * 1e-6
                return jax.lax.fori_loop(0, CHAIN, body, lay)

            try:
                ms = timeit(chainf, lay, uvm)
                out = pr._ladder_render_mid(lay, uvm, CAP, rb, 64, kv)
                if ref is None:
                    ref = out
                err = float(jnp.max(jnp.abs(out - ref)))
                print(f"[exp] kv={kv} rb={rb}: {ms:.2f} ms  "
                      f"(vs kv8rb32 err {err:.1e})", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"[exp] kv={kv} rb={rb}: FAIL "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
