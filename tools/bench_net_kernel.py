#!/usr/bin/env python3
"""Microbench: whole-net Pallas kernel vs the XLA net, on the real TPU.

Run on the axon env (no pytest — conftest forces CPU):
    python tools/bench_net_kernel.py

Prints per-stage chained timings (K iterations inside one jit with data
dependencies — per-dispatch relay RTT would otherwise dominate) and the
kernel-vs-flax output delta.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/matry_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from matryodshka_tpu.models.unet import MSIUNet
    from matryodshka_tpu.ops import pallas_net

    H, W, NGF, CIN0, NOUT = 320, 640, 64, 192, 64
    rng = np.random.RandomState(0)
    model = MSIUNet(num_outputs=NOUT, ngf=NGF, variant="wrap",
                    dtype=jnp.bfloat16, param_dtype=jnp.float32)
    x = jnp.asarray(rng.randn(1, H, W, CIN0).astype(np.float32) * 0.5)
    params = model.init(jax.random.PRNGKey(1), x)
    ops = pallas_net.prepare_params(params, NGF, CIN0, NOUT)
    ops = [jnp.asarray(o) for o in ops]
    xr = jnp.transpose(x[0], (0, 2, 1)).astype(jnp.bfloat16)

    CHAIN = 10

    @jax.jit
    def kernel_chain(xr):
        def body(_, x):
            y = pallas_net.unet_forward(x, ops, NGF, NOUT)  # [H, K, W]
            # feed a K->C0 projection back so iterations chain
            x2 = jnp.tile(y[:, :64, :], (1, 3, 1)).astype(jnp.bfloat16)
            return x2 * 0.1 + x * 0.9
        return jax.lax.fori_loop(0, CHAIN, body, xr)

    @jax.jit
    def flax_chain(x):
        def body(_, xc):
            y = model.apply(params, xc)                     # [1,H,W,K]
            x2 = jnp.tile(y[..., :64], (1, 1, 1, 3))
            return (x2 * 0.1 + xc * 0.9).astype(x.dtype)
        return jax.lax.fori_loop(0, CHAIN, body, x)

    def timeit(fn, *a, iters=3, warmup=1):
        for _ in range(warmup):
            jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / (iters * CHAIN) * 1000.0

    # correctness first
    got = pallas_net.unet_forward(xr, ops, NGF, NOUT)
    ref = model.apply(params, x)[0]
    err = float(jnp.max(jnp.abs(jnp.transpose(got, (0, 2, 1)) - ref)))
    print(f"[netbench] kernel-vs-flax max err: {err:.3e}", file=sys.stderr)

    ms_k = timeit(kernel_chain, xr)
    ms_f = timeit(flax_chain, x)
    print(f"[netbench] pallas_net={ms_k:.2f}ms  xla_net={ms_f:.2f}ms  "
          f"speedup={ms_f / ms_k:.2f}x")


if __name__ == "__main__":
    main()
