#!/usr/bin/env python3
"""Locate the expensive stages of the whole-net Pallas kernel.

Builds and times PREFIXES of the U-Net plan (cut after the encoder,
the dilated trunk, each decoder level, and the full net); successive
differences attribute milliseconds to stage groups. Each prefix is a
separate Mosaic compile (~minutes remotely) — keep the cut list short.

Run on the axon env:  python tools/bench_net_stages.py
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

    from matryodshka_tpu.models.unet import MSIUNet
    from matryodshka_tpu.ops import pallas_net

    H, W, NGF, CIN0, NOUT = 320, 640, 64, 192, 64
    rng = np.random.RandomState(0)
    model = MSIUNet(num_outputs=NOUT, ngf=NGF, variant="wrap",
                    dtype=jnp.bfloat16, param_dtype=jnp.float32)
    x = jnp.asarray(rng.randn(1, H, W, CIN0).astype(np.float32) * 0.5)
    params = model.init(jax.random.PRNGKey(1), x)
    full_ops = pallas_net.prepare_params(params, NGF, CIN0, NOUT)
    full_ops = [jnp.asarray(o) for o in full_ops]
    xr = jnp.transpose(x[0], (0, 2, 1)).astype(jnp.bfloat16)

    full_plan = pallas_net.unet_plan(NGF, CIN0, NOUT)
    names = [e[0] for e in full_plan]

    def n_ops(kind, nsrc):
        # must mirror pallas_net._build_kernel's wrap-variant op counts
        # (stacked lhs: one op per conv, nsrc*2 per deconv)
        return {"head": 2, "deconv": nsrc * 2 + 3}.get(kind, 4)

    CUTS = ["conv2_2", "conv3_3", "conv4_3", "conv6_3", "conv7_2",
            "color_pred"]
    CHAIN = 10

    def timeit(fn, *args, iters=3, warmup=1):
        for _ in range(warmup):
            jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / (iters * CHAIN) * 1000.0

    orig_plan = pallas_net.unet_plan
    prev_ms, prev_name = 0.0, "(none)"
    for cut in CUTS:
        k = names.index(cut) + 1
        prefix = full_plan[:k]
        nops = sum(n_ops(e[1], len(e[2])) for e in prefix)
        ops = full_ops[:nops]

        pallas_net.unet_plan = lambda *a, prefix=prefix: prefix
        try:
            @jax.jit
            def chain(xr, ops=tuple(ops), k=k):
                def body(_, xx):
                    y = pallas_net.unet_forward(xx, list(ops), NGF, NOUT)
                    dep = y.astype(jnp.float32).mean() * 1e-6
                    return xx * 0.999 + dep.astype(xx.dtype)
                return jax.lax.fori_loop(0, CHAIN, body, xr)

            ms = timeit(chain, xr)
        finally:
            pallas_net.unet_plan = orig_plan
        print(f"[stages] ..{cut:>10}: {ms:7.3f} ms  "
              f"(+{ms - prev_ms:6.3f} since {prev_name})", flush=True)
        prev_ms, prev_name = ms, cut


if __name__ == "__main__":
    main()
