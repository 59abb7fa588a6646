#!/usr/bin/env python3
"""Time the whole-net Pallas kernel at a given _ROW_BAND (env ROWBAND).
Fresh process per value — _forward's jit cache does not key on the
band. Run: ROWBAND=32 python tools/exp_netrb.py
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

    rb = int(os.environ.get("ROWBAND", "16"))
    pallas_net._ROW_BAND = rb

    H, W, NGF, CIN0, NOUT = 320, 640, 64, 192, 64
    P = 32
    rng = np.random.RandomState(0)
    model = MSIUNet(num_outputs=NOUT, ngf=NGF, variant="wrap",
                    dtype=jnp.bfloat16, param_dtype=jnp.float32)
    x = jnp.asarray(rng.randn(1, H, W, CIN0).astype(np.float32) * 0.5)
    params = model.init(jax.random.PRNGKey(1), x)
    ops = pallas_net.prepare_params(params, NGF, CIN0, NOUT,
                                    flipped=True)
    ops = [jnp.asarray(o) for o in ops]

    # planar mode operands (the production path)
    pc = P * 3
    xp0 = jnp.asarray(rng.rand(pc, H + 2 * pallas_net.X_ROW_PAD, W),
                      jnp.bfloat16)
    xp1 = jnp.asarray(rng.rand(pc, H + 2 * pallas_net.X_ROW_PAD, W),
                      jnp.bfloat16)
    CHAIN = 20

    @jax.jit
    def chain(a, b):
        def body(_, carry):
            aa, acc = carry
            y = pallas_net.unet_forward((aa, b), ops, NGF, NOUT,
                                        flipped=True)
            return (aa + (acc * 1e-9).astype(aa.dtype), y.mean())
        return jax.lax.fori_loop(0, CHAIN, body, (a, jnp.float32(0)))[1]

    try:
        t0 = time.perf_counter()
        jax.block_until_ready(chain(xp0, xp1))
        print(f"[netrb] rb={rb}: compile+first {time.perf_counter()-t0:.0f} s",
              flush=True)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(xp0, xp1))
            times.append((time.perf_counter() - t0) / CHAIN * 1000.0)
        print(f"[netrb] rb={rb}: {min(times):.2f} ms (runs: "
              f"{['%.2f' % t for t in times]})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[netrb] rb={rb}: FAIL {type(e).__name__}: {str(e)[:300]}",
              flush=True)


if __name__ == "__main__":
    main()
