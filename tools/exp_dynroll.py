#!/usr/bin/env python3
"""Probe: does pltpu.roll accept a TRACED shift amount on real TPU
(Mosaic tpu.dynamic_rotate)? The sweep kernel's barrel-shifter comment
assumed it doesn't; if it does, per-row/per-block rebased shifts get
~2x cheaper and the render ladder can be rebuilt around per-pixel
barrels with runtime-rebased bases."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = 640

    def kernel(s_ref, x_ref, o_ref):
        s = s_ref[0]
        o_ref[:, :] = pltpu.roll(x_ref[:, :], s, axis=1)

    x = jnp.asarray(np.random.RandomState(0).rand(8, W).astype(np.float32))

    @jax.jit
    def run(x, s):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, W), jnp.float32),
        )(jnp.asarray([s], jnp.int32), x)

    try:
        got = np.asarray(run(x, 5))
        want = np.roll(np.asarray(x), 5, axis=1)
        err = np.abs(got - want).max()
        print(f"[dynroll] traced-shift roll: OK, err={err:.1e}")
        got = np.asarray(run(x, 123))
        want = np.roll(np.asarray(x), 123, axis=1)
        print(f"[dynroll] shift=123 err={np.abs(got - want).max():.1e}")
    except Exception as e:  # noqa: BLE001
        print(f"[dynroll] FAIL {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
