"""Whole-net Pallas kernel vs the flax MSIUNet (interpret mode, CPU).

Same params, same input: the kernel's row-major [H, K, W] output must
match model.apply's [1, H, W, K] to f32 reassociation noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matryodshka_tpu.models.unet import MSIUNet
from matryodshka_tpu.ops import pallas_net

H, W = 32, 128
NGF = 8
CIN0 = 24          # 2 eyes x 4 planes x rgb
NOUT = 8


def _setup(dtype):
    rng = np.random.RandomState(0)
    model = MSIUNet(num_outputs=NOUT, ngf=NGF, variant="wrap",
                    dtype=dtype, param_dtype=jnp.float32)
    x = jnp.asarray(rng.randn(1, H, W, CIN0).astype(np.float32) * 0.5)
    params = model.init(jax.random.PRNGKey(1), x)
    return model, params, x


def test_kernel_matches_flax_f32():
    model, params, x = _setup(jnp.float32)
    ref = model.apply(params, x)                     # [1, H, W, K]
    ops = pallas_net.prepare_params(params, NGF, CIN0, NOUT,
                                    dtype=jnp.float32)
    xr = jnp.transpose(x[0], (0, 2, 1)).astype(jnp.float32)  # [H, C, W]
    got = pallas_net.unet_forward(xr, ops, NGF, NOUT, interpret=True)
    got_hwk = jnp.transpose(got, (0, 2, 1))          # [H, W, K]
    np.testing.assert_allclose(np.asarray(got_hwk), np.asarray(ref[0]),
                               rtol=0, atol=5e-5)


def test_flipped_mode_matches_flax_f32():
    """Flipped-operand net on W-flipped input == W-flipped flax output.

    This is the contract that lets the sweep kernel's natively-flipped
    row-major volume feed the net with zero XLA flip/transpose passes
    (prepare_params docstring has the derivation)."""
    model, params, x = _setup(jnp.float32)
    ref = model.apply(params, x)                     # [1, H, W, K]
    ops = pallas_net.prepare_params(params, NGF, CIN0, NOUT,
                                    dtype=jnp.float32, flipped=True)
    xrF = jnp.flip(jnp.transpose(x[0], (0, 2, 1)), axis=2)
    got = pallas_net.unet_forward(xrF.astype(jnp.float32), ops, NGF,
                                  NOUT, interpret=True, flipped=True)
    got_hwk = jnp.flip(jnp.transpose(got, (0, 2, 1)), axis=1)
    np.testing.assert_allclose(np.asarray(got_hwk), np.asarray(ref[0]),
                               rtol=0, atol=5e-5)


def test_kernel_matches_flax_bf16():
    model, params, x = _setup(jnp.bfloat16)
    ref = model.apply(params, x)
    ops = pallas_net.prepare_params(params, NGF, CIN0, NOUT,
                                    dtype=jnp.bfloat16)
    xr = jnp.transpose(x[0], (0, 2, 1)).astype(jnp.bfloat16)
    got = pallas_net.unet_forward(xr, ops, NGF, NOUT, interpret=True)
    got_hwk = jnp.transpose(got, (0, 2, 1))
    # bf16 rounding points differ slightly between the two pipelines
    # (XLA rounds at conv output, the kernel at row store); tanh keeps
    # everything in [-1, 1] so absolute tolerance is meaningful.
    np.testing.assert_allclose(np.asarray(got_hwk), np.asarray(ref[0]),
                               rtol=0, atol=0.05)
    err = np.abs(np.asarray(got_hwk) - np.asarray(ref[0]))
    assert err.mean() < 5e-3, err.mean()
