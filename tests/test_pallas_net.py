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


def test_planar_mode_matches_row_major():
    """Planar x operands (two [P*C, H+2*X_ROW_PAD, W] volumes with zero
    pad bands) produce bit-identical output to the row-major input —
    the zero-layout-tax contract between the sweep kernel's padded
    planar emission and conv1_1's channels-major window."""
    model, params, x = _setup(jnp.float32)
    ops = pallas_net.prepare_params(params, NGF, CIN0, NOUT,
                                    dtype=jnp.float32)
    x_rm = jnp.transpose(x[0], (0, 2, 1)).astype(jnp.float32)
    ref = pallas_net.unet_forward(x_rm, ops, NGF, NOUT, interpret=True)

    pad = pallas_net.X_ROW_PAD
    xr = jnp.transpose(x[0], (2, 0, 1)).astype(jnp.float32)  # [C0,H,W]
    xpad = jnp.pad(xr, ((0, 0), (pad, pad), (0, 0)))
    pc = CIN0 // 2
    got = pallas_net.unet_forward((xpad[:pc], xpad[pc:]), ops, NGF,
                                  NOUT, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # Double-buffered planar x window (perf_flags "net_x2"): pure
    # buffering change, must stay bit-identical to the single slot.
    got2 = pallas_net.unet_forward((xpad[:pc], xpad[pc:]), ops, NGF,
                                   NOUT, interpret=True, x_slots=2)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(ref))


def test_planar_sweep_pad_matches_prepared():
    """ods_sweep_identity_planar's padded volumes: pad bands are zero
    and the interior equals ods_sweep_identity_prepared's fgF/bgF."""
    from matryodshka_tpu.ops import pallas_sweep

    rng = np.random.RandomState(2)
    b, h, w, p = 1, 32, 128, 4
    ref_img = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    src_img = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    depths = jnp.linspace(1.0, 100.0, p)
    intr = jnp.tile(jnp.eye(3)[None], (b, 1, 1)).at[:, 0, 0].set(0.032)

    _, fgF, bgF = pallas_sweep.ods_sweep_identity_prepared(
        ref_img, src_img, depths, intr, interpret=True)
    fgP, bgP = pallas_sweep.ods_sweep_identity_planar(
        ref_img, src_img, depths, intr, interpret=True)
    pad = pallas_sweep.NET_ROW_PAD
    for full, padded in ((fgF, fgP), (bgF, bgP)):
        np.testing.assert_array_equal(
            np.asarray(padded[:, :, :, pad:pad + h]), np.asarray(full))
        assert float(jnp.abs(padded[:, :, :, :pad]).max()) == 0.0
        assert float(jnp.abs(padded[:, :, :, pad + h:]).max()) == 0.0


@pytest.mark.parametrize("flipped", [False, True])
def test_coord_variant_matches_flax(flipped):
    """CoordNet kernel (SAME zero padding; |sin(lat)| channel lowered
    to a per-row bias) vs the flax coord net, both orientations."""
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, H, W, CIN0).astype(np.float32) * 0.3)
    net = MSIUNet(num_outputs=NOUT, ngf=NGF, variant="coord",
                  dtype=jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    want = np.asarray(net.apply(params, x))[0]
    ops = pallas_net.prepare_params(params, NGF, CIN0, NOUT,
                                    dtype=jnp.float32, flipped=flipped,
                                    variant="coord")
    xin = jnp.flip(x[0], axis=1) if flipped else x[0]
    xr = jnp.transpose(xin, (2, 0, 1)).transpose(1, 0, 2)
    got = pallas_net.unet_forward(xr, ops, NGF, NOUT, interpret=True,
                                  flipped=flipped, variant="coord")
    got = np.asarray(jnp.transpose(got, (0, 2, 1)))
    if flipped:
        got = got[:, ::-1]
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-5)
