"""U-Net and MSI assembly tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matryodshka_tpu.config import MatryConfig
from matryodshka_tpu.models.unet import MSIUNet, sph_coord_channel, wrap_pad
from matryodshka_tpu.models import msi as msi_lib


def test_wrap_pad_semantics():
    x = jnp.arange(2 * 3 * 4 * 1, dtype=jnp.float32).reshape(1, 2, 3, 4)
    x = jnp.transpose(x, (0, 2, 3, 1))  # [1, 3, 4, 2] -> H=3, W=4
    y = wrap_pad(x, 1, 1)
    assert y.shape == (1, 5, 6, 2)
    np.testing.assert_allclose(np.asarray(y[0, 1:-1, 0]),
                               np.asarray(x[0, :, -1]))
    np.testing.assert_allclose(np.asarray(y[0, 1:-1, -1]),
                               np.asarray(x[0, :, 0]))
    # vertical is zero padding
    np.testing.assert_allclose(np.asarray(y[0, 0]), 0.0)
    np.testing.assert_allclose(np.asarray(y[0, -1]), 0.0)


@pytest.mark.parametrize("variant", ["wrap", "coord"])
def test_unet_output_shape(variant):
    h, w, p = 32, 64, 4
    model = MSIUNet(num_outputs=2 * p, ngf=8, variant=variant,
                    dtype=jnp.float32)
    x = jnp.zeros((1, h, w, 2 * p * 3))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, h, w, 2 * p)
    assert np.abs(np.asarray(y)).max() <= 1.0  # tanh head


def test_unet_wrap_is_horizontally_equivariant():
    """Wrap padding makes the network equivariant to horizontal rolls
    at full resolution multiples of 8 (the total stride)."""
    h, w, p = 32, 64, 2
    model = MSIUNet(num_outputs=2 * p, ngf=8, variant="wrap",
                    dtype=jnp.float32)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, h, w, 2 * p * 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    shift = 16  # multiple of 8
    y_shift = model.apply(params, jnp.roll(x, shift, axis=2))
    np.testing.assert_allclose(np.asarray(jnp.roll(y, shift, axis=2)),
                               np.asarray(y_shift), atol=2e-4)


def test_sph_coord_channel():
    c = np.asarray(sph_coord_channel(9, 4))[0, :, 0, 0]
    np.testing.assert_allclose(c[0], 1.0, atol=1e-6)     # pole
    np.testing.assert_allclose(c[4], 0.0, atol=1e-6)     # equator
    np.testing.assert_allclose(c[-1], 1.0, atol=1e-6)    # pole


def test_assemble_rgba_blend_psv():
    b, h, w, p = 1, 4, 6, 3
    rng = np.random.RandomState(0)
    net_input = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 2 * p * 3))
                            .astype(np.float32))
    pred = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 2 * p))
                       .astype(np.float32))
    out = msi_lib.assemble_rgba("blend_psv", pred, net_input, p)
    rgba = np.asarray(out["rgba_layers"])
    assert rgba.shape == (b, h, w, p, 4)
    # manual check for plane 1
    i = 1
    fg = np.asarray(net_input)[..., i * 3:(i + 1) * 3]
    bg = np.asarray(net_input)[..., (p + i) * 3:(p + i + 1) * 3]
    wgt = (np.asarray(pred)[..., i] + 1) / 2
    alpha = (np.asarray(pred)[..., p + i] + 1) / 2
    np.testing.assert_allclose(rgba[..., i, :3],
                               wgt[..., None] * fg
                               + (1 - wgt[..., None]) * bg, rtol=1e-5)
    np.testing.assert_allclose(rgba[..., i, 3], alpha, rtol=1e-5)


@pytest.mark.parametrize("scheme,channels", [
    ("blend_bg", 2 * 3 + 3), ("blend_bg_psv", 3 * 3 + 3),
    ("alpha_only", 3)])
def test_assemble_rgba_other_schemes(scheme, channels):
    b, h, w, p = 1, 4, 6, 3
    rng = np.random.RandomState(1)
    net_input = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 2 * p * 3))
                            .astype(np.float32))
    pred = jnp.asarray(rng.uniform(-1, 1, (b, h, w, channels))
                       .astype(np.float32))
    out = msi_lib.assemble_rgba(scheme, pred, net_input, p)
    assert out["rgba_layers"].shape == (b, h, w, p, 4)
    if scheme == "alpha_only":
        np.testing.assert_allclose(
            np.asarray(out["rgba_layers"][..., 0, :3]),
            np.asarray(net_input[..., :3]), rtol=1e-6)


@pytest.mark.parametrize("scheme", ["blend_psv", "blend_bg", "alpha_only"])
def test_assemble_hres_rgba_schemes(scheme):
    """hres assembly (msi.py:149-165 blend_psv, :196-212 blend_bg):
    low-res weights (and predicted bg) are upsampled align_corners and
    applied to the hres PSV. At equal resolution the upsample is the
    identity, so hres assembly must equal the low-res assembly."""
    b, h, w, p = 1, 4, 6, 3
    rng = np.random.RandomState(2)
    net_input = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 2 * p * 3))
                            .astype(np.float32))
    channels = {"blend_psv": 2 * p, "blend_bg": 2 * p + 3,
                "alpha_only": p}[scheme]
    pred = jnp.asarray(rng.uniform(-1, 1, (b, h, w, channels))
                       .astype(np.float32))
    out = msi_lib.assemble_rgba(scheme, pred, net_input, p)
    hres = msi_lib.assemble_hres_rgba(scheme, out, net_input, p, h, w)
    np.testing.assert_allclose(np.asarray(hres),
                               np.asarray(out["rgba_layers"]),
                               atol=1e-5)


def test_assemble_hres_blend_bg_uses_predicted_bg():
    """blend_bg hres: where the blend weight is 0 the hres color is the
    (upsampled) PREDICTED background, not the PSV."""
    b, h, w, p = 1, 4, 4, 2
    net_input = jnp.ones((b, h, w, 2 * p * 3), jnp.float32) * 0.5
    pred = jnp.concatenate([
        -jnp.ones((b, h, w, p)),            # blend weights -> 0
        jnp.zeros((b, h, w, p)),            # alphas -> 0.5
        jnp.full((b, h, w, 3), -0.25),      # predicted bg (raw tanh)
    ], axis=-1)
    out = msi_lib.assemble_rgba("blend_bg", pred, net_input, p)
    hres = msi_lib.assemble_hres_rgba("blend_bg", out, net_input, p, h, w)
    np.testing.assert_allclose(np.asarray(hres[..., :3]), -0.25, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["rgba_layers"][..., :3]),
                               -0.25, atol=1e-5)


def test_upsample_align_corners_endpoints():
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 3, 4, 1))
    up = np.asarray(msi_lib.upsample_align_corners(img, 5, 7))
    assert up.shape == (1, 5, 7, 1)
    np.testing.assert_allclose(up[0, 0, 0, 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(up[0, -1, -1, 0], 11.0, atol=1e-5)
    np.testing.assert_allclose(up[0, 0, -1, 0], 3.0, atol=1e-5)


def test_upsample_align_corners_matches_gather():
    """The separable MXU-matmul resize equals the quad-gather bilinear
    formulation it replaced (the gather OOM'd HBM at 4096x2048x64ch)."""
    from matryodshka_tpu.ops.resample import bilinear_wrap_resample
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 20, 40, 3).astype(np.float32))
    out_h, out_w = 52, 104
    got = np.asarray(msi_lib.upsample_align_corners(img, out_h, out_w))
    ys = jnp.linspace(0.0, 20 - 1.0, out_h)
    xs = jnp.linspace(0.0, 40 - 1.0, out_w)
    X, Y = jnp.meshgrid(xs, ys)
    coords = jnp.stack([X, Y], axis=-1)
    want = np.asarray(jax.vmap(
        lambda im: bilinear_wrap_resample(im, coords))(img))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_num_net_outputs_table():
    cfg = MatryConfig()
    assert cfg.num_net_outputs() == 64
    assert cfg.replace(which_color_pred="blend_bg").num_net_outputs() == 67
    assert cfg.replace(which_color_pred="blend_bg_psv").num_net_outputs() \
        == 99
    assert cfg.replace(which_color_pred="alpha_only").num_net_outputs() == 32


@pytest.mark.parametrize("variant", ["wrap", "coord"])
def test_unet_smoothed_deconv(variant):
    h, w, p = 32, 64, 2
    model = MSIUNet(num_outputs=2 * p, ngf=8, variant=variant,
                    smoothed=True, dtype=jnp.float32)
    x = jnp.zeros((1, h, w, 2 * p * 3))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, h, w, 2 * p)


def test_atlas_pack_layout():
    """Export atlas: channels -> 8x(C/8) mosaic (nets.py:370-385)."""
    from matryodshka_tpu.models.unet import atlas_pack
    h, w, c = 4, 6, 16
    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.rand(1, h, w, c).astype(np.float32))
    atlas = np.asarray(atlas_pack(pred, h, w, channels=c))
    assert atlas.shape == (1, 8 * h, (c // 8) * w)
    # channel k lives at tile (row k // (c//8), col k % (c//8))
    for k in range(c):
        r, col = k // (c // 8), k % (c // 8)
        np.testing.assert_allclose(
            atlas[0, r * h:(r + 1) * h, col * w:(col + 1) * w],
            np.asarray(pred[0, :, :, k]), rtol=1e-6)


def test_fused_conv_ln_net_matches_unfused():
    """use_pallas_conv routes stride-1 convs through the fused
    conv+LN-statistics kernel (interpret mode here); the whole net must
    match the unfused wrap net closely (bf16 sum-order noise only)."""
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.rand(1, 32, 128, 12).astype(np.float32))
    base = MSIUNet(num_outputs=8, ngf=8, variant="wrap",
                   dtype=jnp.float32)
    params = base.init(jax.random.PRNGKey(0), x)
    ref = base.apply(params, x)
    fused = MSIUNet(num_outputs=8, ngf=8, variant="wrap",
                    dtype=jnp.float32, pallas_interpret=True)
    got = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
