"""Pallas wrap-conv vs the XLA wrap conv (interpret mode, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from matryodshka_tpu.ops import pallas_conv


def _xla_wrap_conv(x, kernel):
    xp = jnp.concatenate([x[:, :, -1:], x, x[:, :, :1]], axis=2)
    return jax.lax.conv_general_dilated(
        xp, kernel, (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_conv3x3_wrap_matches_xla():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 128, 12).astype(np.float32))
    k = jnp.asarray((rng.rand(3, 3, 12, 10) - 0.5).astype(np.float32))
    got = pallas_conv.conv3x3_wrap(x, k, row_block=8, interpret=True)
    assert got is not None
    ref = _xla_wrap_conv(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv3x3_wrap_bias_and_decline():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 16, 128, 8).astype(np.float32))
    k = jnp.asarray((rng.rand(3, 3, 8, 8) - 0.5).astype(np.float32))
    b = jnp.asarray(rng.rand(8).astype(np.float32))
    got = pallas_conv.conv3x3_wrap(x, k, bias=b, row_block=8,
                                   interpret=True)
    ref = _xla_wrap_conv(x, k) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # width not sublane-aligned -> decline
    assert pallas_conv.conv3x3_wrap(jnp.zeros((1, 16, 100, 8)), k,
                                    interpret=True) is None
    # non-128 widths are fine (lanes carry channels)
    got320 = pallas_conv.conv3x3_wrap(jnp.zeros((1, 16, 320, 8)), k,
                                      interpret=True)
    assert got320 is not None and got320.shape == (1, 16, 320, 8)


def test_conv3x3_wrap_dma_matches_xla():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 16, 128, 12).astype(np.float32))
    k = jnp.asarray((rng.rand(3, 3, 12, 10) - 0.5).astype(np.float32))
    got = pallas_conv.conv3x3_wrap_dma(x, k, row_block=8, interpret=True)
    assert got is not None
    ref = _xla_wrap_conv(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv3x3_ln_stats_matches_xla_layer():
    """Fused conv + LN-statistics kernel == nn-style conv layer math:
    same conv output (real channels), stats equal to f32 sums."""
    rng = np.random.RandomState(3)
    h, w, cin, cout = 16, 128, 12, 10
    cin_pad = 128
    x = jnp.asarray(rng.rand(h, w, cin).astype(np.float32))
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, cin_pad - cin)))
    k = jnp.asarray((rng.rand(3, 3, cin, cout) - 0.5).astype(np.float32))
    b = jnp.asarray(rng.rand(cout).astype(np.float32))
    y, s1, s2 = pallas_conv.conv3x3_ln_stats(xp, k, b, cin, row_block=8,
                                             interpret=True)
    ref = _xla_wrap_conv(x[None], k)[0] + b
    got = np.asarray(y)[:, :, :cout]
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-5, atol=1e-5)
    assert np.asarray(y)[:, :, cout:].max() == 0.0
    np.testing.assert_allclose(float(s1), float(jnp.sum(ref)), rtol=1e-5)
    np.testing.assert_allclose(float(s2), float(jnp.sum(ref * ref)),
                               rtol=1e-5)
