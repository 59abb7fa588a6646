"""Tests for the wrap-around bilinear resampler (ops/resample.py)."""

import jax.numpy as jnp
import numpy as np

from matryodshka_tpu.ops.resample import (bilinear_wrap_resample,
                                          bilinear_zero_resample,
                                          resample_stack)


def _numpy_wrap_resample(image, coords):
    """Literal transcription of geometry/sampling.py:135-197 in numpy."""
    h, w, c = image.shape
    x = coords[..., 0].astype(np.float32)
    y = coords[..., 1].astype(np.float32)
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    fx, fy = x - x0, y - y0
    x0m, x1m = np.mod(x0, w), np.mod(x0 + 1, w)
    y0m, y1m = np.mod(y0, h), np.mod(y0 + 1, h)
    Ia = image[y0m, x0m]
    Ib = image[y0m, x1m]
    Ic = image[y1m, x0m]
    Id = image[y1m, x1m]
    return ((1 - fy) * (1 - fx))[..., None] * Ia + \
           ((1 - fy) * fx)[..., None] * Ib + \
           (fy * (1 - fx))[..., None] * Ic + (fy * fx)[..., None] * Id


def test_exact_at_pixel_centers():
    rng = np.random.RandomState(0)
    img = rng.rand(5, 7, 3).astype(np.float32)
    J, I = np.meshgrid(np.arange(7), np.arange(5))
    coords = np.stack([J, I], axis=-1).astype(np.float32)
    out = np.asarray(bilinear_wrap_resample(jnp.asarray(img),
                                            jnp.asarray(coords)))
    np.testing.assert_allclose(out, img, rtol=1e-6)


def test_wrap_horizontal_continuity():
    """Sampling half a pixel left of column 0 blends with the last column."""
    img = np.zeros((4, 8, 1), dtype=np.float32)
    img[:, 0] = 1.0
    img[:, -1] = 3.0
    coords = np.array([[[-0.5, 1.0]]], dtype=np.float32)
    out = np.asarray(bilinear_wrap_resample(jnp.asarray(img),
                                            jnp.asarray(coords)))
    np.testing.assert_allclose(out[0, 0, 0], 2.0, rtol=1e-6)


def test_matches_numpy_reference_random():
    rng = np.random.RandomState(1)
    img = rng.rand(9, 13, 4).astype(np.float32)
    coords = np.stack([rng.uniform(-20, 30, (6, 11)),
                       rng.uniform(-20, 30, (6, 11))],
                      axis=-1).astype(np.float32)
    got = np.asarray(bilinear_wrap_resample(jnp.asarray(img),
                                            jnp.asarray(coords)))
    exp = _numpy_wrap_resample(img, coords)
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_zero_boundary_resample():
    img = np.ones((4, 4, 1), dtype=np.float32)
    coords = np.array([[[1.5, 1.5], [-1.0, 1.0], [5.0, 1.0],
                        [3.5, 3.5]]], dtype=np.float32)
    out = np.asarray(bilinear_zero_resample(jnp.asarray(img),
                                            jnp.asarray(coords)))[0, :, 0]
    np.testing.assert_allclose(out[0], 1.0)   # interior
    np.testing.assert_allclose(out[1], 0.0)   # fully outside
    np.testing.assert_allclose(out[2], 0.0)   # fully outside
    np.testing.assert_allclose(out[3], 0.25)  # corner: one valid tap
    # border column samples at x = 3.0 exactly: full weight on last column
    coords2 = np.array([[[3.0, 2.0]]], dtype=np.float32)
    out2 = np.asarray(bilinear_zero_resample(jnp.asarray(img),
                                             jnp.asarray(coords2)))
    np.testing.assert_allclose(out2[0, 0, 0], 1.0)


def test_resample_stack_shapes():
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.rand(6, 10, 3).astype(np.float32))
    coords = jnp.asarray(rng.uniform(0, 9, (5, 6, 10, 2)).astype(np.float32))
    out = resample_stack(img, coords)
    assert out.shape == (5, 6, 10, 3)


def test_packed_path_matches_four_tap():
    from matryodshka_tpu.ops.resample import (
        pack_quad, bilinear_wrap_resample_packed, resample_layers)
    rng = np.random.RandomState(5)
    img = rng.rand(9, 13, 3).astype(np.float32)
    coords = np.stack([rng.uniform(-20, 30, (4, 6, 11)),
                       rng.uniform(-20, 30, (4, 6, 11))],
                      axis=-1).astype(np.float32)
    ref = np.asarray(bilinear_wrap_resample(jnp.asarray(img),
                                            jnp.asarray(coords)))
    packed = pack_quad(jnp.asarray(img))
    got = np.asarray(bilinear_wrap_resample_packed(packed, 9, 13, 3,
                                                   jnp.asarray(coords)))
    np.testing.assert_array_equal(got, ref)


def test_resample_layers_matches_per_layer():
    from matryodshka_tpu.ops.resample import resample_layers
    rng = np.random.RandomState(6)
    layers = rng.rand(5, 8, 12, 4).astype(np.float32)
    coords = np.stack([rng.uniform(-5, 20, (5, 8, 12)),
                       rng.uniform(-5, 20, (5, 8, 12))],
                      axis=-1).astype(np.float32)
    got = np.asarray(resample_layers(jnp.asarray(layers),
                                     jnp.asarray(coords)))
    for p in range(5):
        ref = np.asarray(bilinear_wrap_resample(jnp.asarray(layers[p]),
                                                jnp.asarray(coords[p])))
        np.testing.assert_array_equal(got[p], ref)
