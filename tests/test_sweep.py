"""Tests for sphere/plane sweep volume construction."""

import jax.numpy as jnp
import numpy as np

from matryodshka_tpu.geometry import sweep


def test_centered_sweep_identity_is_flip():
    """ods_centered_sphere_sweep with identity pose reproduces the image
    flipped horizontally, exactly (the lookup hits pixel centers)."""
    rng = np.random.RandomState(0)
    b, h, w = 2, 8, 16
    img = rng.rand(b, h, w, 3).astype(np.float32)
    depths = jnp.array([100.0, 1.0])
    pose = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
    intr = jnp.tile(jnp.eye(3)[None], (b, 1, 1))
    vol = np.asarray(sweep.ods_centered_sphere_sweep(
        jnp.asarray(img), 0, depths, pose, intr))
    assert vol.shape == (b, h, w, 2 * 3)
    flipped = img[:, :, ::-1, :]
    for p in range(2):
        np.testing.assert_allclose(vol[..., 3 * p:3 * p + 3], flipped,
                                   atol=1e-4)


def test_ods_sweep_shapes_and_order_asymmetry():
    rng = np.random.RandomState(1)
    b, h, w, p = 1, 16, 32, 4
    img = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    depths = jnp.asarray(sweep.inv_depths(1.0, 100.0, p))
    pose = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
    intr = jnp.tile(jnp.asarray(
        [[0.064, 0, 0], [0, 1, 0], [0, 0, 1]])[None], (b, 1, 1))
    left = np.asarray(sweep.ods_sphere_sweep(img, 1, depths, pose, intr))
    right = np.asarray(sweep.ods_sphere_sweep(img, -1, depths, pose, intr))
    assert left.shape == (b, h, w, p * 3)
    # the two eyes look through different tangent rays -> different sweeps
    assert np.abs(left - right).max() > 1e-4
    # at far depths the parallax vanishes: far plane ~ equal for both eyes
    np.testing.assert_allclose(left[..., :3], right[..., :3], atol=0.15)


def test_format_network_input_channel_layout():
    """Double sweep: ref eye first (order +1) then src eye (order -1),
    plane-major RGB triples (msi.py:1094-1130)."""
    rng = np.random.RandomState(2)
    b, h, w, p = 1, 8, 16, 3
    ref = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    src = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    depths = jnp.asarray(sweep.inv_depths(1.0, 100.0, p))
    eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
    intr = jnp.tile(jnp.asarray(
        [[0.032, 0, 0], [0, 1, 0], [0, 0, 1]])[None], (b, 1, 1))
    net_in = sweep.format_network_input(ref, src, eye, eye, eye, depths,
                                        intr, "ODS")
    assert net_in.shape == (b, h, w, 2 * p * 3)
    direct_ref = sweep.ods_sphere_sweep(ref, 1, depths, eye, intr)
    direct_src = sweep.ods_sphere_sweep(src, -1, depths, eye, intr)
    np.testing.assert_allclose(np.asarray(net_in[..., :p * 3]),
                               np.asarray(direct_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(net_in[..., p * 3:]),
                               np.asarray(direct_src), atol=1e-6)


def test_perspective_plane_sweep_identity():
    """With identity pose and K whose principal point is the image center,
    the zero-depth-independent center pixel maps to itself."""
    rng = np.random.RandomState(3)
    b, h, w = 1, 8, 8
    img = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    depths = jnp.array([1.0, 2.0])
    pose = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
    K = jnp.asarray([[0.5 * w, 0, 0.5 * w], [0, 0.5 * h, 0.5 * h],
                     [0, 0, 1.0]])
    intr = jnp.tile(K[None], (b, 1, 1))
    vol = sweep.perspective_plane_sweep(img, 0, depths, pose, intr)
    assert vol.shape == (b, h, w, 6)


def test_gcn_sphere_sweep_shape():
    rng = np.random.RandomState(4)
    b, h, w, p, v = 1, 8, 16, 3, 12
    img = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    coords = rng.randn(v, 3)
    coords /= np.linalg.norm(coords, axis=1, keepdims=True)
    depths = jnp.asarray(sweep.inv_depths(1.0, 100.0, p))
    eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
    intr = jnp.tile(jnp.asarray(
        [[0.032, 0, 0], [0, 1, 0], [0, 0, 1]])[None], (b, 1, 1))
    out = sweep.gcn_sphere_sweep(img, 1, depths, jnp.asarray(coords), eye,
                                 intr)
    assert out.shape == (b, v, p * 3)
