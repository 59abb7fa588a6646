"""Evaluation metrics + basic loss tests."""

import jax
import jax.numpy as jnp
import numpy as np

from matryodshka_tpu.evaluation import metrics as M
from matryodshka_tpu.losses import basic


def _img(seed, h=48, w=64):
    return jnp.asarray(np.random.RandomState(seed).rand(h, w, 3)
                       .astype(np.float32))


def test_ssim_identical_is_one():
    a = _img(0)
    np.testing.assert_allclose(float(M.ssim(a, a)), 1.0, atol=1e-5)


def test_ssim_decreases_with_noise():
    a = _img(1)
    n = jnp.asarray(np.random.RandomState(2).randn(48, 64, 3)
                    .astype(np.float32))
    s1 = float(M.ssim(jnp.clip(a + 0.02 * n, 0, 1), a))
    s2 = float(M.ssim(jnp.clip(a + 0.2 * n, 0, 1), a))
    assert 1.0 > s1 > s2 > 0.0


def test_psnr_formula():
    a = _img(3)
    b = a + 0.1
    # mse = 0.01 -> psnr = 20
    np.testing.assert_allclose(float(M.psnr(b, a)), 20.0, atol=1e-3)


def test_remove_pole():
    img = np.zeros((32, 8, 3))
    out = M.remove_pole(img)
    assert out.shape == (16, 8, 3)


def test_temporal_diff_zero_for_identical():
    a = _img(4)
    assert float(M.temporal_diff(a, a)) < 1e-7
    b = _img(5)
    assert float(M.temporal_diff(a, b)) > 0.01


def test_l2_loss_is_half_sum():
    """The reference pixel loss is 0.5*sum(sq), NOT a mean (msi.py:662)."""
    rng = np.random.RandomState(0)
    p = jnp.asarray(rng.rand(2, 4, 4, 3).astype(np.float32))
    t = jnp.asarray(rng.rand(2, 4, 4, 3).astype(np.float32))
    got = float(basic.l2_loss(p, t))
    exp = 0.5 * np.sum((np.asarray(p) - np.asarray(t)) ** 2)
    np.testing.assert_allclose(got, exp, rtol=1e-6)


def test_l2_loss_weights_multiply_both():
    rng = np.random.RandomState(1)
    p = jnp.asarray(rng.rand(1, 4, 4, 1).astype(np.float32))
    t = jnp.asarray(rng.rand(1, 4, 4, 1).astype(np.float32))
    w = jnp.asarray(rng.rand(1, 4, 4, 1).astype(np.float32))
    got = float(basic.l2_loss(p, t, w))
    exp = 0.5 * np.sum((np.asarray(w) * (np.asarray(p) - np.asarray(t)))
                       ** 2)
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_spherical_weights_properties():
    """Latitude map (msi.py:1132-1143): positive, finite, and largest at
    the EQUATOR (cos is flattest there, so 1/|dcos| blows up; near the
    poles cos changes fastest and the weight is small)."""
    w = np.asarray(basic.spherical_weights(16, 32))
    assert w.shape == (16, 32)
    assert np.isfinite(w).all() and (w > 0).all()
    assert w[8].mean() > w[0].mean()  # equator row > pole row


def test_hres_render_fn_shapes(tmp_path):
    """The shell-streamed high-res renderer produces sane output."""
    from matryodshka_tpu.cli.test import build_hres_render_fn
    from matryodshka_tpu.config import MatryConfig
    cfg = MatryConfig(height=16, width=32, hres_height=32, hres_width=64,
                      num_psv_planes=3, num_msi_planes=3,
                      compute_dtype="float32").validate()
    render = build_hres_render_fn(cfg)
    rng = np.random.RandomState(0)
    b = 1
    eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
    intr = jnp.tile(jnp.asarray([[0.032, 0, 0], [0, 1, 0], [0, 0, 1.0]],
                                dtype=jnp.float32)[None], (b, 1, 1))
    rgb, depth = render(
        jnp.asarray(rng.rand(b, 32, 64, 3).astype(np.float32)),
        jnp.asarray(rng.rand(b, 32, 64, 3).astype(np.float32)),
        jnp.asarray(rng.rand(b, 16, 32, 3).astype(np.float32)),
        jnp.asarray(rng.rand(b, 16, 32, 3).astype(np.float32)),
        eye, eye, eye, intr,
        jnp.asarray([[0.02, 0.0, 0.0]]))
    assert rgb.shape == (b, 32, 64, 3)
    assert depth.shape == (b, 32, 64, 3)
    assert np.isfinite(np.asarray(rgb)).all()


def test_hres_render_sharded_matches_single():
    """cfg.shard_shells wiring: the shell-sharded hres renderer (4 shells
    over a 4-device 'shell' mesh axis, partial composites + all_gather)
    must reproduce the single-device scan."""
    import jax
    from matryodshka_tpu.cli.test import build_hres_render_fn
    from matryodshka_tpu.config import MatryConfig
    from matryodshka_tpu.parallel.mesh import make_mesh
    cfg = MatryConfig(height=16, width=32, hres_height=32, hres_width=64,
                      num_psv_planes=4, num_msi_planes=4,
                      compute_dtype="float32").validate()
    rng = np.random.RandomState(1)
    b = 1
    eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
    intr = jnp.tile(jnp.asarray([[0.032, 0, 0], [0, 1, 0], [0, 0, 1.0]],
                                dtype=jnp.float32)[None], (b, 1, 1))
    args = (
        jnp.asarray(rng.rand(b, 32, 64, 3).astype(np.float32)),
        jnp.asarray(rng.rand(b, 32, 64, 3).astype(np.float32)),
        jnp.asarray(rng.rand(b, 16, 32, 4).astype(np.float32)),
        jnp.asarray(rng.rand(b, 16, 32, 4).astype(np.float32)),
        eye, eye, eye, intr, jnp.asarray([[0.02, 0.0, 0.0]]))
    rgb1, depth1 = build_hres_render_fn(cfg)(*args)
    mesh = make_mesh(shell=4)
    rgbN, depthN = build_hres_render_fn(cfg, mesh=mesh)(*args)
    np.testing.assert_allclose(np.asarray(rgbN), np.asarray(rgb1),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(depthN), np.asarray(depth1),
                               atol=2e-5)
