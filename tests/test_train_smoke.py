"""End-to-end training smoke tests on tiny synthetic batches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matryodshka_tpu.config import MatryConfig
from matryodshka_tpu.training import state as state_lib
from matryodshka_tpu.training.step import make_train_step


def tiny_cfg(**kw):
    base = dict(height=32, width=64, num_psv_planes=4, num_msi_planes=4,
                ngf=8, batch_size=1, compute_dtype="float32")
    base.update(kw)
    return MatryConfig(**base).validate()


def synthetic_batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    b, h, w = cfg.batch_size, cfg.height, cfg.width
    def img():
        return jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
    intr = jnp.tile(jnp.asarray([[0.032, 0, 0], [0, 1, 0], [0, 0, 1.0]],
                                dtype=jnp.float32)[None], (b, 1, 1))
    return {
        "ref_image": img(), "src_image": img(), "tgt_image": img(),
        "ref_pose": eye, "src_pose": eye, "ref_pose_inv": eye,
        "tgt_pose": jnp.tile(jnp.asarray([0.05, 0.0, 0.0])[None], (b, 1)),
        "intrinsics": intr,
    }


def run_steps(cfg, batch, n=3):
    rng = jax.random.PRNGKey(cfg.random_seed)
    state, model = state_lib.init_state(cfg, rng)
    tx = state_lib.build_optimizer(cfg)
    step_fn = make_train_step(cfg, model.apply, tx, donate=False)
    losses = []
    for i in range(n):
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(metrics["total_loss"]))
    return state, losses


def test_train_step_decreases_loss():
    cfg = tiny_cfg()
    batch = synthetic_batch(cfg)
    state, losses = run_steps(cfg, batch, n=4)
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 4


def test_train_step_transform_inverse_reg():
    cfg = tiny_cfg(transform_inverse_reg=True, supervision="tgt_src_ref")
    batch = synthetic_batch(cfg)
    state, losses = run_steps(cfg, batch, n=2)
    assert all(np.isfinite(l) for l in losses), losses


def test_train_step_coordnet_spherical_wreg():
    cfg = tiny_cfg(coord_net=True, spherical_attention=True, wreg=True)
    batch = synthetic_batch(cfg)
    state, losses = run_steps(cfg, batch, n=2)
    assert all(np.isfinite(l) for l in losses), losses


def test_train_step_alpha_only():
    cfg = tiny_cfg(which_color_pred="alpha_only")
    batch = synthetic_batch(cfg)
    _, losses = run_steps(cfg, batch, n=2)
    assert all(np.isfinite(l) for l in losses), losses


def test_param_count_reasonable():
    cfg = tiny_cfg()
    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    n = state_lib.param_count(state.params)
    assert 1_000 < n < 10_000_000


def test_train_step_elpips_loss():
    import warnings
    from matryodshka_tpu.losses.elpips import api as elpips_api
    cfg = tiny_cfg(which_loss="elpips")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ecfg = elpips_api.elpips_vgg(batch_size=cfg.batch_size)
        ecfg.num_scales = 2
        metric = elpips_api.Metric(ecfg)
    batch = synthetic_batch(cfg)
    rng = jax.random.PRNGKey(0)
    state, model = state_lib.init_state(cfg, rng)
    tx = state_lib.build_optimizer(cfg)
    from matryodshka_tpu.training.step import make_train_step
    step_fn = make_train_step(cfg, model.apply, tx,
                              elpips_fn=lambda p, t, k: metric.forward(
                                  p, t, k), donate=False)
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))


def test_train_step_remat():
    cfg = tiny_cfg(remat_network=True)
    batch = synthetic_batch(cfg)
    _, losses = run_steps(cfg, batch, n=2)
    assert all(np.isfinite(l) for l in losses), losses
