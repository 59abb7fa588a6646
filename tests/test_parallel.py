"""Parallelism tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matryodshka_tpu.config import MatryConfig
from matryodshka_tpu.geometry import render as render_lib
from matryodshka_tpu.parallel import dp, mesh as mesh_lib, sharded_render
from matryodshka_tpu.training import state as state_lib

from tests.test_train_smoke import synthetic_batch, tiny_cfg


def test_mesh_construction():
    m = mesh_lib.make_mesh(data=4, shell=2)
    assert m.shape == {"data": 4, "shell": 2}
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(data=16, shell=1)


def test_partial_composite_equals_full():
    rng = np.random.RandomState(0)
    rgba = rng.rand(6, 8, 12, 4).astype(np.float32)
    rgba[:, :, 0, 3] = 1.0  # bake in layer-0 convention
    full = np.asarray(render_lib.over_composite(jnp.asarray(rgba)))
    # split into 4 groups of 3 shells, composite partials, recombine
    Cs, Ts = [], []
    for g in range(4):
        C, T = sharded_render.partial_composite(
            jnp.asarray(rgba[:, :, g * 3:(g + 1) * 3]))
        Cs.append(C)
        Ts.append(T)
    out = np.asarray(sharded_render.combine_partials(
        jnp.stack(Cs), jnp.stack(Ts)))
    np.testing.assert_allclose(out, full, rtol=1e-4, atol=1e-5)


def test_sharded_render_matches_single_device():
    rng = np.random.RandomState(1)
    h, w, p = 16, 32, 8
    rgba = jnp.asarray(rng.rand(h, w, p, 4).astype(np.float32))
    radii = jnp.asarray(np.linspace(100.0, 1.0, p).astype(np.float32))
    pose = jnp.eye(4)
    pos = jnp.asarray([0.03, 0.01, -0.02])

    expected = np.asarray(render_lib.render_equirect_view(
        rgba, pose, pos, radii))

    m = mesh_lib.make_mesh(data=1, shell=8)
    got = np.asarray(sharded_render.render_equirect_view_sharded(
        rgba, pose, pos, radii, m))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_dp_train_step_matches_single_device():
    """A DP-sharded step over 4 devices must produce the same loss and
    parameters as the unsharded step on the same global batch."""
    from matryodshka_tpu.training.step import make_train_step

    cfg = tiny_cfg(batch_size=4)
    batch = synthetic_batch(cfg)

    rng = jax.random.PRNGKey(0)
    state, model = state_lib.init_state(cfg, rng)
    tx = state_lib.build_optimizer(cfg)

    step_single = make_train_step(cfg, model.apply, tx, donate=False)
    s1, m1 = step_single(state, batch, jax.random.PRNGKey(7))

    m = mesh_lib.make_mesh(data=4)
    step_dp = dp.make_dp_train_step(cfg, model.apply, tx, m)
    sharded = dp.shard_batch(batch, m)
    s2, m2 = step_dp(state, sharded, jax.random.PRNGKey(7))

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=1e-4)
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
