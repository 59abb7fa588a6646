"""Fused Pallas ODS sweep vs the general gather path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matryodshka_tpu.geometry import sweep as sweep_lib
from matryodshka_tpu.ops import pallas_sweep


@pytest.mark.parametrize("order", [1, -1])
def test_fused_sweep_matches_gather_path(order):
    h, w, p = 32, 64, 6
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    depths = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, p))
    eye = jnp.eye(4)[None]
    intr = jnp.asarray([[0.064, 0, 0], [0, 1, 0], [0, 0, 1.0]],
                       dtype=jnp.float32)[None]

    ref = np.asarray(sweep_lib.ods_sphere_sweep(img, order, depths, eye,
                                                intr))
    got = np.asarray(pallas_sweep.ods_sweep_identity(
        img, order, depths, intr, interpret=True))
    assert got.shape == ref.shape
    # identical up to f32 noise of the two coordinate evaluations
    err = np.abs(got - ref)
    assert np.percentile(err, 99) < 2e-3, np.percentile(err, 99)
    assert err.mean() < 2e-4, err.mean()


def test_fused_sweep_invalid_rows_match():
    """Near shells have invalid (inside-viewing-circle) pole rows; both
    paths must park them at pixel (1,1)."""
    h, w = 32, 64
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    depths = jnp.asarray([0.09])  # close to the 0.064 circle: many
    eye = jnp.eye(4)[None]        # rows invalid
    intr = jnp.asarray([[0.064, 0, 0], [0, 1, 0], [0, 0, 1.0]],
                       dtype=jnp.float32)[None]
    ref = np.asarray(sweep_lib.ods_sphere_sweep(img, 1, depths, eye, intr))
    got = np.asarray(pallas_sweep.ods_sweep_identity(
        img, 1, depths, intr, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-3)
