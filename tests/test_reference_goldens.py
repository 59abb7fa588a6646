"""Library vs committed reference goldens (the parity second path).

tests/goldens/reference_goldens.npz holds outputs of
tools/reference_numpy.py — a literal, numpy-only transcription of the
reference's TF graphs (tools/gen_reference_goldens.py regenerates it).
These tests pin every geometry stage of matryodshka_tpu to that second
derivation: grids, backprojection, ODS/spherical projection,
ray-shell intersections (identity, translated and rotated poses),
wrap-around resampling, the full double-eye sweep, over-compositing and
novel-view rendering. See PARITY.md for the scope and tolerances.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from matryodshka_tpu.geometry import cameras, grids, intersect, render
from matryodshka_tpu.geometry import sweep as sweep_lib
from matryodshka_tpu.ops.resample import bilinear_wrap_resample

G = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                         "reference_goldens.npz"))
H, W, P = 32, 64, 6
DEPTHS = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, P))
INTR = jnp.eye(3).at[0, 0].set(0.032)[None]
ATOL = 2e-4  # float32 transcendentals along two independent paths


def test_inv_depths():
    np.testing.assert_allclose(
        np.asarray(jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, 32))),
        G["inv_depths_32"], rtol=1e-6)


def test_grids():
    S, T = grids.lat_long_grid((H, W))
    np.testing.assert_allclose(np.asarray(S), G["lat_long_S"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(T), G["lat_long_T"], atol=1e-6)
    U, V = grids.uv_grid((H, W))
    np.testing.assert_allclose(np.asarray(U), G["uv_grid_U"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(V), G["uv_grid_V"], atol=1e-6)


def test_backproject_spherical():
    S, T = grids.lat_long_grid((H, W))
    pts = cameras.backproject_spherical(S, T, DEPTHS)
    np.testing.assert_allclose(np.asarray(jnp.stack(pts)),
                               G["backproject_spherical"], atol=1e-4)


@pytest.mark.parametrize("order,key", [(1, "project_ods_l"),
                                       (-1, "project_ods_r")])
def test_project_ods(order, key):
    S, T = grids.lat_long_grid((H, W))
    pts = cameras.backproject_spherical(S, T, DEPTHS)
    uv = cameras.project_ods(pts, order, None, INTR[0], W, H)
    got = np.asarray(uv)
    exp = G[key]
    # the park-at-(1,1) mask is decided by an f32 discriminant sign; a
    # handful of boundary pixels may flip between the two derivations
    close = np.isclose(got, exp, atol=1e-2)
    either_parked = (np.all(np.isclose(got, 1.0, atol=1e-5), axis=-1)
                     | np.all(np.isclose(exp, 1.0, atol=1e-5), axis=-1))
    ok = close.all(axis=-1) | either_parked
    frac_boundary = 1.0 - ok.mean()
    assert frac_boundary == 0.0, frac_boundary
    # and the overwhelming majority must agree without the park escape
    # (the flips concentrate on far shells where the reference's own
    # disc = b^2-4ac is f32 sign-noise; ~0.6% of pixels here)
    assert close.all(axis=-1).mean() > 0.99


def test_project_spherical():
    S, T = grids.lat_long_grid((H, W))
    pts = cameras.backproject_spherical(S, T, DEPTHS)
    uv = cameras.project_spherical(pts, 1, None, None, W, H)
    np.testing.assert_allclose(np.asarray(uv), G["project_spherical"],
                               atol=ATOL)


@pytest.mark.parametrize("key,pose,center", [
    ("intersect_sphere_id_offs", np.eye(4), [0.05, -0.02, 0.03]),
    ("intersect_sphere_jit_offs", None, [-0.04, 0.01, 0.06]),
])
def test_intersect_sphere(key, pose, center):
    pose = G["jitter_pose"] if pose is None else pose
    uv = intersect.intersect_sphere(jnp.asarray(pose),
                                    jnp.asarray(center), DEPTHS, W, H)
    np.testing.assert_allclose(np.asarray(uv), G[key], atol=2e-3)


def test_intersect_ods():
    uv = intersect.intersect_ods(jnp.eye(4), None, 1, INTR[0], DEPTHS,
                                 W, H)
    np.testing.assert_allclose(np.asarray(uv), G["intersect_ods_l"],
                               atol=2e-3)
    uv = intersect.intersect_ods(jnp.asarray(G["jitter_pose"]), None, -1,
                                 INTR[0], DEPTHS, W, H)
    np.testing.assert_allclose(np.asarray(uv), G["intersect_ods_jit_r"],
                               atol=2e-3)


def test_intersect_perspective():
    uv = intersect.intersect_perspective(
        jnp.eye(4), jnp.asarray([0.02, -0.01, 0.04]), DEPTHS, W, H,
        tgt_width=32, tgt_height=16)
    np.testing.assert_allclose(np.asarray(uv), G["intersect_persp"],
                               atol=2e-3)


def test_wrap_resample():
    img = G["resample_img"]
    coords = G["resample_coords"]
    got = np.stack([
        np.asarray(bilinear_wrap_resample(jnp.asarray(img[i]),
                                          jnp.asarray(coords[i])))
        for i in range(img.shape[0])])
    np.testing.assert_allclose(got, G["resample_out"], atol=1e-5)


@pytest.mark.parametrize("order,key", [(1, "sweep_l"), (-1, "sweep_r")])
def test_full_ods_sweep(order, key):
    image = jnp.asarray(G["sweep_image"])
    pose = jnp.eye(4)[None]
    got = np.asarray(sweep_lib.ods_sphere_sweep(image, order, DEPTHS,
                                                pose, INTR))
    # both emit plane-major channels ([..., p*3 + c]): sweep_one's
    # transpose to [H, W, P, C] then reshape (projector.py:166-169)
    exp = G[key]
    err = np.abs(got[0] - exp)
    # same park-boundary escape as project_ods: compare off-boundary
    assert np.median(err) < 1e-5
    assert (err < 5e-3).mean() > 0.99


def test_over_composite_goldens():
    rgba = jnp.asarray(G["render_rgba"])           # [H, W, P, 4]
    got = np.asarray(render.over_composite(rgba))
    np.testing.assert_allclose(got, G["over_composite"][0], atol=1e-5)
    gotd = np.asarray(render.over_composite_depth(rgba))
    np.testing.assert_allclose(gotd, G["over_composite_depth"][0],
                               atol=1e-5)


def test_render_equirect_golden():
    rgba = jnp.asarray(G["render_rgba"])
    got = np.asarray(render.render_equirect_view(
        rgba, jnp.eye(4), jnp.asarray([0.05, -0.02, 0.03]), DEPTHS))
    np.testing.assert_allclose(got, G["render_equirect"], atol=2e-3)


def test_render_ods_golden():
    rgba = jnp.asarray(G["render_rgba"])
    got = np.asarray(render.render_ods_view(rgba, 1, jnp.eye(4), None,
                                            DEPTHS, INTR[0]))
    np.testing.assert_allclose(got, G["render_ods_l"], atol=2e-3)
