"""Golden-value and property tests for the geometry core.

Golden values come from independent numpy transcriptions of the closed-form
math cited in SURVEY.md section 2.1 (reference file:line in each docstring),
not from running the reference code.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matryodshka_tpu.geometry import cameras, grids, intersect, render, sweep
from matryodshka_tpu.geometry.grids import theta_phi_to_pixels

PI = math.pi


# ---------------------------------------------------------------------------
# Grids
# ---------------------------------------------------------------------------

def test_lat_long_grid_endpoints():
    h, w = 8, 16
    S, T = grids.lat_long_grid((h, w))
    assert S.shape == (h, w) and T.shape == (h, w)
    np.testing.assert_allclose(S[0, 0], -PI + PI / w, rtol=1e-6)
    np.testing.assert_allclose(S[0, -1], PI - PI / w, rtol=1e-6)
    np.testing.assert_allclose(T[0, 0], -PI / 2 + PI / (2 * h), rtol=1e-6)
    np.testing.assert_allclose(T[-1, 0], PI / 2 - PI / (2 * h), rtol=1e-6)
    # constant along the orthogonal axis
    np.testing.assert_allclose(S[3], S[0], rtol=1e-6)
    np.testing.assert_allclose(T[:, 5], T[:, 0], rtol=1e-6)


def test_theta_phi_to_pixels_roundtrip_grid():
    """Pixel (i, j)'s own angles must map back to (u, v) = (j, i)."""
    h, w = 10, 20
    S, T = grids.lat_long_grid((h, w))
    uv = theta_phi_to_pixels(S, T, w, h)
    J, I = np.meshgrid(np.arange(w), np.arange(h))
    np.testing.assert_allclose(np.asarray(uv[..., 0]), J, atol=1e-4)
    np.testing.assert_allclose(np.asarray(uv[..., 1]), I, atol=1e-4)


# ---------------------------------------------------------------------------
# Backproject / project round trips
# ---------------------------------------------------------------------------

def test_spherical_backproject_project_is_horizontal_flip():
    """backproject at radius d then project_spherical lands on (W-1-j, i).

    The ERP longitude convention flips horizontally between the
    inside-looking-out parameterization (backproject, spherical.py:116-129)
    and the projection (theta = -atan2(z, x), spherical.py:243).
    """
    h, w = 12, 24
    S, T = grids.lat_long_grid((h, w))
    depths = jnp.array([1.0, 3.0, 55.0])
    pts = cameras.backproject_spherical(S, T, depths)
    uv = cameras.project_spherical(pts, 1, None, None, w, h)
    J, I = np.meshgrid(np.arange(w), np.arange(h))
    for p in range(3):
        np.testing.assert_allclose(np.asarray(uv[p, ..., 0]), w - 1 - J,
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(uv[p, ..., 1]), I, atol=1e-3)


def test_backproject_spherical_radius():
    h, w = 6, 8
    S, T = grids.lat_long_grid((h, w))
    depths = jnp.array([2.5, 7.0])
    x, y, z = cameras.backproject_spherical(S, T, depths)
    r = np.sqrt(np.asarray(x) ** 2 + np.asarray(y) ** 2 + np.asarray(z) ** 2)
    np.testing.assert_allclose(r[0], 2.5, rtol=1e-5)
    np.testing.assert_allclose(r[1], 7.0, rtol=1e-5)


@pytest.mark.parametrize("order", [1, -1])
def test_project_ods_tangent_ray_roundtrip(order):
    """A point constructed on eye `order`'s tangent ray through ERP pixel
    (S, T) must project back to that pixel (spherical.py:170-233).

    project_ods's implied ODS capture model (verified numerically: the
    quadratic's chosen root corresponds to the tangent point q below, the
    mirror of intersect_ods's novel-view ray origin):
      origin  q = (sinS*b*order, 0, cosS*b*order)
      dir     r = (cosS*cosT, sinT, -sinS*cosT)
    q_xz is perpendicular to r_xz, so p = q + t*r is a tangent-ray point
    whose viewing direction has theta = S, phi = T.
    """
    h, w = 20, 40
    b = 0.064  # half-baseline
    S, T = grids.lat_long_grid((h, w))
    S, T = np.asarray(S), np.asarray(T)
    intr = jnp.array([[b, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=jnp.float32)

    for t in [0.5, 2.0, 30.0]:
        px = np.sin(S) * b * order + t * np.cos(S) * np.cos(T)
        py = t * np.sin(T)
        pz = np.cos(S) * b * order - t * np.sin(S) * np.cos(T)
        pts = (jnp.asarray(px)[None], jnp.asarray(py)[None],
               jnp.asarray(pz)[None])
        uv = np.asarray(cameras.project_ods(pts, order, None, intr, w, h))[0]
        expected = np.asarray(theta_phi_to_pixels(
            jnp.asarray(S), jnp.asarray(T), w, h))
        np.testing.assert_allclose(uv[..., 0], expected[..., 0], atol=2e-2)
        np.testing.assert_allclose(uv[..., 1], expected[..., 1], atol=2e-2)


def test_project_ods_invalid_inside_circle():
    """Points inside the viewing circle (disc < 0) are parked at pixel 1."""
    b = 0.5
    intr = jnp.array([[b, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=jnp.float32)
    pts = (jnp.array([[[0.1]]]), jnp.array([[[0.0]]]), jnp.array([[[0.1]]]))
    uv = np.asarray(cameras.project_ods(pts, 1, None, intr, 64, 32))
    np.testing.assert_allclose(uv, 1.0)


def test_project_perspective_matches_numpy():
    h, w = 4, 6
    fx, fy, cx, cy = 100.0, 90.0, 3.0, 2.0
    K = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    pose = jnp.eye(4).at[:3, 3].set(jnp.array([0.1, -0.2, 0.05]))
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, h, w).astype(np.float32))
    y = jnp.asarray(rng.randn(2, h, w).astype(np.float32))
    z = jnp.asarray(2.0 + rng.rand(2, h, w).astype(np.float32))
    uv = np.asarray(cameras.project_perspective((x, y, z), 1, pose, K, w, h))
    # numpy reference
    P = np.asarray(jnp.zeros((4, 4)).at[:3, :3].set(K)) @ np.asarray(pose)
    pts = np.stack([x, y, z, np.ones_like(x)], axis=1).reshape(2, 4, -1)
    proj = np.einsum("ij,bjn->bin", P, pts)
    exp = (proj[:, :2] / proj[:, 2:3]).transpose(0, 2, 1).reshape(2, h, w, 2)
    np.testing.assert_allclose(uv, exp, rtol=1e-4, atol=1e-4)


def test_apply_pose_rigid():
    pose = np.eye(4, dtype=np.float32)
    th = 0.3
    pose[:3, :3] = [[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    pose[:3, 3] = [1.0, 2.0, 3.0]
    x = jnp.ones((2, 3, 4))
    y = jnp.zeros((2, 3, 4))
    z = jnp.zeros((2, 3, 4))
    xo, yo, zo = cameras.apply_pose((x, y, z), jnp.asarray(pose))
    np.testing.assert_allclose(np.asarray(xo), np.cos(th) + 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(yo), np.sin(th) + 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(zo), 3.0, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Intersections
# ---------------------------------------------------------------------------

def test_intersect_sphere_identity_is_flip():
    """From the MSI center with identity pose, every shell lookup is the
    horizontal flip (u, v) = (W-1-j, i), exactly on pixel centers."""
    h, w = 10, 16
    radii = jnp.array([1.0, 10.0, 100.0])
    uv = np.asarray(intersect.intersect_sphere(
        jnp.eye(4), jnp.zeros(3), radii, w, h))
    J, I = np.meshgrid(np.arange(w), np.arange(h))
    for p in range(3):
        np.testing.assert_allclose(uv[p, ..., 0], w - 1 - J, atol=1e-3)
        np.testing.assert_allclose(uv[p, ..., 1], I, atol=1e-3)


def test_intersect_sphere_center_swizzle():
    """Translating the target by +x must shift lookups the same way as the
    reference's RDF->RUB (z, y, x) swizzle (spherical.py:286-310)."""
    h, w = 16, 32
    radii = jnp.array([5.0])
    center = jnp.array([0.5, 0.0, 0.0])  # rig-frame x
    uv = np.asarray(intersect.intersect_sphere(
        jnp.eye(4), center, radii, w, h))
    # independent numpy: rays d from grid, origin o = (0, 0, 0.5) (swizzled)
    S, T = [np.asarray(a) for a in grids.lat_long_grid((h, w))]
    rx, ry, rz = (np.cos(S) * np.cos(T), np.sin(T), np.sin(S) * np.cos(T))
    ox, oy, oz = 0.0, 0.0, 0.5
    b = 2 * (rx * ox + ry * oy + rz * oz)
    cc = ox**2 + oy**2 + oz**2 - 25.0
    tt = (-b + np.sqrt(b**2 - 4 * cc)) / 2.0
    X, Y, Z = ox + tt * rx, oy + tt * ry, oz + tt * rz
    theta = -np.arctan2(Z, X)
    phi = np.arctan2(Y, np.sqrt(X**2 + Z**2))
    exp = np.asarray(theta_phi_to_pixels(jnp.asarray(theta),
                                         jnp.asarray(phi), w, h))
    np.testing.assert_allclose(uv[0], exp, atol=1e-3)


def test_intersect_ods_identity_consistency():
    """ODS eye rays from the viewing circle intersect a big shell nearly
    where the centered rays do (baseline << radius)."""
    h, w = 12, 24
    radii = jnp.array([100.0])
    intr = jnp.array([[0.032, 0, 0], [0, 1, 0], [0, 0, 1.0]])
    uv_ods = np.asarray(intersect.intersect_ods(
        jnp.eye(4), jnp.zeros(3), 1, intr, radii, w, h))
    # centered rays with the same (mirrored-z) direction convention
    S, T = [np.asarray(a) for a in grids.lat_long_grid((h, w))]
    theta = -np.arctan2(-np.sin(S) * np.cos(T), np.cos(S) * np.cos(T))
    exp = np.asarray(theta_phi_to_pixels(jnp.asarray(theta), jnp.asarray(T),
                                         w, h))
    np.testing.assert_allclose(uv_ods[0, ..., 1], exp[..., 1], atol=0.05)
    # longitudes match within a small parallax margin away from the poles
    interior = slice(2, -2)
    np.testing.assert_allclose(uv_ods[0, interior, :, 0],
                               exp[interior, :, 0], atol=0.25)


# ---------------------------------------------------------------------------
# Over-compositing
# ---------------------------------------------------------------------------

def _loop_over_composite(rgbas):
    """Reference semantics (projector.py:246-265), literal loop in numpy."""
    out = None
    for i in range(rgbas.shape[-2]):
        rgb = rgbas[..., i, 0:3]
        alpha = rgbas[..., i, 3:]
        if i == 0:
            out = rgb
        else:
            out = rgb * alpha + out * (1.0 - alpha)
    return out


def _loop_over_composite_depth(rgbas):
    """projector.py:225-244 literal loop."""
    n = rgbas.shape[-2]
    out = 0.0
    for i in range(n):
        alpha = np.repeat(rgbas[..., i, 3:], 3, axis=-1)
        if i == 0:
            out = 0.0
        else:
            out = (i / n) * alpha + out * (1.0 - alpha)
    return out


def test_over_composite_matches_loop():
    rng = np.random.RandomState(3)
    rgba = rng.rand(2, 5, 6, 8, 4).astype(np.float32)
    got = np.asarray(render.over_composite(jnp.asarray(rgba)))
    exp = _loop_over_composite(rgba)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_over_composite_depth_matches_loop():
    rng = np.random.RandomState(4)
    rgba = rng.rand(1, 4, 4, 6, 4).astype(np.float32)
    got = np.asarray(render.over_composite_depth(jnp.asarray(rgba)))
    exp = _loop_over_composite_depth(rgba)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_over_composite_opaque_front_layer():
    rgba = np.zeros((1, 3, 3, 4, 4), dtype=np.float32)
    rgba[..., -1, :3] = 0.7  # nearest layer
    rgba[..., -1, 3] = 1.0   # fully opaque
    rgba[..., 0, :3] = 0.1
    got = np.asarray(render.over_composite(jnp.asarray(rgba)))
    np.testing.assert_allclose(got, 0.7, rtol=1e-6)


# ---------------------------------------------------------------------------
# inv_depths
# ---------------------------------------------------------------------------

def test_inv_depths_reference_spec():
    """msi.py:1196-1217: inverse-depth uniform, endpoints included,
    descending (far -> near)."""
    d = sweep.inv_depths(1.0, 100.0, 32)
    assert len(d) == 32
    assert d[0] == 100.0 and d[-1] == 1.0
    assert all(d[i] > d[i + 1] for i in range(31))
    inv = 1.0 / np.asarray(d)
    np.testing.assert_allclose(np.diff(inv), inv[1] - inv[0], rtol=1e-6)


def test_pose_helpers():
    off = jnp.array([1.0, 2.0, 3.0])
    pose = np.asarray(cameras.pose_from_offset(off))
    np.testing.assert_allclose(pose[:3, 3], [1, 2, 3])
    np.testing.assert_allclose(pose[:3, :3], np.eye(3))

    key = jax.random.PRNGKey(0)
    jp = np.asarray(cameras.random_jitter_pose(key, 1.0, 1.0))
    # rotation close to identity, translation small
    np.testing.assert_allclose(jp[:3, :3] @ jp[:3, :3].T, np.eye(3),
                               atol=1e-5)
    assert np.abs(jp[:3, 3]).max() <= 0.01 + 1e-6
    assert np.abs(jp[:3, :3] - np.eye(3)).max() < 0.1


def test_interpolate_pose_midpoint():
    th = 0.8
    ref = np.eye(4, dtype=np.float32)
    src = np.eye(4, dtype=np.float32)
    src[:3, :3] = [[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    src[:3, 3] = [2.0, 0.0, 0.0]
    mid = np.asarray(cameras.interpolate_pose(jnp.asarray(ref),
                                              jnp.asarray(src)))
    half = th / 2
    np.testing.assert_allclose(
        mid[:3, :3],
        [[np.cos(half), -np.sin(half), 0],
         [np.sin(half), np.cos(half), 0], [0, 0, 1]], atol=1e-5)
    np.testing.assert_allclose(mid[:3, 3], [1.0, 0.0, 0.0], atol=1e-6)


def test_over_composite_jit_full_scale_after_transpose():
    """Regression: XLA-TPU miscompiled the fused transpose+flip+cumprod+
    reduce graph the old flip-form _transmittance produced under jit at
    full scale (silently wrong by O(1)); _transmittance now uses
    lax.cumprod(reverse=True). Pin the jitted plane-major path against
    the literal loop at production scale."""
    rng = np.random.RandomState(7)
    proj = rng.rand(32, 320, 640, 4).astype(np.float32)

    @jax.jit
    def composite_plane_major(pr):
        return render.over_composite(jnp.moveaxis(pr, 0, 2))

    got = np.asarray(composite_plane_major(jnp.asarray(proj)))
    exp = _loop_over_composite(np.moveaxis(proj, 0, 2))
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_intersect_sphere_uv_matches_stacked():
    """Channel-first intersect (hot-path form) == the stacked original."""
    import jax.numpy as jnp
    from matryodshka_tpu.geometry import intersect

    radii = jnp.linspace(1.0, 50.0, 6)
    pose = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.04, 0.01, -0.02]))
    pos = jnp.asarray([0.04, 0.01, -0.02])
    uv = intersect.intersect_sphere(pose, pos, radii, 64, 32)
    u, v = intersect.intersect_sphere_uv(pose, pos, radii, 64, 32)
    np.testing.assert_array_equal(np.asarray(u), np.asarray(uv[..., 0]))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(uv[..., 1]))
