"""Camera models: backprojection, projection, and pose utilities.

Math parity targets in the reference (formulas only; all code here is
vectorized jnp over a leading [planes] axis instead of per-plane graph loops):
  * backproject_spherical / _planar / _cylindrical — geometry/spherical.py:116-166
  * project_ods (ODS viewing-circle tangent-ray quadratic, with the
    |z|<->|x| numerical-stability swap, disc<0 masking and pole clamping)
    — geometry/spherical.py:170-233
  * project_spherical — geometry/spherical.py:235-246
  * project_perspective — geometry/spherical.py:248-266
  * apply_pose — geometry/projector.py:275-291
  * random jitter pose — geometry/spherical.py:21-40
  * pose slerp interpolation — matryodshka/utils.py:55-74
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from matryodshka_tpu.geometry.grids import (PI, spherical_ray_dirs,
                                            theta_phi_to_pixels)

Array = jax.Array


# ---------------------------------------------------------------------------
# Backprojection: ERP/UV grid + per-plane depth -> 3D points [P, H, W] each.
# ---------------------------------------------------------------------------

def backproject_spherical(S: Array, T: Array, depths: Array,
                          intrinsics: Array | None = None):
    """Points on spheres of radius depths[p] through ERP pixel (S, T).

    Args:
      S, T: [H, W] longitude/latitude grids.
      depths: [P] sphere radii.
    Returns:
      (x, y, z): each [P, H, W], in the RUB reference frame.
    """
    rx, ry, rz = spherical_ray_dirs(S, T)
    d = depths[:, None, None]
    return d * rx[None], d * ry[None], d * rz[None]


def backproject_planar(S: Array, T: Array, depths: Array, intrinsics: Array):
    """Points on fronto-parallel planes at depth depths[p] through UV (S, T).

    intrinsics: [3, 3]; uses fx, fy, cx, cy.
    """
    fx = intrinsics[0, 0]
    fy = intrinsics[1, 1]
    cx = intrinsics[0, 2]
    cy = intrinsics[1, 2]
    d = depths[:, None, None]
    x = d * (S * cx / fx)[None]
    y = d * (T * cy / fy)[None]
    z = d * jnp.ones_like(S)[None]
    return x, y, z


def backproject_cylindrical(S: Array, T: Array, depths: Array,
                            intrinsics: Array):
    fy = intrinsics[1, 1]
    cy = intrinsics[1, 2]
    d = depths[:, None, None]
    x = d * jnp.cos(S)[None]
    y = d * (T * cy / fy)[None]
    z = d * jnp.sin(S)[None]
    return x, y, z


# ---------------------------------------------------------------------------
# Pose application (single 4x4 pose applied to a [P, H, W] point stack).
# ---------------------------------------------------------------------------

def apply_pose(points, pose: Array):
    """Rigidly transform a stack of points by one 4x4 pose.

    points: tuple of (x, y, z), each [P, H, W] (or any common shape).
    pose: [4, 4].
    """
    x, y, z = points
    R = pose[:3, :3]
    t = pose[:3, 3]
    xo = R[0, 0] * x + R[0, 1] * y + R[0, 2] * z + t[0]
    yo = R[1, 0] * x + R[1, 1] * y + R[1, 2] * z + t[1]
    zo = R[2, 0] * x + R[2, 1] * y + R[2, 2] * z + t[2]
    return xo, yo, zo


def rotate_dirs(dirs, pose: Array):
    """Rotate direction vectors by the rotation part of a 4x4 pose."""
    x, y, z = dirs
    R = pose[:3, :3]
    xo = R[0, 0] * x + R[0, 1] * y + R[0, 2] * z
    yo = R[1, 0] * x + R[1, 1] * y + R[1, 2] * z
    zo = R[2, 0] * x + R[2, 1] * y + R[2, 2] * z
    return xo, yo, zo


# ---------------------------------------------------------------------------
# Projection: 3D points -> fractional source-image pixel coords [..., 2].
# ---------------------------------------------------------------------------

def project_ods(points, order: int, pose, intrinsics: Array,
                width: int, height: int, negate_y: bool = False):
    """Project 3D points into an omni-directional-stereo (ODS) eye image.

    For each point p, finds the tangent ray of the ODS viewing circle of
    radius r = intrinsics[0, 0] (the half-baseline) that passes through p,
    for the given eye (order=+1 left / -1 right), then converts the ray
    direction to ERP pixel coordinates. Solves the tangency condition as a
    quadratic in the ray-direction x component, swapping the roles of x and
    z when |z| > |x| for numerical stability, exactly mirroring the scheme
    of geometry/spherical.py:170-233 (including the disc<0 masking, NaN
    latitude fixup and +-pi/2 pole clamping).

    Args:
      points: (x, y, z), each of any broadcast-common shape (e.g. [P, H, W]).
      order: +1 left eye, -1 right eye (0 degenerates to a centered camera).
      intrinsics: [3, 3]; [0, 0] holds the ODS circle radius.
      negate_y: the reference negates y when points arrive as a packed
        tensor (spherical.py:172-175); plumbed for the GCN vertex path.
    Returns:
      uv: [..., 2] fractional pixel coordinates into the (height, width) ERP.
    """
    x, y, z = points
    if negate_y:
        y = -y

    r = intrinsics[0, 0]
    f = r * r - (jnp.square(x) + jnp.square(z))
    z_larger_x = jnp.abs(z) > jnp.abs(x)
    px = jnp.where(z_larger_x, x, z)
    pz = jnp.where(z_larger_x, z, x)

    pz_sq = jnp.square(pz)
    a = 1.0 + jnp.square(px) / pz_sq
    b = -2.0 * f * px / pz_sq
    c = f + jnp.square(f) / pz_sq
    disc = jnp.square(b) - 4.0 * a * c

    # Safe sqrt: invalid (disc < 0) lanes are masked out below, and clamping
    # keeps NaNs out of the backward pass.
    s = -order * jnp.sign(pz) * jnp.sqrt(jnp.maximum(disc, 0.0))
    s = jnp.where(z_larger_x, s, -s)

    dx = (-b + s) / (2.0 * a)
    dz = (f - px * dx) / pz
    dx, dz = jnp.where(z_larger_x, -dx, -dz), jnp.where(z_larger_x, -dz, -dx)
    dy = y

    theta = -jnp.arctan2(dz, dx)
    phi = jnp.arctan2(dy, jnp.sqrt(jnp.square(dx) + jnp.square(dz)))
    phi = jnp.where(jnp.isnan(phi), jnp.ones_like(phi), phi)
    phi = jnp.clip(phi, -PI / 2, PI / 2)

    uv = theta_phi_to_pixels(theta, phi, width, height)
    # Invalid (no tangent ray) -> park at pixel (1, 1) like the reference.
    valid = disc >= 0.0
    return jnp.where(valid[..., None], uv, jnp.ones_like(uv))


def project_spherical(points, order, pose, intrinsics,
                      width: int, height: int):
    """Project points into a centered ERP camera (angles -> pixels)."""
    x, y, z = points
    theta = -jnp.arctan2(z, x)
    phi = jnp.arctan2(y, jnp.sqrt(jnp.square(x) + jnp.square(z)))
    return theta_phi_to_pixels(theta, phi, width, height)


def project_perspective(points, order, pose: Array, intrinsics: Array,
                        width: int, height: int):
    """Pinhole projection K @ pose applied to homogeneous points.

    points: (x, y, z) each [P, H, W]; pose [4, 4]; intrinsics [3, 3]
    (embedded in a 4x4 with zero padding as in projector.py:145-147).
    Returns uv [P, H, W, 2].
    """
    x, y, z = points
    K4 = jnp.zeros((4, 4), dtype=x.dtype).at[:3, :3].set(intrinsics)
    M = K4 @ pose
    u = M[0, 0] * x + M[0, 1] * y + M[0, 2] * z + M[0, 3]
    v = M[1, 0] * x + M[1, 1] * y + M[1, 2] * z + M[1, 3]
    w = M[2, 0] * x + M[2, 1] * y + M[2, 2] * z + M[2, 3]
    return jnp.stack([u / w, v / w], axis=-1)


# ---------------------------------------------------------------------------
# Poses.
# ---------------------------------------------------------------------------

def rotation_from_euler(angles: Array) -> Array:
    """3x3 rotation from XYZ Euler angles [ax, ay, az] (R = Rz @ Ry @ Rx),
    matching tfg.rotation_matrix_3d.from_euler used by the jitter sampler."""
    ax, ay, az = angles[0], angles[1], angles[2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    Rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], dtype=angles.dtype)
    Ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], dtype=angles.dtype)
    Rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]], dtype=angles.dtype)
    return Rz @ Ry @ Rx


def random_jitter_pose(key: Array, rot_factor: float = 1.0,
                       tr_factor: float = 1.0,
                       angle_range=(-0.03, 0.03),
                       offset_range=(-0.01, 0.01)) -> Array:
    """Uniform random small rotation + translation as a 4x4 pose.

    The transform-inverse regularizer's jitter (spherical.py:21-40): angles
    uniform in +-0.03*rot_factor rad, translation uniform in +-0.01*tr_factor.
    """
    ka, kt = jax.random.split(key)
    lo_a, hi_a = angle_range[0] * rot_factor, angle_range[1] * rot_factor
    lo_t, hi_t = offset_range[0] * tr_factor, offset_range[1] * tr_factor
    angles = jax.random.uniform(ka, (3,), minval=lo_a, maxval=hi_a)
    tr = jax.random.uniform(kt, (3,), minval=lo_t, maxval=hi_t)
    R = rotation_from_euler(angles)
    pose = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(tr)
    return pose


def pose_from_offset(offset: Array) -> Array:
    """[3] translation -> 4x4 [I | t] pose (data_loader.py:177-180)."""
    return jnp.eye(4, dtype=offset.dtype).at[:3, 3].set(offset)


def quaternion_from_rotation(R: Array) -> Array:
    """Unit quaternion (x, y, z, w) from a 3x3 rotation matrix.

    Branch-free Shepperd-style selection of the numerically best of the four
    candidate formulas, vectorization-friendly for jit.
    """
    tr = R[0, 0] + R[1, 1] + R[2, 2]
    # Four candidates; pick the one with largest pivot.
    qw = jnp.array([
        1.0 + tr,
        1.0 + R[0, 0] - R[1, 1] - R[2, 2],
        1.0 - R[0, 0] + R[1, 1] - R[2, 2],
        1.0 - R[0, 0] - R[1, 1] + R[2, 2],
    ])
    case = jnp.argmax(qw)
    s0 = jnp.sqrt(jnp.maximum(qw[0], 1e-12)) * 2.0
    q0 = jnp.array([(R[2, 1] - R[1, 2]) / s0, (R[0, 2] - R[2, 0]) / s0,
                    (R[1, 0] - R[0, 1]) / s0, 0.25 * s0])
    s1 = jnp.sqrt(jnp.maximum(qw[1], 1e-12)) * 2.0
    q1 = jnp.array([0.25 * s1, (R[0, 1] + R[1, 0]) / s1,
                    (R[0, 2] + R[2, 0]) / s1, (R[2, 1] - R[1, 2]) / s1])
    s2 = jnp.sqrt(jnp.maximum(qw[2], 1e-12)) * 2.0
    q2 = jnp.array([(R[0, 1] + R[1, 0]) / s2, 0.25 * s2,
                    (R[1, 2] + R[2, 1]) / s2, (R[0, 2] - R[2, 0]) / s2])
    s3 = jnp.sqrt(jnp.maximum(qw[3], 1e-12)) * 2.0
    q3 = jnp.array([(R[0, 2] + R[2, 0]) / s3, (R[1, 2] + R[2, 1]) / s3,
                    0.25 * s3, (R[1, 0] - R[0, 1]) / s3])
    q = jnp.stack([q0, q1, q2, q3])[case]
    return q / jnp.linalg.norm(q)


def rotation_from_quaternion(q: Array) -> Array:
    """3x3 rotation from unit quaternion (x, y, z, w)."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    return jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def slerp(q0: Array, q1: Array, t: float) -> Array:
    """Spherical linear interpolation between two unit quaternions."""
    dot = jnp.sum(q0 * q1)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    # Fall back to lerp for nearly parallel quaternions.
    w0 = jnp.where(sin_theta > 1e-6, jnp.sin((1 - t) * theta) / sin_theta,
                   1.0 - t)
    w1 = jnp.where(sin_theta > 1e-6, jnp.sin(t * theta) / sin_theta, t)
    q = w0 * q0 + w1 * q1
    return q / jnp.linalg.norm(q)


def interpolate_pose(ref_pose: Array, src_pose: Array, t: float = 0.5) -> Array:
    """Slerp rotations and lerp translations of two [4,4] poses
    (matryodshka/utils.py:55-74; used as the PP-mode reference frame)."""
    q0 = quaternion_from_rotation(ref_pose[:3, :3])
    q1 = quaternion_from_rotation(src_pose[:3, :3])
    R = rotation_from_quaternion(slerp(q0, q1, t))
    tr = (1 - t) * ref_pose[:3, 3] + t * src_pose[:3, 3]
    out = jnp.eye(4, dtype=ref_pose.dtype)
    return out.at[:3, :3].set(R).at[:3, 3].set(tr)
