"""Literal numpy transcription of the reference's TF graph math.

This is the SECOND derivation path for the parity goldens: each function
follows the reference's TF ops statement by statement (file:line cited
per function), in float32, with no dependence on matryodshka_tpu — so a
shared misreading between this file and the library would have to be a
misreading of the reference's visible arithmetic itself, not of a common
in-repo formula. tools/gen_reference_goldens.py evaluates these on fixed
inputs and writes tests/goldens/reference_goldens.npz;
tests/test_reference_goldens.py holds the library to those values.

Intentionally kept in the reference's shape conventions (plane-major
loops, [P, H, W] stacks, per-plane resampling) rather than the library's
vectorized ones.
"""

from __future__ import annotations

import numpy as np

F = np.float32
PI = np.pi


# ---------------------------------------------------------------------------
# Grids (geometry/spherical.py:42-68)
# ---------------------------------------------------------------------------

def lat_long_grid(shape):
    h, w = shape
    s = np.linspace(-PI + PI / w, PI - PI / w, w, dtype=F)
    t = np.linspace(-PI / 2 + PI / (2 * h), PI / 2 - PI / (2 * h), h,
                    dtype=F)
    return np.meshgrid(s, t)


def uv_grid(shape):
    h, w = shape
    u = np.linspace(-1.0 + 1.0 / w, 1.0 - 1.0 / w, w, dtype=F)
    v = np.linspace(-1.0 + 1.0 / h, 1.0 - 1.0 / h, h, dtype=F)
    return np.meshgrid(u, v)


def theta_phi_to_pixels(theta, phi, width, height):
    # spherical.py:54-68, literal step order
    u = theta + PI
    u = u - (PI / width)
    u = u / (2 * PI - (2 * PI / width))
    u = u * (width - 1)
    v = (phi + (0.5 * PI) - (0.5 * PI / height)) / (PI - PI / height)
    v = v * (height - 1)
    return np.stack([u, v], axis=-1).astype(F)


# ---------------------------------------------------------------------------
# Backprojection (spherical.py:116-166)
# ---------------------------------------------------------------------------

def backproject_spherical(S, T, depth):
    p = depth.shape[0]
    S = np.tile(S[None], (p, 1, 1)).astype(F)
    T = np.tile(T[None], (p, 1, 1)).astype(F)
    d = depth.reshape(p, 1, 1).astype(F)
    cosT = np.cos(T)
    x = d * (np.cos(S) * cosT)
    y = d * np.sin(T)
    z = d * (np.sin(S) * cosT)
    return x, y, z


def backproject_planar(S, T, depth, intrinsics):
    p = depth.shape[0]
    S = np.tile(S[None], (p, 1, 1)).astype(F)
    T = np.tile(T[None], (p, 1, 1)).astype(F)
    d = depth.reshape(p, 1, 1).astype(F)
    fx = intrinsics[0, 0, 0]
    fy = intrinsics[0, 1, 1]
    cx = intrinsics[0, 0, 2]
    cy = intrinsics[0, 1, 2]
    x = d * S * cx / fx
    y = d * T * cy / fy
    z = d * np.ones_like(x)
    return x, y, z


def backproject_cylindrical(S, T, depth, intrinsics):
    p = depth.shape[0]
    S = np.tile(S[None], (p, 1, 1)).astype(F)
    T = np.tile(T[None], (p, 1, 1)).astype(F)
    d = depth.reshape(p, 1, 1).astype(F)
    fy = intrinsics[0, 1, 1]
    cy = intrinsics[0, 1, 2]
    x = d * np.cos(S)
    y = d * T * cy / fy
    z = d * np.sin(S)
    return x, y, z


# ---------------------------------------------------------------------------
# Projection (spherical.py:170-266). Tuple-input project_ods (the sweep
# path, projector.py:163) does NOT negate y; the tensor-input branch
# (spherical.py:173-176) does.
# ---------------------------------------------------------------------------

def project_ods(points, order, intrinsics, width, height):
    x, y, z = points
    r = intrinsics[0, 0, 0]
    f = r * r - (np.square(x) + np.square(z))
    z_larger_x = np.abs(z) > np.abs(x)
    px = np.where(z_larger_x, x, z)
    pz = np.where(z_larger_x, z, x)

    pz_square = np.square(pz)
    with np.errstate(divide="ignore", invalid="ignore"):
        a = 1 + np.square(px) / pz_square
        b = -2 * f * px / pz_square
        c = f + np.square(f) / pz_square
        disc = np.square(b) - 4 * a * c

        s = -order * np.sign(pz) * np.sqrt(disc)
        s = np.where(z_larger_x, s, -s)

        dx = (-b + s) / (2 * a)
        dz = (f - px * dx) / pz
    dx_final = np.where(z_larger_x, -dx, -dz)
    dz_final = np.where(z_larger_x, -dz, -dx)
    dx = dx_final
    dz = dz_final
    dy = y

    theta = -np.arctan2(dz, dx)
    with np.errstate(invalid="ignore"):
        phi = np.arctan2(dy, np.sqrt(np.square(dx) + np.square(dz)))
    nan_mask = np.isnan(phi)
    phi = np.where(nan_mask, np.ones_like(phi), phi)

    pos_phi = np.ones_like(dx) * PI / 2
    neg_phi = np.ones_like(dx) * PI / 2 * -1.0
    phi = np.where(phi <= PI / 2, phi, pos_phi)
    phi = np.where(phi >= -PI / 2, phi, neg_phi)

    u = ((theta + PI - PI / width) / (2 * PI - 2 * PI / width)) * (width - 1)
    v = ((phi + 0.5 * PI - 0.5 * PI / height)
         / (PI - PI / height)) * (height - 1)

    valid_mask = disc >= 0.0
    ones = np.ones_like(u)
    u = np.where(valid_mask, u, ones)
    v = np.where(valid_mask, v, ones)
    return np.stack([u, v], axis=-1).astype(F)


def project_spherical(points, width, height):
    x, y, z = points
    theta = -np.arctan2(z, x)
    phi = np.arctan2(y, np.sqrt(np.square(x) + np.square(z)))
    return theta_phi_to_pixels(theta, phi, width, height)


def project_perspective(points, pose, intrinsics, width, height):
    # spherical.py:248-266: uv = (K4 @ pose @ [x y z 1]).xy / .z
    x, y, z = points
    p = x.shape[0]
    pts = np.stack([x, y, z, np.ones_like(x)], axis=1).reshape(p, 4, -1)
    M = np.matmul(intrinsics, pose)
    out = np.matmul(M, pts)
    uv = out[:, 0:2, :] / out[:, 2:3, :]
    uv = np.transpose(uv, (0, 2, 1))
    return uv.reshape(p, height, width, 2).astype(F)


# ---------------------------------------------------------------------------
# Rays and intersections (spherical.py:70-110, 268-401)
# ---------------------------------------------------------------------------

def transform_ray(r, c, pose):
    rx, ry, rz = r
    cx, cy, cz = c
    shp = rx.shape
    ray = np.stack([rx, ry, rz], axis=0).reshape(3, -1)
    rot_ray = (pose[:3, :3] @ ray).reshape((3,) + shp)
    point = np.stack([cx, cy, cz, np.ones_like(cx)], axis=0).reshape(4, -1)
    rot_point = (pose @ point).reshape((4,) + shp)
    return ((rot_ray[0], rot_ray[1], rot_ray[2]),
            (rot_point[0], rot_point[1], rot_point[2]))


def get_sphere_intersections(r, c, radius):
    rx, ry, rz = r
    cx, cy, cz = c
    a = rx * rx + ry * ry + rz * rz
    b = 2 * (rx * cx + ry * cy + rz * cz)
    cc = cx * cx + cy * cy + cz * cz - radius * radius
    disc = np.square(b) - 4 * a * cc
    t = (-b + np.sqrt(np.maximum(disc, 0.0))) / (2 * a)
    return (cx + t * rx, cy + t * ry, cz + t * rz)


def intersect_sphere(pose, center, radius, width, height):
    p = radius.shape[0]
    S, T = lat_long_grid((height, width))
    S = np.tile(S[None], (p, 1, 1)).astype(F)
    T = np.tile(T[None], (p, 1, 1)).astype(F)
    radius = radius.reshape(p, 1, 1).astype(F)

    cosT = np.cos(T)
    rx = np.cos(S) * cosT
    ry = np.sin(T)
    rz = np.sin(S) * cosT

    # RDF -> RUB center swizzle (spherical.py:286-288)
    cx = np.broadcast_to(np.asarray(center[2], dtype=F), S.shape).copy()
    cy = np.broadcast_to(np.asarray(center[1], dtype=F), S.shape).copy()
    cz = np.broadcast_to(np.asarray(center[0], dtype=F), S.shape).copy()

    (rx, ry, rz), (cx, cy, cz) = transform_ray((rx, ry, rz), (cx, cy, cz),
                                               pose)
    pts = get_sphere_intersections((rx, ry, rz), (cx, cy, cz), radius)
    return project_spherical(pts, width, height)


def intersect_ods(pose, order, intrinsics, radius, width, height):
    p = radius.shape[0]
    S, T = lat_long_grid((height, width))
    S = np.tile(S[None], (p, 1, 1)).astype(F)
    T = np.tile(T[None], (p, 1, 1)).astype(F)
    radius = radius.reshape(p, 1, 1).astype(F)
    baseline = intrinsics[0, 0, 0]

    cosT = np.cos(T)
    rx = np.cos(S) * cosT
    ry = np.sin(T)
    rz = -np.sin(S) * cosT
    cx = -np.sin(S) * baseline * order
    cy = np.zeros_like(S)
    cz = -np.cos(S) * baseline * order

    (rx, ry, rz), (cx, cy, cz) = transform_ray((rx, ry, rz), (cx, cy, cz),
                                               pose)
    pts = get_sphere_intersections((rx, ry, rz), (cx, cy, cz), radius)
    return project_spherical(pts, width, height)


def intersect_perspective(pose, center, radius, width, height,
                          tgt_width, tgt_height):
    p = radius.shape[0]
    S, T = uv_grid((tgt_height, tgt_width))
    S = np.tile(S[None], (p, 1, 1)).astype(F)
    T = np.tile(T[None], (p, 1, 1)).astype(F)
    radius = radius.reshape(p, 1, 1).astype(F)

    # hardcoded window intrinsics (spherical.py:383-387)
    rx = S * 0.1
    ry = T * 0.05
    rz = -np.ones_like(S) * 0.05
    cx = np.broadcast_to(np.asarray(center[0], dtype=F), S.shape).copy()
    cy = np.broadcast_to(np.asarray(center[1], dtype=F), S.shape).copy()
    cz = np.broadcast_to(np.asarray(-center[2], dtype=F), S.shape).copy()

    (rx, ry, rz), (cx, cy, cz) = transform_ray((rx, ry, rz), (cx, cy, cz),
                                               pose)
    pts = get_sphere_intersections((rx, ry, rz), (cx, cy, cz), radius)
    return project_spherical(pts, width, height)


# ---------------------------------------------------------------------------
# Wrap-around bilinear resampling (geometry/sampling.py:135-197)
# ---------------------------------------------------------------------------

def resample(image, pixels):
    """image [B, H, W, C]; pixels [B, Ht, Wt, 2] (x, y) -> [B, Ht, Wt, C]."""
    b, ph, pw, _ = pixels.shape
    _, h, w, c = image.shape
    xy = np.transpose(pixels, (0, 3, 1, 2)).reshape(b, 2, -1)
    x = xy[:, 0].reshape(-1).astype(F)
    y = xy[:, 1].reshape(-1).astype(F)

    x0 = np.floor(x).astype(np.int32)
    x1 = x0 + 1
    y0 = np.floor(y).astype(np.int32)
    y1 = y0 + 1
    diff_x0 = x - x0.astype(F)
    diff_y0 = y - y0.astype(F)
    diff_x1 = x1.astype(F) - x
    diff_y1 = y1.astype(F) - y

    x0 = np.mod(x0 + w, w)
    y0 = np.mod(y0 + h, h)
    x1 = np.mod(x1 + w, w)
    y1 = np.mod(y1 + h, h)

    bb = np.repeat(np.arange(b), ph * pw)
    pa = image[bb, y0, x0]
    pb = image[bb, y0, x1]
    pc = image[bb, y1, x0]
    pd = image[bb, y1, x1]
    res = ((diff_y1 * diff_x1)[:, None] * pa
           + (diff_y1 * diff_x0)[:, None] * pb
           + (diff_y0 * diff_x1)[:, None] * pc
           + (diff_y0 * diff_x0)[:, None] * pd)
    return res.reshape(b, ph, pw, c).astype(F)


# ---------------------------------------------------------------------------
# Sweeps (projector.py:129-223) and renders (projector.py:34-127, 225-265)
# ---------------------------------------------------------------------------

def apply_pose(points, pose_tiled):
    x, y, z = points
    p, h, w = x.shape
    pts = np.stack([x, y, z, np.ones_like(x)], axis=1).reshape(p, 4, -1)
    pts = np.matmul(pose_tiled, pts).reshape(p, 4, h, w)
    return pts[:, 0], pts[:, 1], pts[:, 2]


def ods_sphere_sweep(image, order, depths, pose, intrinsics):
    """image [B, H, W, C] -> [B, H, W, C*P] (projector.py:129-170,209-211)."""
    b, h, w, c = image.shape
    p = depths.shape[0]
    S, T = lat_long_grid((h, w))
    out = []
    for i in range(b):
        # sweep_one pads the intrinsics to 4x4 and tiles per plane
        # (projector.py:143-147); project_ods only reads [0][0][0].
        intr_tiled = np.tile(intrinsics[i][None], (p, 1, 1)).astype(F)
        pose_tiled = np.tile(pose[i][None], (p, 1, 1)).astype(F)
        pts = backproject_spherical(S, T, depths)
        pts = apply_pose(pts, pose_tiled)
        uv = project_ods(pts, order, intr_tiled, w, h)
        img_tiled = np.tile(image[i][None], (p, 1, 1, 1))
        resampled = resample(img_tiled, uv)          # [P, H, W, C]
        resampled = np.transpose(resampled, (1, 2, 0, 3))
        out.append(resampled.reshape(h, w, c * p))
    return np.stack(out).astype(F)


def over_composite(rgbas):
    """rgbas: list of [B, H, W, 4] back-to-front (projector.py:246-265)."""
    output = None
    for i in range(len(rgbas)):
        rgb = rgbas[i][..., 0:3]
        alpha = rgbas[i][..., 3:]
        if i == 0:
            output = rgb
        else:
            output = rgb * alpha + output * (1.0 - alpha)
    return output.astype(F)


def over_composite_depth(rgbas):
    """projector.py:225-244 (value i/len, first layer contributes 0)."""
    output = None
    for i in range(len(rgbas)):
        alpha = np.tile(rgbas[i][..., 3:], (1, 1, 1, 3))
        if i == 0:
            output = np.zeros_like(alpha)
        else:
            output = (i / len(rgbas)) * alpha + output * (1.0 - alpha)
    return output.astype(F)


def render_equirect(rgba_layers, tgt_pose_rt, tgt_pos, radii):
    """[H, W, P, 4] layers -> [H, W, 3] via projective_forward_sphere
    (projector.py:34-62) + over_composite."""
    h, w, p, _ = rgba_layers.shape
    uv = intersect_sphere(tgt_pose_rt, tgt_pos, radii, w, h)
    layers = []
    for i in range(p):
        img = rgba_layers[:, :, i, :][None]
        layers.append(resample(img, uv[i][None]))
    return over_composite(layers)[0]


def render_ods(rgba_layers, order, pose, intrinsics, radii):
    """projective_forward_ods (projector.py:101-127) + over_composite."""
    h, w, p, _ = rgba_layers.shape
    uv = intersect_ods(pose, order, intrinsics, radii, w, h)
    layers = []
    for i in range(p):
        img = rgba_layers[:, :, i, :][None]
        layers.append(resample(img, uv[i][None]))
    return over_composite(layers)[0]


def inv_depths(start_depth, end_depth, num_depths):
    """msi.py:1196-1217 verbatim."""
    inv_start_depth = 1.0 / start_depth
    inv_end_depth = 1.0 / end_depth
    depths = [start_depth, end_depth]
    for i in range(1, num_depths - 1):
        fraction = float(i) / float(num_depths - 1)
        inv_depth = inv_start_depth + (inv_end_depth
                                       - inv_start_depth) * fraction
        depths.append(1.0 / inv_depth)
    depths = sorted(depths)
    return depths[::-1]
