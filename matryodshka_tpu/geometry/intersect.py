"""Ray / MSI-shell intersections for novel-view rendering.

For every target-view pixel and every MSI shell radius, find where the
pixel's ray (possibly transformed by a pose) pierces the shell, and convert
the intersection point to fractional ERP pixel coordinates for resampling.

Math parity targets in the reference:
  * transform_ray          — geometry/spherical.py:70-93
  * get_sphere_intersections — geometry/spherical.py:95-110
  * intersect_sphere       — geometry/spherical.py:268-326
    (incl. the RDF->RUB center swizzle at :286-288: cx=center[2],
     cy=center[1], cz=center[0])
  * intersect_ods          — geometry/spherical.py:328-365
    (ray origins on the ODS viewing circle: cx=-sinS*b*order,
     cz=-cosS*b*order)
  * intersect_perspective  — geometry/spherical.py:367-401
    (hardcoded crop intrinsics rx=S*0.1, ry=T*0.05, rz=-0.05)

All functions return uv coord stacks [P, Ht, Wt, 2] for a single example;
batch via jax.vmap at the call site.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from matryodshka_tpu.geometry.grids import lat_long_grid, uv_grid
from matryodshka_tpu.geometry.cameras import (apply_pose, project_spherical,
                                              rotate_dirs)

Array = jax.Array


def sphere_intersections(rays, centers, radius):
    """Intersect rays (dir r, origin c) with origin-centered spheres.

    radius broadcasts against the ray arrays (e.g. [P, 1, 1] vs [P, H, W]).
    Takes the + root, which is the forward intersection for origins inside
    the sphere. Returns intersection points (x, y, z).
    """
    rx, ry, rz = rays
    cx, cy, cz = centers
    a = rx * rx + ry * ry + rz * rz
    b = 2.0 * (rx * cx + ry * cy + rz * cz)
    c = cx * cx + cy * cy + cz * cz - radius * radius
    disc = jnp.square(b) - 4.0 * a * c
    t = (-b + jnp.sqrt(jnp.maximum(disc, 0.0))) / (2.0 * a)
    return cx + t * rx, cy + t * ry, cz + t * rz


def intersect_sphere(pose: Array, center: Array, radii: Array,
                     width: int, height: int):
    """ERP target view -> per-shell lookup coords into the MSI.

    Args:
      pose: [4, 4] target pose ([R, t]).
      center: [3] (or [3, 1]) target center of projection. NOTE: the
        translation components are swizzled (z, y, x) to convert from the
        capture rig's RDF frame into the MSI's RUB frame, matching
        geometry/spherical.py:286-288 & the comment at :300-303.
      radii: [P] shell radii.
    Returns:
      uv: [P, height, width, 2].
    """
    center = jnp.reshape(center, (-1,))
    S, T = lat_long_grid((height, width))
    cosT = jnp.cos(T)
    rx = jnp.cos(S) * cosT
    ry = jnp.sin(T)
    rz = jnp.sin(S) * cosT

    # Rotate ray dirs; fully transform the (swizzled) center point.
    rx, ry, rz = rotate_dirs((rx, ry, rz), pose)
    cx, cy, cz = apply_pose((center[2], center[1], center[0]), pose)

    radii = radii[:, None, None]
    pts = sphere_intersections(
        (rx[None], ry[None], rz[None]),
        (jnp.broadcast_to(cx, (1, height, width)),
         jnp.broadcast_to(cy, (1, height, width)),
         jnp.broadcast_to(cz, (1, height, width))),
        radii)
    return project_spherical(pts, 1, None, None, width, height)


def intersect_sphere_uv(pose: Array, center: Array, radii: Array,
                        width: int, height: int):
    """Channel-first twin of intersect_sphere: returns (u, v) each
    [P, height, width]. Same math; skips the channel-minor [..., 2]
    stack whose 2-wide lane tiling forces layout shuffles in the hot
    render path (the ladder kernel wants [P, 2, H, W])."""
    from matryodshka_tpu.geometry.grids import theta_phi_to_pixels_uv
    center = jnp.reshape(center, (-1,))
    S, T = lat_long_grid((height, width))
    cosT = jnp.cos(T)
    rx = jnp.cos(S) * cosT
    ry = jnp.sin(T)
    rz = jnp.sin(S) * cosT
    rx, ry, rz = rotate_dirs((rx, ry, rz), pose)
    cx, cy, cz = apply_pose((center[2], center[1], center[0]), pose)
    radii = radii[:, None, None]
    x, y, z = sphere_intersections(
        (rx[None], ry[None], rz[None]),
        (jnp.broadcast_to(cx, (1, height, width)),
         jnp.broadcast_to(cy, (1, height, width)),
         jnp.broadcast_to(cz, (1, height, width))),
        radii)
    theta = -jnp.arctan2(z, x)
    phi = jnp.arctan2(y, jnp.sqrt(jnp.square(x) + jnp.square(z)))
    return theta_phi_to_pixels_uv(theta, phi, width, height)


def intersect_ods(pose: Array, center: Array, order: int, intrinsics: Array,
                  radii: Array, width: int, height: int):
    """Re-render an ODS eye: rays originate on the viewing circle.

    order: +1 left eye / -1 right eye; intrinsics[0,0] = circle radius.
    Returns uv [P, height, width, 2].
    """
    S, T = lat_long_grid((height, width))
    baseline = intrinsics[0, 0]
    cosT = jnp.cos(T)
    rx = jnp.cos(S) * cosT
    ry = jnp.sin(T)
    rz = -jnp.sin(S) * cosT

    cx = -jnp.sin(S) * baseline * order
    cy = jnp.zeros_like(S)
    cz = -jnp.cos(S) * baseline * order

    rx, ry, rz = rotate_dirs((rx, ry, rz), pose)
    cx, cy, cz = apply_pose((cx, cy, cz), pose)

    radii = radii[:, None, None]
    pts = sphere_intersections((rx[None], ry[None], rz[None]),
                               (cx[None], cy[None], cz[None]), radii)
    return project_spherical(pts, order, None, intrinsics, width, height)


def intersect_perspective(pose: Array, center: Array, radii: Array,
                          width: int, height: int,
                          tgt_width: int, tgt_height: int,
                          intrinsics: Array | None = None):
    """Perspective crop of the MSI: a small pinhole window.

    The window intrinsics are the reference's hardcoded constants
    (spherical.py:383-387): ray = (u*0.1, v*0.05, -0.05) over a +-1 UV grid,
    i.e. a ~90 degree horizontal FOV. `pose` rotates the window (the
    viewing_window*90deg yaw is applied by the caller).
    center is swizzled (x, y, -z) per spherical.py:390-392.
    Returns uv [P, tgt_height, tgt_width, 2] indexing the (height,width) ERP.
    """
    center = jnp.reshape(center, (-1,))
    S, T = uv_grid((tgt_height, tgt_width))
    rx = S * 0.1
    ry = T * 0.05
    rz = -jnp.ones_like(S) * 0.05

    cx, cy, cz = center[0], center[1], -center[2]
    rx, ry, rz = rotate_dirs((rx, ry, rz), pose)
    cx, cy, cz = apply_pose((cx, cy, cz), pose)

    radii = radii[:, None, None]
    pts = sphere_intersections(
        (rx[None], ry[None], rz[None]),
        (jnp.broadcast_to(cx, (1, tgt_height, tgt_width)),
         jnp.broadcast_to(cy, (1, tgt_height, tgt_width)),
         jnp.broadcast_to(cz, (1, tgt_height, tgt_width))),
        radii)
    return project_spherical(pts, 1, None, None, width, height)
