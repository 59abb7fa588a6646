"""Equirectangular / UV pixel grids and angle<->pixel conversions.

Math parity targets (formulas, not code) in the reference:
  * lat_long_grid           — geometry/spherical.py:42-44
  * uv_grid                 — geometry/spherical.py:46-48
  * theta_y_grid            — geometry/spherical.py:50-52
  * theta_phi_to_pixels     — geometry/spherical.py:54-68

Pixel convention: ERP pixel centers are offset by half a pixel from the
domain edges, i.e. longitude samples live at
  S_j = -pi + pi/W + j * (2*pi - 2*pi/W) / (W-1),  j = 0..W-1
and latitude samples at
  T_i = -pi/2 + pi/(2H) + i * (pi - pi/H) / (H-1), i = 0..H-1.
These exact constants are load-bearing for parity with the reference and for
the wrap-around bilinear sampling in ops/resample.py.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

PI = math.pi


def lat_long_grid(shape: Tuple[int, int], dtype=jnp.float32):
    """Longitude/latitude grid for an (H, W) ERP image.

    Returns:
      S: [H, W] longitudes in (-pi, pi), varying along axis 1.
      T: [H, W] latitudes in (-pi/2, pi/2), varying along axis 0.
    """
    h, w = shape
    s = jnp.linspace(-PI + PI / w, PI - PI / w, w, dtype=dtype)
    t = jnp.linspace(-PI / 2 + PI / (2 * h), PI / 2 - PI / (2 * h), h,
                     dtype=dtype)
    S, T = jnp.meshgrid(s, t)  # xy indexing: S,T are [H, W]
    return S, T


def uv_grid(shape: Tuple[int, int], dtype=jnp.float32):
    """Normalized (-1, 1) UV grid with half-pixel offsets for (H, W)."""
    h, w = shape
    u = jnp.linspace(-1.0 + 1.0 / w, 1.0 - 1.0 / w, w, dtype=dtype)
    v = jnp.linspace(-1.0 + 1.0 / h, 1.0 - 1.0 / h, h, dtype=dtype)
    U, V = jnp.meshgrid(u, v)
    return U, V


def theta_y_grid(shape: Tuple[int, int], dtype=jnp.float32):
    """Cylindrical grid: theta in [-pi, pi], y in [-1, 1] (no half-pixel)."""
    h, w = shape
    th = jnp.linspace(-PI, PI, w, dtype=dtype)
    y = jnp.linspace(-1.0, 1.0, h, dtype=dtype)
    TH, Y = jnp.meshgrid(th, y)
    return TH, Y


def theta_phi_to_pixels(theta, phi, width: int, height: int):
    """Map spherical angles to fractional ERP pixel coordinates.

    theta in [-pi, pi] maps (after the half-pixel shift) to u in [0, W-1];
    phi in [-pi/2, pi/2] maps to v in [0, H-1].
    Returns uv stacked on the last axis: [..., 2].
    """
    u, v = theta_phi_to_pixels_uv(theta, phi, width, height)
    return jnp.stack([u, v], axis=-1)


def theta_phi_to_pixels_uv(theta, phi, width: int, height: int):
    """Channel-first form of theta_phi_to_pixels: returns (u, v)."""
    u = (theta + PI - PI / width) / (2 * PI - 2 * PI / width) * (width - 1)
    v = ((phi + 0.5 * PI - 0.5 * PI / height)
         / (PI - PI / height) * (height - 1))
    return u, v


def spherical_ray_dirs(S, T):
    """Unit ray directions for ERP angles: the RUB-frame parameterization

        r = (cos S * cos T, sin T, sin S * cos T)

    used by both backprojection and target-ray generation
    (geometry/spherical.py:124-128, 278-282).
    """
    cosT = jnp.cos(T)
    rx = jnp.cos(S) * cosT
    ry = jnp.sin(T)
    rz = jnp.sin(S) * cosT
    return rx, ry, rz
