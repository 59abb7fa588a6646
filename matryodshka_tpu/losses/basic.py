"""Pixel loss and spherical attention weighting.

Parity notes:
  * The reference's "pixel" loss is tf.reduce_mean(tf.nn.l2_loss(p - y))
    (msi.py:662) — and tf.nn.l2_loss is sum(t^2)/2, a scalar, so the
    reduce_mean is a no-op: the loss is HALF THE SUM of squared errors,
    not a mean. Reproduced exactly (training dynamics depend on it).
  * Spherical weights (msi.py:1132-1143): per-pixel solid-angle-ish factor
    1/|cos(phi) - cos(phi + delta)| * |dtheta| from two shifted lat/long
    grids.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array
PI = math.pi


def l2_loss(pred: Array, target: Array, weights: Array | None = None
            ) -> Array:
    """0.5 * sum((pred - target)^2), optionally with per-pixel weights
    multiplied into BOTH images first (msi.py:656-662)."""
    if weights is not None:
        pred = pred * weights
        target = target * weights
    diff = pred - target
    return 0.5 * jnp.sum(jnp.square(diff))


def spherical_weights(height: int, width: int, epsilon: float = 1e-12
                      ) -> Array:
    """[H, W] latitude weighting map (msi.py:1132-1143)."""
    theta = jnp.linspace(-PI + epsilon, PI + epsilon, width)
    phi = jnp.linspace(-PI / 2 + epsilon, PI / 2 + epsilon, height)
    delta = PI / height
    theta_s = jnp.linspace(-PI + delta, PI + delta, width)
    phi_s = jnp.linspace(-PI / 2 + delta / 2, PI / 2 + delta / 2, height)

    TH, PH = jnp.meshgrid(theta, phi)
    TH_s, PH_s = jnp.meshgrid(theta_s, phi_s)
    return (1.0 / jnp.abs(jnp.cos(PH) - jnp.cos(PH_s))
            * jnp.abs(TH_s - TH))


def psnr(pred: Array, target: Array, max_val: float = 1.0) -> Array:
    mse = jnp.mean(jnp.square(pred - target))
    return 10.0 * jnp.log10(max_val ** 2 / mse)
