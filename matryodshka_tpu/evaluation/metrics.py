"""Image quality metrics: SSIM, PSNR, temporal-consistency diffs.

Covers the reference eval surface (eval.py:127-145: tf.image.ssim,
tf.image.psnr, elpips; :147-188 frame-to-frame blurred diffs).

SSIM matches tf.image.ssim's construction: 11x11 Gaussian window with
sigma=1.5, k1=0.01, k2=0.03, per-channel then averaged.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * jnp.square(x / sigma))
    g = g / jnp.sum(g)
    return g


def _filter2d_separable(img: Array, k: Array) -> Array:
    """Valid-mode separable filtering of [H, W, C] with 1-D kernel k."""
    x = jnp.moveaxis(img, -1, 0)[:, None]  # [C, 1, H, W] (channels=batch)
    kh = k.reshape(1, 1, -1, 1)
    kv = k.reshape(1, 1, 1, -1)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID")
    x = jax.lax.conv_general_dilated(x, kv, (1, 1), "VALID")
    return jnp.moveaxis(x[:, 0], 0, -1)


@partial(jax.jit, static_argnames=("max_val",))
def ssim(img1: Array, img2: Array, max_val: float = 1.0) -> Array:
    """SSIM of two [H, W, C] images in [0, max_val]."""
    k = _gaussian_kernel()
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)

    mu1 = _filter2d_separable(img1, k)
    mu2 = _filter2d_separable(img2, k)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d_separable(img1 * img1, k) - mu1_sq
    sigma2_sq = _filter2d_separable(img2 * img2, k) - mu2_sq
    sigma12 = _filter2d_separable(img1 * img2, k) - mu12

    lum = (2 * mu12 + c1) / (mu1_sq + mu2_sq + c1)
    cs = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    return jnp.mean(lum * cs)


@partial(jax.jit, static_argnames=("max_val",))
def psnr(img1: Array, img2: Array, max_val: float = 1.0) -> Array:
    mse = jnp.mean(jnp.square(img1.astype(jnp.float32)
                              - img2.astype(jnp.float32)))
    return 10.0 * jnp.log10(max_val ** 2 / mse)


def remove_pole(img: np.ndarray) -> np.ndarray:
    """Crop the top and bottom quarters (eval.py:55-60)."""
    h = img.shape[0]
    return img[h // 4: h - h // 4]


def gaussian_blur(img: Array, size: int = 11, sigma: float = 1.5) -> Array:
    """Same-size Gaussian blur (edge-padded) for temporal diffs."""
    k = _gaussian_kernel(size, sigma)
    pad = size // 2
    x = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    return _filter2d_separable(x, k)


def temporal_diff(frame_a: Array, frame_b: Array) -> Array:
    """Mean |blur(a) - blur(b)| — the video consistency statistic
    (eval.py:147-188)."""
    return jnp.mean(jnp.abs(gaussian_blur(frame_a) - gaussian_blur(frame_b)))
