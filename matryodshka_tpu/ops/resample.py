"""Bilinear resampling with horizontal/vertical wrap-around.

The reference implements this with tf.gather_nd over stacked index tensors
(geometry/sampling.py:135-197); the wrap (`tf.mod` on both axes,
sampling.py:162-165) is load-bearing for 360-degree ERP continuity.

Here it is a single flattened XLA gather: image [H, W, C] is viewed as
[H*W, C] and the four bilinear taps become four `jnp.take(axis=0)` calls,
which XLA lowers to one fused dynamic-gather each on TPU. Weighting happens
in fp32 for precision regardless of the storage dtype.

The Pallas fused render (warp + composite without gathers) lives in
ops/pallas_render.py and is dispatched at the render layer
(geometry/render.py); the Pallas fused sweeps live in ops/pallas_sweep.py.
This module remains the exact gather-path reference and the general-pose
fallback.

There is also `bilinear_zero_resample` reproducing tf.contrib.resampler's
zero-outside-boundary semantics (sampling.py:32-54), used by the legacy
homography/MPI path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _gather_hw(flat_img: Array, yi: Array, xi: Array, width: int) -> Array:
    """Gather pixels from a [H*W, C] image at integer (y, x): -> [..., C]."""
    idx = yi * width + xi
    return jnp.take(flat_img, idx, axis=0)


# ---------------------------------------------------------------------------
# Quad-packed fast path.
#
# On TPU, XLA lowers this gather to one row-copy per index: the cost is
# ~2.7 ns per gathered ROW regardless of row width (measured on v5e), so
# four separate taps cost 4x one tap. Packing the 2x2 bilinear footprint
# of every source pixel into ONE wide row ([H*W, 4*C], built with four
# cheap circular rolls) turns bilinear sampling into a single gather +
# vector blend — numerically identical to the four-tap formulation
# (same taps, same weights), ~4x faster.
# ---------------------------------------------------------------------------

def pack_quad(image: Array) -> Array:
    """[H, W, C] -> [H*W, 4C]: each row holds the 2x2 wrap-around
    neighborhood (self, right, down, down-right) of one pixel."""
    h, w, c = image.shape
    right = jnp.roll(image, -1, axis=1)
    down = jnp.roll(image, -1, axis=0)
    diag = jnp.roll(right, -1, axis=0)
    return jnp.concatenate([image, right, down, diag],
                           axis=-1).reshape(h * w, 4 * c)


def _blend_quad(quad: Array, fx: Array, fy: Array, c: int) -> Array:
    """Blend a gathered [..., 4C] quad with bilinear weights."""
    wa = ((1.0 - fy) * (1.0 - fx))[..., None]
    wb = ((1.0 - fy) * fx)[..., None]
    wc = (fy * (1.0 - fx))[..., None]
    wd = (fy * fx)[..., None]
    return (wa * quad[..., 0:c] + wb * quad[..., c:2 * c]
            + wc * quad[..., 2 * c:3 * c] + wd * quad[..., 3 * c:4 * c])


def _floor_frac(coords: Array, h: int, w: int):
    return _floor_frac_uv(coords[..., 0], coords[..., 1], h, w)


def _floor_frac_uv(x: Array, y: Array, h: int, w: int):
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    x0 = jnp.mod(x0f.astype(jnp.int32), w)
    y0 = jnp.mod(y0f.astype(jnp.int32), h)
    return x0, y0, fx, fy


def bilinear_wrap_resample_packed(packed: Array, h: int, w: int, c: int,
                                  coords: Array) -> Array:
    """Sample from a pack_quad()'d image: one gather, identical math."""
    x0, y0, fx, fy = _floor_frac(coords, h, w)
    quad = jnp.take(packed.astype(jnp.float32), y0 * w + x0, axis=0)
    return _blend_quad(quad, fx, fy, c)


def resample_layers(layers: Array, coords: Array) -> Array:
    """Sample layer p at its own coordinate field: [P, H, W, C] +
    [P, ..., 2] -> [P, ..., C].

    Performance shape (measured on v5e): XLA's gather runs on a fast
    row-copy path only when the table operand is small enough to live
    on-chip; one big [P*H*W, 4C] table is ~7x slower than P separate
    [H*W, 4C] gathers, and a vmapped gather is ~2x slower than the same
    gathers unrolled. Hence: statically unrolled per-plane quad-packed
    single-tap gathers.
    """
    p, h, w, c = layers.shape
    x0, y0, fx, fy = _floor_frac(coords, h, w)
    return _resample_layers_idx(layers, x0, y0, fx, fy)


def resample_layers_uv(layers: Array, u: Array, v: Array) -> Array:
    """Channel-first twin of resample_layers: u, v each [P, ...]."""
    p, h, w, c = layers.shape
    x0, y0, fx, fy = _floor_frac_uv(u, v, h, w)
    return _resample_layers_idx(layers, x0, y0, fx, fy)


def _resample_layers_idx(layers: Array, x0, y0, fx, fy) -> Array:
    p, h, w, c = layers.shape
    idx = y0 * w + x0
    outs = []
    for i in range(p):
        # Pack and gather in the SOURCE dtype (half the table-build and
        # gather bytes for bf16 layers); converting the gathered quad is
        # numerically identical to converting the whole table.
        packed = pack_quad(layers[i])
        quad = jnp.take(packed, idx[i], axis=0).astype(jnp.float32)
        outs.append(_blend_quad(quad, fx[i], fy[i], c))
    return jnp.stack(outs)


def bilinear_wrap_resample(image: Array, coords: Array) -> Array:
    """Bilinear sample with wrap-around on both axes.

    Args:
      image: [H, W, C] source.
      coords: [..., 2] fractional (x, y) pixel coordinates.
    Returns:
      [..., C] sampled values (float32).
    """
    h, w, c = image.shape
    x = coords[..., 0].astype(jnp.float32)
    y = coords[..., 1].astype(jnp.float32)

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f

    x0 = jnp.mod(x0f.astype(jnp.int32), w)
    x1 = jnp.mod(x0 + 1, w)
    y0 = jnp.mod(y0f.astype(jnp.int32), h)
    y1 = jnp.mod(y0 + 1, h)

    flat = image.reshape(h * w, c).astype(jnp.float32)
    Ia = _gather_hw(flat, y0, x0, w)
    Ib = _gather_hw(flat, y0, x1, w)
    Ic = _gather_hw(flat, y1, x0, w)
    Id = _gather_hw(flat, y1, x1, w)

    wa = ((1.0 - fy) * (1.0 - fx))[..., None]
    wb = ((1.0 - fy) * fx)[..., None]
    wc = (fy * (1.0 - fx))[..., None]
    wd = (fy * fx)[..., None]
    return wa * Ia + wb * Ib + wc * Ic + wd * Id


def bilinear_zero_resample(image: Array, coords: Array) -> Array:
    """Bilinear sample; taps outside the image contribute zero.

    Matches tf.contrib.resampler.resampler semantics (used by the
    stereo-magnification homography path, geometry/sampling.py:32-54):
    each of the four corner taps is included only if it lies inside
    [0, W-1] x [0, H-1].
    """
    h, w, c = image.shape
    x = coords[..., 0].astype(jnp.float32)
    y = coords[..., 1].astype(jnp.float32)

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    def valid(yi, xi):
        return ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))

    flat = image.reshape(h * w, c).astype(jnp.float32)

    def tap(yi, xi, wgt):
        m = valid(yi, xi)
        yi = jnp.clip(yi, 0, h - 1)
        xi = jnp.clip(xi, 0, w - 1)
        vals = _gather_hw(flat, yi, xi, w)
        return (wgt * m.astype(jnp.float32))[..., None] * vals

    out = (tap(y0, x0, (1 - fy) * (1 - fx))
           + tap(y0, x1, (1 - fy) * fx)
           + tap(y1, x0, fy * (1 - fx))
           + tap(y1, x1, fy * fx))
    return out


def resample_stack(image: Array, coords: Array, wrap: bool = True,
                   use_pallas: bool = False) -> Array:
    """Sample one image at a [P, H, W, 2] coordinate stack -> [P, H, W, C].

    One source image gathered at num_planes coordinate fields, via the
    quad-packed single-gather path (exact). Fused-kernel dispatch happens
    a level up (render/sweep modules); `use_pallas` is accepted for call
    compatibility.
    """
    del use_pallas
    if wrap:
        h, w, c = image.shape
        return bilinear_wrap_resample_packed(pack_quad(image), h, w, c,
                                             coords)
    return bilinear_zero_resample(image, coords)
