"""E-LPIPS random input-transformation ensemble.

JAX port of the sampling and application logic of
elpips/elpips/elpips.py:59-238 with explicit PRNG keys:

  * offset: random translate-by-pad (reflect) up to offset_max, per sample
  * scale: random downscale by box-averaging after reflect-padding to a
    multiple of the scale level (level sampled from a 1/i^2 prior)
  * flips / transpose: per-sample flip among {x, y, xy, none}; global swap
  * color permutation (per-sample) and color multiplication (LHS when
    batch > 1)

JAX has no dynamic shapes under jit, so the dynamic scale level is
handled by the caller via lax.switch over the discrete levels (see
api.Metric), each branch using this module's fixed-level `downscale`.
"""

from __future__ import annotations

import itertools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class EnsembleParams(NamedTuple):
    offset_xy: Array          # [N, 2] int32 in [0, offset_max]
    flips: Array              # [N] int32 in {0,1,2,3}
    swap_xy: Array            # [] int32 in {0,1}
    color_factors: Array      # [N, 1, 1, 3]
    permutations: Array       # [N, 3] int32 color permutation per sample
    scale_offset_xy: Array    # [2] int32 in [0, scale_level)
    scale_level: Array        # [] int32 in [1, num_scales]


def sample_ensemble(key: Array, batch_size: int, offset_max: int,
                    scale_probabilities: Tuple[float, ...],
                    static_scale: int | None = None) -> EnsembleParams:
    """Sample one random transform set (elpips.py:59-118).

    Uses the same LHS-style stratified sampling for flips/colors.

    static_scale: when given, the scale level is this HOST-drawn python
    int instead of an in-graph draw (the caller then evaluates the
    single matching branch instead of a lax.switch over all levels —
    see api.Metric.forward(static_scale_swap=...)). Sub-key usage is
    identical, so with static_scale equal to the level the in-graph
    path would have drawn, every other transform draw matches exactly.
    """
    n = batch_size
    keys = jax.random.split(key, 8)

    offset_xy = jax.random.randint(keys[0], (n, 2), 0, offset_max + 1)

    if static_scale is None:
        cumsum = np.cumsum(np.asarray(scale_probabilities))
        u = cumsum[-1] * jax.random.uniform(keys[1], ())
        # first index where u < cumsum[i] -> level i+1
        level = 1 + jnp.sum(
            (u >= jnp.asarray(cumsum[:-1])).astype(jnp.int32))
        scale_level = jnp.clip(level, 1, len(scale_probabilities))
    else:
        scale_level = jnp.asarray(int(static_scale), jnp.int32)

    scale_offset_xy = jax.random.randint(keys[2], (2,), 0,
                                         jnp.maximum(scale_level, 1))

    flips = jnp.mod(jnp.arange((n + 3) // 4 * 4, dtype=jnp.int32), 4)
    flips = jax.random.permutation(keys[3], flips)[:n]

    swap_xy = jax.random.randint(keys[4], (), 0, 2)

    def sample_colors(k):
        color = jax.random.uniform(k, (n,))
        color = (color + jnp.arange(n, dtype=jnp.float32)) / n
        return jax.random.permutation(jax.random.fold_in(k, 1), color)

    ck = jax.random.split(keys[5], 3)
    colors = jnp.stack([sample_colors(ck[i]) for i in range(3)], axis=-1)
    color_factors = (0.2 + 0.8 * colors).reshape(n, 1, 1, 3)

    perms = np.asarray(list(itertools.permutations(range(3))),
                       dtype=np.int32)
    repeat = (n + len(perms) - 1) // len(perms)
    perms = jnp.tile(jnp.asarray(perms), (repeat, 1))
    perms = jax.random.permutation(keys[6], perms)[:n]

    return EnsembleParams(offset_xy, flips, swap_xy, color_factors,
                          perms, scale_offset_xy, scale_level)


def downscale(X: Array, scale: int, scale_offset_xy: Array) -> Array:
    """Reflect-pad to a multiple of `scale` (random phase) then box-average
    (elpips.py:132-171, pad branch). `scale` is a static int."""
    if scale == 1:
        return X
    n, h, w, c = X.shape
    full_w = (scale - 1 + w + scale - 1) // scale * scale
    full_h = (scale - 1 + h + scale - 1) // scale * scale
    # dynamic pad phase with static total size: pad maximally, then
    # dynamic-slice the window
    Xp = jnp.pad(X, ((0, 0), (scale - 1, scale - 1),
                     (scale - 1, scale - 1), (0, 0)), mode="reflect")
    pad_bottom = scale - 1 - scale_offset_xy[0]
    pad_left = scale - 1 - scale_offset_xy[1]
    Xw = jax.lax.dynamic_slice(
        Xp, (0, pad_bottom, pad_left, 0), (n, full_h, full_w, c))
    Xw = Xw.reshape(n, full_h // scale, scale, full_w // scale, scale, c)
    return jnp.mean(Xw, axis=(2, 4))


def apply_offset(X: Array, offset_xy: Array, offset_max: int) -> Array:
    """Per-sample reflect-pad translation (elpips.py:174-197).

    Output is [N, H + offset_max, W + offset_max, C]."""
    n, h, w, c = X.shape

    def one(x, off):
        xp = jnp.pad(x, ((offset_max, offset_max),
                         (offset_max, offset_max), (0, 0)),
                     mode="reflect")
        # pads: bottom=offset_max - off0, top=off0, left=offset_max-off1,
        # right=off1 -> window of size (h+offset_max, w+offset_max)
        start0 = offset_max - (offset_max - off[0])  # = off[0]
        start1 = off[1]
        return jax.lax.dynamic_slice(
            xp, (start0, start1, 0),
            (h + offset_max, w + offset_max, c))

    return jax.vmap(one)(X, offset_xy)


def apply_flips_swap_color(X: Array, params: EnsembleParams,
                           swap: bool) -> Array:
    """Flips, transpose, color permutation, color multiplication
    (elpips.py:199-238). `swap` is STATIC: a transpose changes the array
    shape, so the caller selects it via a branch (see api.Metric)."""
    flips = params.flips
    fx = X[:, :, ::-1, :]
    fy = X[:, ::-1, :, :]
    fxy = X[:, ::-1, ::-1, :]
    f = flips.reshape(-1, 1, 1, 1)
    X = jnp.where(f == 0, fx, jnp.where(f == 1, fy,
                                        jnp.where(f == 2, fxy, X)))

    if swap:
        X = jnp.transpose(X, (0, 2, 1, 3))

    # color permutation: X[..., c] <- X[..., perm[c]]
    def permute(x, perm):
        return x[..., perm]
    X = jax.vmap(permute)(X, params.permutations)

    X = X * params.color_factors
    return X


def apply_ensemble(X: Array, params: EnsembleParams, scale: int,
                   offset_max: int, enable_offset: bool = True,
                   enable_scale: bool = True,
                   swap: bool = False) -> Array:
    """Apply the full sampled ensemble at STATIC (scale, swap)."""
    if enable_scale:
        X = downscale(X, scale, params.scale_offset_xy)
    if enable_offset:
        X = apply_offset(X, params.offset_xy, offset_max)
    return apply_flips_swap_color(X, params, swap)
