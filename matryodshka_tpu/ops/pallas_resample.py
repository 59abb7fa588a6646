"""Pallas kernel dispatch seam for general bilinear-wrap resampling.

The realized fused kernel lives in ops/pallas_sweep.py: the ODS sweep's
identity-pose warp is row-separable, so it compiles to dynamic row slices
+ barrel-composed lane rotates (zero gathers, ~5x the XLA gather path).

The GENERAL warp (arbitrary per-pixel coordinates — the novel-view render
path) currently stays on the XLA quad-packed gather in ops/resample.py,
which runs at the measured gather floor (~2.7 ns per gathered row on
v5e). A general fused kernel is blocked on this Mosaic version's missing
in-kernel gather primitives (jnp.take_along_axis fails to lower on either
axis; dynamic lane slices require provably 128-aligned starts); the
round-2 plan (STATUS.md) is a barrel-shift + residual select-ladder
kernel bounded by the render's parallax magnitude.

`resample_stack_pallas` returns None so callers fall back — the seam
stays so call sites don't change when the kernel lands.
"""

from __future__ import annotations

from typing import Optional

import jax

Array = jax.Array


def resample_stack_pallas(image: Array, coords: Array) -> Optional[Array]:
    """General fused resample; None = unavailable (use the XLA path)."""
    return None
