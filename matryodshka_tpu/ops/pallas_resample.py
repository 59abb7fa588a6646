"""Pallas fused bilinear-wrap resampling (stub dispatch for now).

The hot op of the whole pipeline is "gather one [H, W, C] image at a
[P, H, W, 2] fractional coordinate stack with wrap-around" — it runs twice
per sweep (2 eyes x 32 planes) and once per rendered view (32 shells).

Plan (see pallas guide): keep the source image resident in VMEM
(640*320*4 * f32 = 3.3 MB, fits), stream coordinate tiles through a grid
over (plane, row-tile), and do the 4-tap gather + blend entirely on-chip so
HBM sees each source pixel once instead of 4*P times.

Dynamic per-element gathers inside Pallas TPU kernels need care; until the
fused kernel lands, `resample_stack_pallas` returns None and callers fall
back to the XLA gather path in ops/resample.py (which XLA already fuses
reasonably). This module is the seam where the kernel drops in without
touching any call sites.
"""

from __future__ import annotations

from typing import Optional

import jax

Array = jax.Array


def resample_stack_pallas(image: Array, coords: Array) -> Optional[Array]:
    """Fused resample; returns None when unavailable (caller falls back)."""
    return None
