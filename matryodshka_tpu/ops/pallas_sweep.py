"""Pallas fused ODS sphere sweep for identity pose (the hot inference path).

Structure exploited (verified numerically, see tests/test_pallas_sweep.py):
with an identity sweep pose, the ODS projection's lookup field over an ERP
grid is row-separable —

  v(p, i, j) = v(p, i)                   (constant per plane-row)
  u(p, i, j) = u0(p, i) - j              (unit-slope ramp, wraps mod W)
  valid(p, i) = depth_p * cos(T_i) >= r  (the disc >= 0 condition)

because the tangent-ray construction is rotationally symmetric about the
y axis. So instead of 6.5M arbitrary gathers, each output row is:

  1. two dynamic ROW slices of the source image (vertical bilinear taps),
  2. one dynamic LANE slice from the doubled horizontally-flipped row
     (the fractional circular shift), plus a static roll-by-1 for the
     second horizontal tap,
  3. a four-weight blend — all pure vector ops in VMEM.

Per-row parameters (u0, v) are computed with the exact reference
projection formulas (cameras.project_ods) evaluated at a single column,
so results match the general gather path up to that path's own float32
noise near the poles.

Falls back to None (callers use the XLA gather path) off-TPU or when the
pose is not statically known to be identity.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from matryodshka_tpu.geometry import cameras, grids

Array = jax.Array


def _row_params(order: int, depths: Array, intrinsics: Array,
                height: int, width: int):
    """Per-(plane, row) sweep parameters via the reference projection.

    Returns dict of [P, H] arrays: y0, y1 (int32 vertical taps), fy,
    shift (int32 lane-slice start), fx, valid (int32), and the park
    value coordinates for invalid rows (the reference parks uv at (1,1)).
    """
    p = depths.shape[0]
    S, T = grids.lat_long_grid((height, width))
    # evaluate the exact projection at column 0 only: [P, H, 1]
    S0 = S[:, :1]
    T0 = T[:, :1]
    pts = cameras.backproject_spherical(S0, T0, depths)
    uv = cameras.project_ods(pts, order, None, intrinsics, width, height)
    u0 = uv[..., 0, 0]                      # [P, H]
    v = uv[..., 0, 1]                       # [P, H]

    # validity: tangent exists iff the point's XZ radius >= circle radius
    r = intrinsics[0, 0]
    rho = depths[:, None] * jnp.cos(T0[None, :, 0])
    valid = rho >= r

    y0f = jnp.floor(v)
    fy = v - y0f
    y0 = jnp.mod(y0f.astype(jnp.int32), height)
    y1 = jnp.mod(y0 + 1, height)

    i0f = jnp.floor(u0)
    fx = u0 - i0f
    i0 = jnp.mod(i0f.astype(jnp.int32), width)
    # out_a[j] = rowA[(i0 - j) mod W] = flipped_row[(j + W-1-i0) mod W]
    shift = jnp.mod(width - 1 - i0, width)
    return {"y0": y0, "y1": y1, "fy": fy.astype(jnp.float32),
            "shift": shift, "fx": fx.astype(jnp.float32),
            "valid": valid.astype(jnp.int32)}


def _circ_shift_left(x, s, width: int, nbits: int | None = None):
    """out[..., j] = x[..., (j + s) mod width] for a traced scalar s.

    Mosaic only allows lane-dim dynamic slices at 128-aligned starts, so
    arbitrary circular shifts are composed as a barrel shifter: one
    conditional static lane-rotate per bit of s. Pass nbits when s is
    known bounded (< 2^nbits).
    """
    if nbits is None:
        nbits = max(1, (width - 1).bit_length())
    for b in range(nbits):
        amt = 1 << b
        bit = ((s >> b) & 1) > 0
        # jnp.roll(x, width - amt)[j] = x[(j + amt) mod width]
        rolled = pltpu.roll(x, (width - amt) % width, axis=x.ndim - 1)
        x = jnp.where(bit, rolled, x)
    return x


def _circ_shift_left_rows(x, s_vec, width: int):
    """Per-row circular left shift of a row BLOCK.

    x: [C, R, W]; s_vec: [1, R, 1] int32 — row r shifts by s_vec[r].
    pltpu.roll rotates each lane-row independently by the same amount,
    so one conditional roll per bit with a PER-ROW selection mask
    vectorizes the barrel across the whole block.
    """
    nbits = max(1, (width - 1).bit_length())
    for b in range(nbits):
        amt = 1 << b
        bit = ((s_vec >> b) & 1) > 0        # [1, R, 1] bool
        rolled = pltpu.roll(x, (width - amt) % width, axis=x.ndim - 1)
        x = jnp.where(bit, rolled, x)
    return x


def _row_block(height: int) -> int:
    """Largest row-block size (vector-op batch) dividing the height."""
    for blk in (32, 16, 8):
        if height % blk == 0:
            return blk
    return 1


def _sweep_kernel(y0_ref, y1_ref, fy_ref, shift_ref, fxv_ref, validv_ref,
                  shiftv_ref, img_ref, park_ref, out_ref, scratch_ref, *,
                  height: int, width: int, row_block: int):
    """Grid: (P,). img_ref: [C, H, W] horizontally flipped source
    (VMEM); y0/y1/fy/shift: [P, H] scalars in SMEM; fxv/validv/shiftv:
    [P, H, 1] VMEM vectors (the same per-row params in vector form);
    park: [C, 1, W] VMEM; out_ref: [1, C, H, W]; scratch: [C, RB, W].

    Rows are processed in blocks of row_block (32/16/8, whichever divides
    the height): the vertical taps are
    assembled per row (dynamic row slices + scalar fy blend into the
    scratch block), then the barrel shifter, second-tap roll, fractional
    blend and validity select all run block-wide — per-row variation is
    handled by [1, RB, 1] masks, so every vector op works on
    C*RB*W-element tiles instead of C*W.

    (A 128-aligned dynamic slice + short barrel measured no faster than
    the plain barrel per-row; block vectorization is the win. See
    tests/test_pallas_sweep.py::test_aligned_shift_bit_exact.)
    """
    c = img_ref.shape[0]
    pid = pl.program_id(0)
    n_blocks = height // row_block

    def block_body(blk, _):
        base = blk * row_block

        def fill_row(r, _):
            i = base + r
            y0 = y0_ref[pid, i]
            y1 = y1_ref[pid, i]
            fy = fy_ref[pid, i]
            row0 = img_ref[:, pl.ds(y0, 1), :]
            row1 = img_ref[:, pl.ds(y1, 1), :]
            scratch_ref[:, pl.ds(r, 1), :] =                 (1.0 - fy) * row0 + fy * row1
            return 0

        jax.lax.fori_loop(0, row_block, fill_row, 0)

        s_vec = shiftv_ref[pid, pl.ds(base, row_block), :]    # [RB, 1]
        fx_vec = fxv_ref[pid, pl.ds(base, row_block), :]
        valid_vec = validv_ref[pid, pl.ds(base, row_block), :]

        block = scratch_ref[:, :, :]                          # [C, RB, W]
        out_a = _circ_shift_left_rows(block, s_vec[None], width)
        out_b = pltpu.roll(out_a, 1, axis=2)
        fxb = fx_vec[None]                                    # [1, RB, 1]
        out_rows = (1.0 - fxb) * out_a + fxb * out_b
        out_rows = jnp.where(valid_vec[None] > 0, out_rows,
                             park_ref[:, :, :])
        out_ref[0, :, pl.ds(base, row_block), :] = out_rows
        return 0

    jax.lax.fori_loop(0, n_blocks, block_body, 0)


# imported lazily so CPU-only environments can import the module
from jax.experimental import pallas as pl             # noqa: E402
from jax.experimental.pallas import tpu as pltpu      # noqa: E402


@functools.partial(jax.jit,
                   static_argnames=("order", "height", "width",
                                    "interpret"))
def _ods_sweep_plane_stack(image: Array, order: int, depths: Array,
                           intrinsics: Array, height: int, width: int,
                           interpret: bool = False) -> Array:
    """One eye's sweep: image [H, W, C] -> [P, H, W, C]."""
    p = depths.shape[0]
    c = image.shape[-1]
    params = _row_params(order, depths, intrinsics, height, width)
    img_cf = jnp.transpose(image, (2, 0, 1))          # [C, H, W]
    img_flipped = jnp.flip(img_cf, axis=2)
    # invalid rows park at pixel (1, 1) like the reference; prebroadcast
    park_row = jnp.broadcast_to(image[1, 1, :].reshape(c, 1, 1),
                                (c, 1, width))

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem_vec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    row_block = _row_block(height)
    out = pl.pallas_call(
        functools.partial(_sweep_kernel, height=height, width=width,
                          row_block=row_block),
        grid=(p,),
        in_specs=[smem(), smem(), smem(), smem(),
                  vmem_vec(), vmem_vec(), vmem_vec(),
                  pl.BlockSpec((c, height, width), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((c, 1, width), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, c, height, width),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, c, height, width),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, row_block, width), jnp.float32)],
        # block double-buffering puts this slightly over the default 16MB
        # scoped-vmem budget at 640x320
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(params["y0"], params["y1"], params["fy"], params["shift"],
      params["fx"][..., None], params["valid"][..., None],
      params["shift"][..., None],
      img_flipped.astype(jnp.float32), park_row.astype(jnp.float32))
    return jnp.transpose(out, (0, 2, 3, 1))           # [P, H, W, C]


def ods_sweep_identity(image: Array, order: int, depths: Array,
                       intrinsics: Array,
                       interpret: bool = False) -> Optional[Array]:
    """Batched fused sweep: [B, H, W, C] -> [B, H, W, P*C].

    Only valid for identity sweep poses (the standard ODS training and
    inference configuration). Callers must guarantee that statically.
    """
    b, h, w, c = image.shape
    p = depths.shape[0]
    outs = []
    for i in range(b):
        vol = _ods_sweep_plane_stack(image[i], order, depths,
                                     intrinsics[i], h, w,
                                     interpret=interpret)
        outs.append(jnp.transpose(vol, (1, 2, 0, 3)).reshape(h, w, p * c))
    return jnp.stack(outs)
