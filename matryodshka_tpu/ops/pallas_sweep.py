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

from matryodshka_tpu.geometry import cameras, grids

Array = jax.Array

# vertical rung ladder: |floor(v) - i| <= _KVS on valid rows (<= 2.23
# measured at 640x320, baseline 0.032); _VPAD is the wrap padding and
# band lead, a multiple of 8 so band slices stay sublane-aligned.
_KVS = 3
_VPAD = 8


def _kvs_for(height: int) -> int:
    """Resolution-scaled vertical ladder bound. |dy| <= 2.23 was
    measured at H=320 (0.032 baseline); the displacement is a fixed
    ANGULAR quantity, so the pixel bound scales linearly with H. +1
    margin. Heights <= 320 keep the original 3 (bit-identical
    production kernel, warm compile cache). Without this the 512-row
    hres chunks flunk the per-chunk fast gate and the whole hres sweep
    rides the XLA gather fallback (measured 94 ms of the 215 ms frame
    at 1024x512, tools/exp_hres_stages.py)."""
    if height <= 320:
        return _KVS
    return int(-(-(2.23 * height) // 320)) + 1


def _vpad_for(kvs: int) -> int:
    """Wrap padding / band lead for a ladder bound: multiple of 8 and
    >= kvs + 1 (the deepest tap row)."""
    return max(8, 8 * -(-(kvs + 1) // 8))


def _row_params(order: int, depths: Array, intrinsics: Array,
                height: int, width: int, flip_out: bool = False,
                kvs: int = _KVS):
    """Per-(plane, row) sweep parameters via the reference projection.

    Returns dict of [P, H] arrays: y0, y1 (int32 vertical taps), fy,
    shift (int32 lane-slice start), fx, valid (int32), and the park
    value coordinates for invalid rows (the reference parks uv at (1,1)).

    flip_out: parameters for emitting the horizontally FLIPPED volume
    (the render kernel's native orientation) from the UNFLIPPED source:
    outF[j] = out[W-1-j] = row[(j + i0 + 1) mod W], so the lane shift
    becomes i0+1 on the unflipped row and the second bilinear tap sits
    one lane LEFT (roll W-1) instead of right.
    """
    p = depths.shape[0]
    S, T = grids.lat_long_grid((height, width))
    # Evaluate the exact projection at a FEW spread columns and take
    # the first non-parked one per (plane, row). A single-column eval
    # is a landmine: project_ods' quadratic disc suffers catastrophic
    # f32 cancellation for far shells near the equator, spuriously
    # parking individual pixels at (1, 1) ("park-flip noise",
    # PARITY.md) — if the one evaluated column parks while the row is
    # geometrically valid, the whole row renders from garbage params.
    # u0 recovers from any column c as u(c) + c (mod W); v is constant
    # along the row.
    # Column probe set: the original 4 quarter columns FIRST (argmax
    # picks the first non-parked, so rows they cover keep bit-identical
    # params), then 12 more spread columns. At hres shapes (observed
    # 512x256) the park-flip noise can hit all 4 quarter columns of a
    # valid row at once — the row then renders from parked garbage and
    # its huge dy_relevant kicks the whole chunk to the gather branch;
    # 16 probes drive that probability to ~q^16.
    cols = [0, width // 4, width // 2, (3 * width) // 4]
    cols += [(2 * k + 1) * width // 8 for k in range(4)]
    cols += [(2 * k + 1) * width // 16 for k in range(8)]
    cols = list(dict.fromkeys(c % width for c in cols))
    Sc = S[:, cols]
    Tc = T[:, cols]
    pts = cameras.backproject_spherical(Sc, Tc, depths)
    uv = cameras.project_ods(pts, order, None, intrinsics, width, height)
    uc = uv[..., 0]                          # [P, H, 4]
    vc = uv[..., 1]
    parked = (uc == 1.0) & (vc == 1.0)
    u0c = jnp.mod(uc + jnp.asarray(cols, uc.dtype), width)
    # first non-parked column (fall back to column 0 if all parked —
    # then the row is genuinely invalid and the park select covers it)
    idx = jnp.argmax(jnp.logical_not(parked), axis=-1)
    u0 = jnp.take_along_axis(u0c, idx[..., None], axis=-1)[..., 0]
    v = jnp.take_along_axis(vc, idx[..., None], axis=-1)[..., 0]

    # validity: tangent exists iff the point's XZ radius >= circle radius
    r = intrinsics[0, 0]
    rho = depths[:, None] * jnp.cos(T[None, :, 0])
    valid = rho >= r

    y0f = jnp.floor(v)
    fy = v - y0f
    # Unwrapped vertical offset from the output row: |dy| <= 3 on every
    # valid row in the production configs (measured <= 2.23 across
    # planes/orders at 640x320 with the 0.032 baseline). Rows near the
    # validity boundary of shells close to the viewing circle can exceed
    # the ladder; the per-(plane, block) `fast` flag routes those blocks
    # to the exact per-row path. Invalid rows are park-selected anyway,
    # so clamping them is safe.
    i_row = jnp.arange(height, dtype=jnp.float32)[None, :]
    dy_full = y0f - i_row
    dy = jnp.clip(dy_full, -kvs, kvs)
    y0 = jnp.mod(y0f.astype(jnp.int32), height)
    y1 = jnp.mod(y0 + 1, height)
    dy_relevant = jnp.where(valid, jnp.abs(dy_full), 0.0)

    i0f = jnp.floor(u0)
    fx = u0 - i0f
    i0 = jnp.mod(i0f.astype(jnp.int32), width)
    if flip_out:
        # outF_a[j] = rowA[(j + i0 + 1) mod W] on the UNFLIPPED row
        shift = jnp.mod(i0 + 1, width)
    else:
        # out_a[j] = rowA[(i0 - j) mod W] = flipped_row[(j + W-1-i0) mod W]
        shift = jnp.mod(width - 1 - i0, width)
    return {"dy": dy.astype(jnp.float32), "fy": fy.astype(jnp.float32),
            "y0": y0, "y1": y1, "dy_relevant": dy_relevant,
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


def _shift_decompose(shift, valid, n_blocks: int, row_block: int,
                     width: int):
    """Per-(plane, block) base + per-row residual for the sdyn barrel.

    The full barrel pays ceil(log2 W) roll+select passes per block; but
    u0 varies SMOOTHLY with latitude, so within a 32-row block the
    per-row shifts cluster. Decompose shift = (base + ds) mod W with
    one CIRCULAR per-block base (computed relative to the block's first
    valid row, so a wrap inside the block stays a small residual) and
    ds >= 0 small; invalid rows (park-selected downstream anyway) take
    ds = 0 so they never widen the residual. Returns (base [NP, NBLK]
    int32, ds [NP, H] int32, mask [NP, NBLK] int32 bit-OR of ds).
    """
    npl = shift.shape[0]
    sblk = shift.reshape(npl, n_blocks, row_block)
    vblk = valid.reshape(npl, n_blocks, row_block) > 0
    anchor = sblk[:, :, :1]                     # block's first row
    rel = jnp.mod(sblk - anchor, width)
    # re-center: residuals past W/2 are negative offsets from anchor
    rel = rel - width * (rel > width // 2).astype(rel.dtype)
    big = jnp.int32(1 << 20)
    rel_v = jnp.where(vblk, rel, big)
    rmin = jnp.min(rel_v, axis=2)
    rmin = jnp.where(rmin == big, 0, rmin)      # all-invalid block
    base = jnp.mod(anchor[:, :, 0] + rmin, width)
    ds = jnp.where(vblk, rel - rmin[:, :, None], 0).astype(jnp.int32)
    mask = jax.lax.reduce(ds, jnp.int32(0), jax.lax.bitwise_or, [2])
    return (base.astype(jnp.int32), ds.reshape(npl, -1),
            mask.astype(jnp.int32))


def _row_block(height: int) -> int:
    """Largest row-block size (vector-op batch) dividing the height."""
    for blk in (32, 16, 8):
        if height % blk == 0:
            return blk
    return 1


def _sweep_kernel(fast_ref, *rest,
                  height: int, width: int, row_block: int,
                  tap2_roll: int = 1, out_row0: int = 0,
                  kvs: int = _KVS, vpad: int = _VPAD,
                  dynshift: bool = False,
                  rowmajor_out: bool = False):
    """Grid: (NP,) — one program per (eye-)plane. img_ref block:
    [1, C, H + 2*_VPAD, W] wrap-padded source for THIS program's eye
    (the dual-eye call stacks both images and index-maps i // P);
    fast: [NP, NBLK] SMEM flags; y0/y1/fy: [NP, H] SMEM scalars (slow
    path); dyv/fyv/shiftv/fxv/validv: [NP, H, 1] VMEM per-row parameter
    vectors; park: [1, C, 1, W] block; out_ref: [1, C, H, W]; scratch:
    band [C, RB + 2*_VPAD, W], vb [C, RB, W].

    Rows are processed in blocks of row_block (32/16/8, whichever
    divides the height). On fast blocks (every block of the production
    configs) the vertical bilinear taps are a STATIC 8-rung ladder over
    band slices — cv_m = (1-fy)[dy==m] + fy[dy==m-1] with per-row
    [1, RB, 1] coefficient vectors — replacing the per-row dynamic-slice
    loop that used to dominate the kernel (~2 sequential row slices x H
    iterations). Blocks whose valid rows exceed the ladder (shells close
    to the viewing circle) fall back to that exact per-row loop. The
    barrel shifter, second-tap roll, fractional blend and validity
    select run block-wide as before.

    (A 128-aligned dynamic slice + short barrel measured no faster than
    the plain barrel per-row; block vectorization is the win. See
    tests/test_pallas_sweep.py::test_aligned_shift_bit_exact.)

    dynshift (perf_flags "sdyn"): shiftv_ref carries the per-row
    RESIDUAL ds of the per-block decomposition shift = base + ds
    (sbase/smask SMEM operands prepended): one dynamic-shift lane
    rotate applies the block base, then only the residual's barrel
    bit-passes with a set bit in the block's mask run — u0 clusters
    tightly within a block, so most of the ceil(log2 W) passes are
    runtime-skipped.
    """
    rest = list(rest)
    if dynshift:
        sbase_ref, smask_ref = rest[:2]
        rest = rest[2:]
    (y0_ref, y1_ref, fy_ref, dyv_ref, fyv_ref,
     shiftv_ref, fxv_ref, validv_ref, img_ref, park_ref) = rest[:10]
    rest = rest[10:]
    if rowmajor_out:
        # second output: the net kernel's row-major x [H, NP*C, W] —
        # program i owns channel block [i*C, (i+1)*C)
        out_ref, out2_ref, band_ref, vb_ref = rest
    else:
        out_ref, band_ref, vb_ref = rest
    c = img_ref.shape[1]
    pid = pl.program_id(0)
    n_blocks = height // row_block

    if out_row0:
        # planar-padded output [1, C, H + 2*out_row0, W]: zero the pad
        # row bands once (static sublane slices); data rows store at
        # base + out_row0, which stays 8-aligned for out_row0 % 8 == 0.
        out_ref[0, :, 0:out_row0, :] = jnp.zeros(
            (c, out_row0, width), out_ref.dtype)
        out_ref[0, :, height + out_row0:height + 2 * out_row0, :] = \
            jnp.zeros((c, out_row0, width), out_ref.dtype)

    def block_body(blk, _):
        base = blk * row_block

        dy_vec = dyv_ref[pid, pl.ds(base, row_block), :]      # [RB, 1]
        fy_vec = fyv_ref[pid, pl.ds(base, row_block), :]
        s_vec = shiftv_ref[pid, pl.ds(base, row_block), :]
        fx_vec = fxv_ref[pid, pl.ds(base, row_block), :]
        valid_vec = validv_ref[pid, pl.ds(base, row_block), :]

        @pl.when(fast_ref[pid, blk] > 0)
        def _():
            # the block's source band: padded rows [base, base+RB+2*VPAD)
            # cover original rows [base - VPAD, base + RB + VPAD)
            bs = pl.multiple_of(blk * row_block, 8)
            band_ref[:, :, :] = img_ref[0, :,
                                        pl.ds(bs, row_block + 2 * vpad),
                                        :]
            block = None                                      # [C, RB, W]
            for m in range(-kvs, kvs + 2):
                cv = ((1.0 - fy_vec) * (dy_vec == m)
                      + fy_vec * (dy_vec == m - 1))[None]     # [1, RB, 1]
                tap = band_ref[:, vpad + m:vpad + m + row_block, :]
                term = cv * tap
                block = term if block is None else block + term
            vb_ref[:, :, :] = block

        @pl.when(fast_ref[pid, blk] == 0)
        def _():
            def fill_row(r, _):
                i = base + r
                y0 = y0_ref[pid, i]
                y1 = y1_ref[pid, i]
                fy = fy_ref[pid, i]
                row0 = img_ref[0, :, pl.ds(y0 + vpad, 1), :]
                row1 = img_ref[0, :, pl.ds(y1 + vpad, 1), :]
                vb_ref[:, pl.ds(r, 1), :] = (1.0 - fy) * row0 + fy * row1
                return 0

            jax.lax.fori_loop(0, row_block, fill_row, 0)

        block = vb_ref[:, :, :]                               # [C, RB, W]
        if dynshift:
            base_s = sbase_ref[pid, blk]
            mask = smask_ref[pid, blk]
            # band_ref doubles as the shift workspace: the ladder (fast
            # path) is done with the source band by now and the slow
            # path never fills it.
            band_ref[:, 0:row_block, :] = pltpu.roll(
                block, jnp.mod(width - base_s, width), axis=2)
            nbits = max(1, (width - 1).bit_length())
            for b in range(nbits):
                @pl.when(((mask >> b) & 1) > 0)
                def _(b=b):
                    amt = 1 << b
                    rolled = pltpu.roll(band_ref[:, 0:row_block, :],
                                        (width - amt) % width, axis=2)
                    bit = ((s_vec[None] >> b) & 1) > 0
                    band_ref[:, 0:row_block, :] = jnp.where(
                        bit, rolled, band_ref[:, 0:row_block, :])
            out_a = band_ref[:, 0:row_block, :]
        else:
            out_a = _circ_shift_left_rows(block, s_vec[None], width)
        out_b = pltpu.roll(out_a, tap2_roll, axis=2)
        fxb = fx_vec[None]                                    # [1, RB, 1]
        out_rows = (1.0 - fxb) * out_a + fxb * out_b
        out_rows = jnp.where(valid_vec[None] > 0, out_rows,
                             park_ref[0, :, :, :])
        out_ref[0, :, pl.ds(base + out_row0, row_block), :] = out_rows.astype(
            out_ref.dtype)
        if rowmajor_out:
            out2_ref[pl.ds(base, row_block), :, :] = jnp.transpose(
                out_rows, (1, 0, 2)).astype(out2_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_blocks, block_body, 0)


# imported lazily so CPU-only environments can import the module
from jax.experimental import pallas as pl             # noqa: E402
from jax.experimental.pallas import tpu as pltpu      # noqa: E402

#: per-block dynamic-base barrel in the sweep kernel (perf_flags
#: "sdyn"): one dynamic-shift lane rotate applies each block's common
#: shift, leaving only the small per-row residual's bit-passes (runtime
#: gated per block). Backend-sensitive (tpu.dynamic_rotate lowering) —
#: compile-probed by ops.perf_probe. The jitted entry points take it as
#: a STATIC arg resolved by the non-jitted wrappers (module-global
#: reads inside jit would bake import-time values into the trace cache).
from matryodshka_tpu.ops.pallas_render import _PERF_FLAGS as _PF  # noqa: E402
DEFAULT_SDYN = bool(_PF.get("sdyn", False))
#: sweep kernel additionally emits the net's ROW-MAJOR x [H, 2P*C, W]
#: (perf_flags "xrm"): the whole-net kernel's row-major window path
#: measured faster than the channels-major planar window (r3: 4.30 vs
#: 4.73 ms) but previously cost a 0.75 ms XLA layout pass — the second
#: kernel output removes that trade (one extra in-kernel transposed
#: store + HBM write per block). Measured A/B: tools/exp_xrm.py.
DEFAULT_XRM = bool(_PF.get("xrm", False))


@functools.partial(jax.jit,
                   static_argnames=("order", "height", "width",
                                    "out_dtype", "interpret", "flip_out",
                                    "raw_layout", "dynshift"))
def _ods_sweep_plane_stack(image: Array, order: int, depths: Array,
                           intrinsics: Array, height: int, width: int,
                           out_dtype=jnp.float32,
                           interpret: bool = False,
                           flip_out: bool = False,
                           raw_layout: bool = False,
                           dynshift: bool = False) -> Array:
    """One eye's sweep: image [H, W, C] -> [P, H, W, C] (out_dtype;
    bf16 halves the volume's HBM traffic — the kernel computes f32 and
    converts at the output write).

    flip_out emits the horizontally FLIPPED volume (the fused render's
    native orientation) at zero extra cost — the flip is just a
    different lane-shift constant. raw_layout skips the final transpose
    and returns the kernel-native [P, C, H, W]."""
    p = depths.shape[0]
    c = image.shape[-1]
    kvs = _kvs_for(height)
    vpad = _vpad_for(kvs)
    params = _row_params(order, depths, intrinsics, height, width,
                         flip_out=flip_out, kvs=kvs)
    img_cf = jnp.transpose(image, (2, 0, 1))          # [C, H, W]
    if flip_out:
        img_base = img_cf.astype(jnp.float32)
    else:
        img_base = jnp.flip(img_cf, axis=2).astype(jnp.float32)
    # vertical wrap padding (mod-H tap semantics, band alignment)
    img_padded = jnp.concatenate([img_base[:, -vpad:],
                                  img_base,
                                  img_base[:, :vpad]], axis=1)
    # invalid rows park at pixel (1, 1) like the reference; prebroadcast
    park_row = jnp.broadcast_to(image[1, 1, :].reshape(c, 1, 1),
                                (c, 1, width))

    out = _sweep_call(img_padded[None], park_row[None], params,
                      p_per_eye=p, height=height, width=width,
                      out_dtype=out_dtype, flip_out=flip_out,
                      interpret=interpret, kvs=kvs, vpad=vpad,
                      dynshift=dynshift)
    if raw_layout:
        return out                                    # [P, C, H, W]
    return jnp.transpose(out, (0, 2, 3, 1))           # [P, H, W, C]


def _sweep_call(imgs_padded: Array, parks: Array, params: dict,
                p_per_eye: int, height: int, width: int, out_dtype,
                flip_out: bool, interpret: bool,
                out_row_pad: int = 0,
                kvs: int = _KVS, vpad: int = _VPAD,
                dynshift: bool = None,
                rowmajor_out: bool = False) -> Array:
    """Shared pallas_call: imgs_padded [NE, C, H+2*_VPAD, W] (one image
    per eye), parks [NE, C, 1, W], params dict of [NE*P, ...] arrays.
    Grid (NE*P,); program i uses image i // p_per_eye. Returns
    [NE*P, C, H, W] — or [NE*P, C, H + 2*out_row_pad, W] with zeroed
    pad row bands (out_row_pad % 8 == 0; the planar net-input layout,
    see pallas_net planar mode)."""
    ne, c = imgs_padded.shape[0], imgs_padded.shape[1]
    np_total = ne * p_per_eye
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem_vec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    row_block = _row_block(height)
    n_blocks = height // row_block
    # fast flag per (plane, block): every valid row's tap fits the ladder
    fast = (params["dy_relevant"].reshape(np_total, n_blocks, row_block)
            .max(axis=2) <= kvs).astype(jnp.int32)
    if row_block % 8:
        # The fast-ladder band slice asserts an 8-aligned sublane start
        # (pl.multiple_of in _sweep_kernel); when _row_block fell back to
        # 1 that promise is false, so route every block to the exact
        # per-row path instead of risking a misaligned vector load.
        fast = jnp.zeros_like(fast)
    pp = p_per_eye
    assert out_row_pad % 8 == 0, out_row_pad
    hout = height + 2 * out_row_pad
    if dynshift is None:
        dynshift = DEFAULT_SDYN
    if dynshift:
        sbase, ds, smask = _shift_decompose(
            params["shift"], params["valid"], n_blocks, row_block, width)
        shift_op = ds[..., None]
        extra_ops = [sbase, smask]
        extra_specs = [smem(), smem()]
    else:
        shift_op = params["shift"][..., None]
        extra_ops = []
        extra_specs = []
    out_specs = pl.BlockSpec((1, c, hout, width),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((np_total, c, hout, width),
                                     out_dtype)
    if rowmajor_out:
        out_specs = [out_specs,
                     pl.BlockSpec((height, c, width),
                                  lambda i: (0, i, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((height, np_total * c, width),
                                          out_dtype)]
    out = pl.pallas_call(
        functools.partial(_sweep_kernel, height=height, width=width,
                          row_block=row_block,
                          tap2_roll=(width - 1) if flip_out else 1,
                          out_row0=out_row_pad, kvs=kvs, vpad=vpad,
                          dynshift=dynshift, rowmajor_out=rowmajor_out),
        grid=(np_total,),
        in_specs=[smem()] + extra_specs + [smem(), smem(), smem(),
                  vmem_vec(), vmem_vec(), vmem_vec(), vmem_vec(),
                  vmem_vec(),
                  pl.BlockSpec((1, c, height + 2 * vpad, width),
                               lambda i: (i // pp, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, c, 1, width),
                               lambda i: (i // pp, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((c, row_block + 2 * vpad, width),
                                   jnp.float32),
                        pltpu.VMEM((c, row_block, width), jnp.float32)],
        # block double-buffering puts this slightly over the default 16MB
        # scoped-vmem budget at 640x320
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(fast, *extra_ops, params["y0"], params["y1"], params["fy"],
      params["dy"][..., None], params["fy"][..., None],
      shift_op, params["fx"][..., None],
      params["valid"][..., None],
      imgs_padded, parks.astype(jnp.float32))
    return out


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "out_dtype",
                                    "interpret", "out_row_pad",
                                    "dynshift", "rowmajor_out"))
def _ods_sweep_dual_stack(ref_image: Array, src_image: Array,
                          depths: Array, intrinsics: Array,
                          height: int, width: int,
                          out_dtype=jnp.float32,
                          interpret: bool = False,
                          out_row_pad: int = 0,
                          dynshift: bool = False,
                          rowmajor_out: bool = False):
    """Both eyes in ONE pallas_call (grid 2P): halves the dispatch and
    per-call fixed cost vs two single-eye sweeps. Emits the FLIPPED
    render-native volumes. Returns (fgF, bgF) each [P, C, H, W] (or
    [P, C, H + 2*out_row_pad, W] with zeroed pad bands)."""
    p = depths.shape[0]
    kvs = _kvs_for(height)
    vpad = _vpad_for(kvs)
    imgs, parks = [], []
    for img in (ref_image, src_image):
        cf = jnp.transpose(img, (2, 0, 1)).astype(jnp.float32)
        imgs.append(jnp.concatenate([cf[:, -vpad:], cf,
                                     cf[:, :vpad]], axis=1))
        c = img.shape[-1]
        parks.append(jnp.broadcast_to(img[1, 1, :].reshape(c, 1, 1),
                                      (c, 1, width)))
    pr = _row_params(1, depths, intrinsics, height, width,
                     flip_out=True, kvs=kvs)
    ps = _row_params(-1, depths, intrinsics, height, width,
                     flip_out=True, kvs=kvs)
    params = {k: jnp.concatenate([pr[k], ps[k]], axis=0) for k in pr}
    out = _sweep_call(jnp.stack(imgs), jnp.stack(parks), params,
                      p_per_eye=p, height=height, width=width,
                      out_dtype=out_dtype, flip_out=True,
                      interpret=interpret, out_row_pad=out_row_pad,
                      kvs=kvs, vpad=vpad, dynshift=dynshift,
                      rowmajor_out=rowmajor_out)
    if rowmajor_out:
        vol, xrm = out
        return vol[:p], vol[p:], xrm
    return out[:p], out[p:]


def ods_sweep_identity_prepared(ref_image: Array, src_image: Array,
                                depths: Array, intrinsics: Array,
                                out_dtype=jnp.float32,
                                interpret: bool = False):
    """Both eyes' sweeps, emitted in the fused render's NATIVE layout.

    Returns (net_input [B, H, W, 2*P*C], fgF [B, P, C, H, W],
    bgF [B, P, C, H, W]) where fgF/bgF are horizontally FLIPPED
    plane-major volumes (ref eye order=+1, src eye order=-1). The kernel
    emits the flipped layout directly (a different lane-shift constant —
    zero cost); the CNN's channel-minor input is then ONE fused XLA
    flip+transpose away, the same copy the unflipped path already paid.
    The flipped volumes flow straight into assemble_rgba_prepared /
    the ladder render without the [H,W,P,4]->[P,4,H,W] layout tax.
    """
    b, h, w, c = ref_image.shape
    p = depths.shape[0]
    nets, fgs, bgs = [], [], []
    for i in range(b):
        fv, gv = _ods_sweep_dual_stack(ref_image[i], src_image[i],
                                       depths, intrinsics[i], h, w,
                                       out_dtype=out_dtype,
                                       interpret=interpret,
                                       dynshift=DEFAULT_SDYN)

        def _net_layout(vol):
            un = jnp.flip(vol, axis=3)                 # [P, C, H, W]
            return jnp.transpose(un, (2, 3, 0, 1)).reshape(h, w, p * c)

        nets.append(jnp.concatenate([_net_layout(fv), _net_layout(gv)],
                                    axis=-1))
        fgs.append(fv)
        bgs.append(gv)
    return jnp.stack(nets), jnp.stack(fgs), jnp.stack(bgs)


# Vertical pad rows of the planar net-input volumes (pallas_net planar
# mode): 8 keeps the sweep kernel's shifted stores sublane-aligned and
# gives the net's x-window DMAs full rectangles with no edge cases.
NET_ROW_PAD = 8


def ods_sweep_identity_planar(ref_image: Array, src_image: Array,
                              depths: Array, intrinsics: Array,
                              out_dtype=jnp.float32,
                              interpret: bool = False):
    """Both eyes' sweeps in the PLANAR net-input layout.

    Returns (fgP, bgP) [B, P, C, H + 2*NET_ROW_PAD, W]: flipped
    plane-major volumes with zeroed pad row bands, written by the same
    dual-eye kernel (the pad costs two static zero stores). fgP[:, :,
    NET_ROW_PAD:NET_ROW_PAD+H] equals ods_sweep_identity_prepared's fgF
    (assemble slices it off for free); the padded planes reshape to the
    net kernel's planar x operands [P*C, H+2*PAD, W] with zero layout
    work — replacing the measured 0.75 ms XLA flip/transpose/concat
    rm-layout pass.
    """
    b, h, w, c = ref_image.shape
    fgs, bgs = [], []
    for i in range(b):
        fv, gv = _ods_sweep_dual_stack(ref_image[i], src_image[i],
                                       depths, intrinsics[i], h, w,
                                       out_dtype=out_dtype,
                                       interpret=interpret,
                                       out_row_pad=NET_ROW_PAD,
                                       dynshift=DEFAULT_SDYN)
        fgs.append(fv)
        bgs.append(gv)
    return jnp.stack(fgs), jnp.stack(bgs)


def ods_sweep_identity_planar_rm(ref_image: Array, src_image: Array,
                                 depths: Array, intrinsics: Array,
                                 out_dtype=jnp.float32,
                                 interpret: bool = False):
    """Like ods_sweep_identity_planar but ALSO returns the net kernel's
    row-major x: (fgP, bgP, x_rm) with fgP/bgP [B, P, C, H + 2*pad, W]
    and x_rm [B, H, 2*P*C, W] (flipped, channel order ref planes then
    src — the format_network_input concat order)."""
    b, h, w, c = ref_image.shape
    fgs, bgs, xs = [], [], []
    for i in range(b):
        fv, gv, xr = _ods_sweep_dual_stack(ref_image[i], src_image[i],
                                           depths, intrinsics[i], h, w,
                                           out_dtype=out_dtype,
                                           interpret=interpret,
                                           out_row_pad=NET_ROW_PAD,
                                           dynshift=DEFAULT_SDYN,
                                           rowmajor_out=True)
        fgs.append(fv)
        bgs.append(gv)
        xs.append(xr)
    return jnp.stack(fgs), jnp.stack(bgs), jnp.stack(xs)


def ods_sweep_identity_chunked(ref_image: Array, src_image: Array,
                               depths: Array, intrinsics: Array,
                               chunk_rows: int,
                               out_dtype=jnp.float32,
                               interpret: bool = False):
    """High-res dual sweep in ROW CHUNKS: each pallas_call sees only an
    image row band, so VMEM stays bounded at 4096x2048 (the whole-image
    dual call needs the full padded source resident). Chunks whose
    validity-boundary rows exceed the vertical ladder take an exact
    XLA-gather branch (lax.cond), mirroring the render's pose-contract
    fallback. Emits the FLIPPED plane-major volumes like
    ods_sweep_identity_prepared: returns (fgF, bgF) [B, P, C, H, W].
    """
    from matryodshka_tpu.geometry import cameras, grids
    from matryodshka_tpu.ops.resample import resample_stack

    b, h, w, c = ref_image.shape
    p = depths.shape[0]
    assert h % chunk_rows == 0, (h, chunk_rows)
    nch = h // chunk_rows
    # dy scales with the FULL image height (the chunk is just a row
    # window of it)
    kvs = _kvs_for(h)
    vpad = _vpad_for(kvs)

    fgs, bgs = [], []
    for bi in range(b):
        imgs, parks = [], []
        for img in (ref_image[bi], src_image[bi]):
            cf = jnp.transpose(img, (2, 0, 1)).astype(jnp.float32)
            imgs.append(jnp.concatenate([cf[:, -vpad:], cf,
                                         cf[:, :vpad]], axis=1))
            parks.append(jnp.broadcast_to(
                img[1, 1, :].reshape(c, 1, 1), (c, 1, w)))
        imgs = jnp.stack(imgs)                    # [2, C, H+2VPAD, W]
        parks = jnp.stack(parks)
        pr = _row_params(1, depths, intrinsics[bi], h, w,
                         flip_out=True, kvs=kvs)
        ps = _row_params(-1, depths, intrinsics[bi], h, w,
                         flip_out=True, kvs=kvs)
        params = {k: jnp.concatenate([pr[k], ps[k]], axis=0)
                  for k in pr}

        def gather_chunk(r0):
            """Exact fallback: rows [r0, r0+chunk_rows) of both eyes via
            the general gather path, flipped plane-major."""
            S, T = grids.lat_long_grid((h, w))
            Sc = jax.lax.dynamic_slice_in_dim(S, r0, chunk_rows, 0)
            Tc = jax.lax.dynamic_slice_in_dim(T, r0, chunk_rows, 0)
            outs = []
            for ei, (img, order) in enumerate(((ref_image[bi], 1),
                                               (src_image[bi], -1))):
                pts = cameras.backproject_spherical(Sc, Tc, depths)
                uv = cameras.project_ods(pts, order, None,
                                         intrinsics[bi], w, h)
                vol = resample_stack(img, uv, wrap=True)  # [P,nr,W,C]
                volF = jnp.flip(vol, axis=2)
                outs.append(jnp.transpose(volF, (0, 3, 1, 2)))
            return tuple(o.astype(out_dtype) for o in outs)

        chunks_fg, chunks_bg = [], []
        row_block = _row_block(chunk_rows)
        nblk_c = chunk_rows // row_block
        for ci in range(nch):
            r0 = ci * chunk_rows
            pchunk = {k: jax.lax.dynamic_slice_in_dim(v, r0, chunk_rows,
                                                      axis=1)
                      for k, v in params.items()}
            band = jax.lax.slice_in_dim(imgs, r0, r0 + chunk_rows
                                        + 2 * vpad, axis=2)
            fastc = (pchunk["dy_relevant"]
                     .reshape(2 * p, nblk_c, row_block)
                     .max(axis=2) <= kvs)
            all_fast = jnp.all(fastc) & (row_block % 8 == 0)

            def kernel_branch(band, pchunk):
                out = _sweep_call(band, parks, pchunk, p_per_eye=p,
                                  height=chunk_rows, width=w,
                                  out_dtype=out_dtype, flip_out=True,
                                  interpret=interpret, kvs=kvs,
                                  vpad=vpad, dynshift=DEFAULT_SDYN)
                return out[:p], out[p:]

            def gather_branch(band, pchunk, r0=r0):
                del band, pchunk
                return gather_chunk(r0)

            fg_c, bg_c = jax.lax.cond(all_fast, kernel_branch,
                                      gather_branch, band, pchunk)
            chunks_fg.append(fg_c)
            chunks_bg.append(bg_c)
        fgs.append(jnp.concatenate(chunks_fg, axis=2))
        bgs.append(jnp.concatenate(chunks_bg, axis=2))
    return jnp.stack(fgs), jnp.stack(bgs)


def ods_sweep_identity(image: Array, order: int, depths: Array,
                       intrinsics: Array, out_dtype=jnp.float32,
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
                                     out_dtype=out_dtype,
                                     interpret=interpret,
                                     dynshift=DEFAULT_SDYN)
        outs.append(jnp.transpose(vol, (1, 2, 0, 3)).reshape(h, w, p * c))
    return jnp.stack(outs)
