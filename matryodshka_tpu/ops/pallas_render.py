"""Pallas fused MSI novel-view render: warp + over-composite, no gathers.

The gather-path render (geometry/render.py) costs ~2.7 ns per gathered
row on TPU -- P*H*W ~ 6.5M descriptors dominate the frame. This kernel
replaces every gather with lane/sublane ROTATES + masked blends by
exploiting the structure of translation-dominant novel-view warps
(the 6DoF-video hot path: bench, test.py re-renders):

  u(p,i,j) = (W-1-j) - du(p,i,j)     (ERP->ERP is a REVERSED ramp in j;
                                      theta = -S, cf. cameras.py:168-174)
  v(p,i,j) = i + dv(p,i,j)

with |du| <= |t| * (W/2pi) / (r_p cos(lat)) and |dv| <= |t| * (W/2pi)/r_p
(parallax; verified in tools/analyze_render_residuals.py). On the
horizontally FLIPPED source Lf the bilinear sample is an EXACT double
rung ladder (tools/proto_render_ladder.py is the numpy spec, bit-equal
to the gather path):

  out(i,j) = sum_m cv_m(i,j) * sum_k ch_k(i,j) * Lf_pad[i+m, (j+k) mod W]
  dk = W-1-floor(u)-j (circular)     ch_k = (1-fx)[dk==k] + fx[dk==k+1]
  dy = floor(v)-i                    cv_m = (1-fy)[dy==m] + fy[dy==m-1]

Both ladders are RUNTIME-SIZED fori loops over dynamic-shift rotates
(Mosaic's tpu.dynamic_rotate): per-(plane, row-block) integer rung
bounds, computed in XLA from the actual uv field and prefetched to
SMEM, bound each loop -- a far shell at the equator pays ~2x3 rungs
while a near shell by the pole cap pays its true range.

The 1/cos(lat) amplification is unbounded at the poles, so the kernel
only renders rows [cap, H-cap); the caller (geometry/render.py) renders
the two pole caps with the gather path and concatenates. Residuals
beyond the static maxima clamp to the nearest rung (nearest-edge
sample) — `residual_ok` checks the actual uv field against the bounds,
and geometry/render.py falls back to the gather path (lax.cond) when a
pose exceeds the contract, so the fused path is safe by construction.

Compositing happens IN-KERNEL: the grid iterates shells back-to-front
and accumulates `out = rgb*a + out*(1-a)` (layer 0's alpha ignored, per
projector.py:246-265), so the [P,H,W,4] reprojection volume never
touches HBM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Static residual clamps (the ladders are runtime-sized; these only bound
# the tables and the nearest-edge clamp, so generous values cost nothing
# at runtime). The DEFAULTS SCALE WITH RESOLUTION — vertical parallax is
# |t|*(W/2pi)/r_min pixels and the horizontal bound multiplies by the
# 1/cos(lat) amplification at the cap boundary; fixed clamps silently
# nearest-edge-clamped near shells at 1024x512 (found by the
# multi-resolution check, err 0.75).
MAX_T = 0.07            # supported |t| (meters) at r_min = 1
ROW_BLOCK = 32
CAP_ROWS = 16
KV_MAX = 7              # the 640x320 default, kept for test stability
KH_MAX = 64


def default_bounds(h: int, w: int, cap: int):
    """Resolution-scaled (kh_max, kv_max) supporting |t| <= MAX_T."""
    import math
    kv = max(7, int(math.ceil(MAX_T * w / (2.0 * math.pi))) + 1)
    amp = 1.0 / math.sin((cap + 0.5) * math.pi / h)
    kh = int(math.ceil(kv * amp)) + 2
    return kh, kv


def _band_geometry(cap: int, row_block: int, kv_max: int):
    """Sublane-aligned band layout around each row block.

    The band holds source rows [blk_start - band_lead,
    blk_start - band_lead + band); vertical tap m lives at band row
    band_lead + m. The band START must be 8-aligned (Mosaic vector
    loads), which fixes the XLA-side wrap padding `pad` via the
    congruence (cap - band_lead + pad) % 8 == 0. The band size is kept
    minimal: the deepest tap touches row band_lead + kv_max + 1 +
    row_block - 1.
    """
    band_lead = 8 * -(-(kv_max + 1) // 8)
    band = band_lead + row_block + kv_max + 1
    pad = max(kv_max + 2, band_lead - cap, band - row_block - cap, 0)
    while (cap - band_lead + pad) % 8:
        pad += 1
    return band_lead, band, pad


def _residual_tables(u: Array, v: Array, cap: int, row_block: int,
                     kh_max: int, kv_max: int, wb: int = None):
    """Integer rung bounds per (plane, row-block[, column-tile]) from the
    uv field.

    u, v: [P, Hm, W] (mid rows only). Returns int32 [P, NBLK] x4 (or
    [P, NBLK, NT] x4 when `wb` column-tiles the width). The kernel
    recomputes the per-pixel residual fields from u, v in VMEM --
    passing them would double HBM traffic.
    """
    p, hm, w = u.shape
    nblk = hm // row_block
    j = jax.lax.broadcasted_iota(jnp.float32, (1, 1, w), 2)
    i = (jax.lax.broadcasted_iota(jnp.float32, (1, hm, 1), 1) + cap)
    dk_raw = (w - 1.0) - jnp.floor(u) - j
    dk = dk_raw - w * jnp.floor((dk_raw + w / 2.0) / w)
    dk = jnp.clip(dk, -kh_max, kh_max)
    dy = jnp.clip(jnp.floor(v) - i, -kv_max, kv_max)
    if wb is None:
        dk = dk.reshape(p, nblk, row_block, w)
        dy = dy.reshape(p, nblk, row_block, w)
        red = (2, 3)
    else:
        nt = w // wb
        dk = dk.reshape(p, nblk, row_block, nt, wb)
        dy = dy.reshape(p, nblk, row_block, nt, wb)
        red = (2, 4)
    klo = jnp.min(dk, axis=red).astype(jnp.int32)
    khi = jnp.max(dk, axis=red).astype(jnp.int32)
    mlo = jnp.min(dy, axis=red).astype(jnp.int32)
    mhi = jnp.max(dy, axis=red).astype(jnp.int32)
    return klo, khi, mlo, mhi


def _render_kernel(klo_ref, khi_ref, mlo_ref, mhi_ref, layer_ref, u_ref,
                   v_ref, out_ref, rolled_ref, cvs_ref, acc_ref, *,
                   h_mid: int, width: int, cap: int, row_block: int,
                   kh_max: int, kv_max: int,
                   abs_row0: int = None, band_origin: int = None,
                   cache_cvs: bool = True):
    """Grid (P,). layer_ref: [1, 4, bandH, W] flipped+row-wrap-padded
    shell p (VMEM); u_ref/v_ref: [1, Hm, W] each (separate operands —
    a stacked [P, 2, Hm, W] field costs a 47 MB XLA concat pass);
    out_ref: [3, Hm, W] revisited
    across shells (the running composite). Scratch: rolled [4, band, W]
    (the block's row band, lane-rotated by the current horizontal rung),
    cvs [MV, R, W] (vertical rung coefficients; unused when cache_cvs
    is False — high-res calls, where MV would explode VMEM, recompute
    per rung instead), acc [4, R, W].

    abs_row0: global image row of output row 0 (default: cap — the
    classic full-mid call); band_origin: global image row stored at
    layer_ref row 0 (default: -pad). Chunked high-res calls pass layer
    row BANDS with band_origin = abs_row0 - band_lead so every block's
    band slice start stays 8-aligned."""
    p = pl.program_id(0)
    nblk = h_mid // row_block
    band_lead, band, pad = _band_geometry(cap, row_block, kv_max)
    if abs_row0 is None:
        abs_row0 = cap
    if band_origin is None:
        band_origin = -pad
    assert (abs_row0 - band_lead - band_origin) % 8 == 0, (
        abs_row0, band_lead, band_origin)

    def block_body(blk, _):
        base = blk * row_block
        u = u_ref[0, pl.ds(base, row_block), :]
        v = v_ref[0, pl.ds(base, row_block), :]

        j = jax.lax.broadcasted_iota(
            jnp.int32, (row_block, width), 1).astype(jnp.float32)
        i_abs = (jax.lax.broadcasted_iota(
            jnp.int32, (row_block, width), 0).astype(jnp.float32)
            + (abs_row0 + base).astype(jnp.float32))

        x0f = jnp.floor(u)
        fx = u - x0f
        dk_raw = (width - 1.0) - x0f - j
        dk = dk_raw - width * jnp.floor((dk_raw + width / 2.0) / width)
        dk = jnp.clip(dk, -kh_max, kh_max)
        y0f = jnp.floor(v)
        fy = v - y0f
        dy = jnp.clip(y0f - i_abs, -kv_max, kv_max)

        klo = klo_ref[p, blk]
        khi = khi_ref[p, blk]
        mlo = mlo_ref[p, blk]
        mhi = mhi_ref[p, blk]

        # Vertical rung coefficients, once per block (static unroll,
        # runtime-skipped outside [mlo, mhi+1]). High-res calls skip the
        # cache (MV scratch would not fit VMEM) and recompute per rung.
        if cache_cvs:
            for mi, m in enumerate(range(-kv_max, kv_max + 2)):
                @pl.when((m >= mlo) & (m <= mhi + 1))
                def _(mi=mi, m=m):
                    cvs_ref[mi, :, :] = ((1.0 - fy) * (dy == m)
                                         + fy * (dy == m - 1))

        acc_ref[:, :, :] = jnp.zeros((4, row_block, width), acc_ref.dtype)
        bs = pl.multiple_of(abs_row0 + base - band_lead - band_origin, 8)

        def rungs(k):
            """Accumulate every vertical rung of horizontal rung k.

            Vertical taps are STATIC band slices of the rolled band (no
            sublane rolls): rung m reads rows band_lead+m ..
            band_lead+m+R. Lf[(j+k) mod W] == roll(Lf, -k)[j]."""
            kf = k.astype(jnp.float32)
            ch = (1.0 - fx) * (dk == kf) + fx * (dk == kf + 1.0)
            for mi, m in enumerate(range(-kv_max, kv_max + 2)):
                @pl.when((m >= mlo) & (m <= mhi + 1))
                def _(mi=mi, m=m):
                    if cache_cvs:
                        cv = cvs_ref[mi, :, :]
                    else:
                        cv = ((1.0 - fy) * (dy == m)
                              + fy * (dy == m - 1))
                    coef = ch * cv
                    tap = rolled_ref[:, band_lead + m:
                                     band_lead + m + row_block, :]
                    acc_ref[:, :, :] = (acc_ref[:, :, :]
                                        + (coef[None] * tap).astype(
                                            acc_ref.dtype))

        # Two roll-by-1 chains from the UNROTATED band (k=0) — no
        # dynamic rotate needed. Chain A walks k = 0..khi (roll left
        # after each rung), chain B re-seeds and walks k = -1 down to
        # klo-1 (roll right before each rung). Rungs outside
        # [klo-1, khi] have all-zero masks, so over-coverage is safe.
        # (Layers may be stored bf16 — halves their HBM traffic —
        # and rotate is 32-bit-only, so convert at the band load.)
        rolled_ref[:, :, :] = layer_ref[0, :, pl.ds(bs, band),
                                        :].astype(jnp.float32)

        def k_up(i, _):
            rungs(i)
            rolled_ref[:, :, :] = pltpu.roll(rolled_ref[:, :, :],
                                             width - 1, axis=2)
            return 0

        jax.lax.fori_loop(0, khi + 1, k_up, 0)

        @pl.when(klo - 1 < 0)
        def _():
            rolled_ref[:, :, :] = layer_ref[0, :, pl.ds(bs, band),
                                            :].astype(jnp.float32)

        def k_down(i, _):
            rolled_ref[:, :, :] = pltpu.roll(rolled_ref[:, :, :], 1,
                                             axis=2)
            rungs(-1 - i)
            return 0

        jax.lax.fori_loop(0, jnp.maximum(0, 1 - klo), k_down, 0)

        rgb = acc_ref[0:3, :, :].astype(jnp.float32)
        alpha = acc_ref[3:4, :, :].astype(jnp.float32)

        @pl.when(p == 0)
        def _():
            # farthest shell: alpha treated as 1 (projector.py:246-265)
            out_ref[:, pl.ds(base, row_block), :] = rgb

        @pl.when(p > 0)
        def _():
            prev = out_ref[:, pl.ds(base, row_block), :]
            out_ref[:, pl.ds(base, row_block), :] = (
                rgb * alpha + prev * (1.0 - alpha))

        return 0

    jax.lax.fori_loop(0, nblk, block_body, 0)


def _pack_tables(klo, khi, mlo, mhi):
    """Pack the 4 int32 bound tables into 2 (16-bit biased fields).

    The tiled kernel's tables are [P, NBLK, NT] -- 4 of them at P=32
    overflow the SMEM scalar-prefetch budget (the TPU compile helper
    crashes outright; P<=16 compiles). Bias-32768 fields keep the
    decode sign-free: x >> 16 is arithmetic on int32, so the decode
    masks with & 0xFFFF before un-biasing."""
    b = 1 << 15
    kt = (klo + b) | ((khi + b) << 16)
    mt = (mlo + b) | ((mhi + b) << 16)
    return kt.astype(jnp.int32), mt.astype(jnp.int32)


def _unpack2(t):
    b = 1 << 15
    lo = (t & 0xFFFF) - b
    hi = ((t >> 16) & 0xFFFF) - b
    return lo, hi


def _render_kernel_tiled(kt_ref, mt_ref, layer_ref,
                         u_ref, v_ref, out_ref, rolled_ref, cvs_ref,
                         acc_ref, vtap_ref, *rest,
                         h_mid: int, width: int, wb: int, cap: int,
                         row_block: int, kh_max: int, kv_max: int,
                         abs_row0: int = None, band_origin: int = None,
                         parts: str = "all", vtap: bool = False,
                         dyn_m: bool = False, mpair: bool = False,
                         kpair: bool = False):
    """Hybrid column-tiled ladder: FULL-WIDTH roll chains (identical to
    _render_kernel -- wide rolls are the efficient form, measured 1.78
    cycles/lane vs 3.3 for per-tile halo'd rolls) with the FMA work
    predicated per width/wb column tile. Within a 128-lane tile both
    the horizontal-rung span (khi-klo) and the vertical-tap span
    collapse ~3-4x vs the full-width block (du/dv vary azimuthally
    across the row), so tiles skip rungs and vertical taps their own
    residual range never touches: FMA volume drops 2687 -> 756 Mlanes
    at the bench pose (measured e2e: 5.43 -> 4.72 ms at t=0.05x,
    8.08 -> 6.25 ms at a diagonal pose; bit-exact vs _render_kernel).

    A pure-tiled variant (halo buffers + dynamic seed rotates, see git
    history) LOST: narrow-op inefficiency (2.4 c/l FMA, 3.3 c/l rolls)
    cancelled the volume win. Tables are per-(p, blk, tile), 16-bit
    packed (4 full [P,NBLK,NT] tables crash the TPU compile helper's
    SMEM budget at P=32).

    `parts` is a MEASUREMENT-ONLY knob (tools/exp_ladder_parts.py):
    "all" is the production kernel; the other values elide pieces to
    split the stage budget (outputs are WRONG for any value but "all"):
      "norolls"   — roll chain removed (taps read stale lanes)
      "rollsonly" — rungs()/cvs removed: band copy + rolls + composite
      "nofma"     — coefficients built and accumulated, tap read+mult
                    skipped (acc += coef): all-nofma = tap FMA cost
      "noacc"     — accumulator write-only (acc = upd, no read+add):
                    all-noacc = the per-(k,t,m) RMW read+add traffic
      "noch"      — ch coefficient build skipped (ch := fx slice):
                    all-noch = the per-(k,t) compare/mult build cost

    `vtap` (perf_flags "vtap", hardware A/B'd): per k-rung, vertically
    pre-blend the rolled band ONCE into vtap_ref (static m levels gated
    by the BLOCK-GLOBAL m range), then each active tile does a single
    ch-weighted FMA. Motivation: the r4 parts split put the per-(k, t)
    coefficient build + the 20-level per-tile m branch cascade at
    2.06 ms of the 4.75 ms bench-pose total vs 0.24 ms of tap FMA —
    branch machinery dominates, so trade a slightly wider m range
    (global vs per-tile) for ~nt x fewer predicated regions. Not
    bit-identical to the per-tile form (FP association: ch*(sum cvs*t)
    vs sum (ch*cvs)*t) but inside the gather-parity tolerance.
    """
    do_rolls = parts in ("all", "rollsonly", "nofma", "noacc", "noch")
    do_rungs = parts != "rollsonly"
    do_tap = parts in ("all", "norolls", "noacc", "noch")
    do_accrmw = parts != "noacc"
    do_ch = parts != "noch"
    if kpair:
        # perf_flags "kpair": TWO horizontal rungs per loop iteration
        # from two rolled bands offset by one rung — halves the k-loop
        # iteration count (and with it the per-(k, t) branch/loop
        # machinery, the ladder's dominant non-roll slab: 2.45 ms of
        # 4.75 at the r4 bench-pose parts split). Roll volume is
        # unchanged (two buffers each rolled by 2 every other rung);
        # the price is one extra band seed per chain and zero-
        # coefficient FMAs where only one rung of a pair is active.
        assert parts == "all" and not vtap and not dyn_m, (
            "kpair composes only with mpair")
        rolledb_ref = rest[0]
    p = pl.program_id(0)
    nblk = h_mid // row_block
    nt = width // wb
    band_lead, band, pad = _band_geometry(cap, row_block, kv_max)
    if abs_row0 is None:
        abs_row0 = cap
    if band_origin is None:
        band_origin = -pad
    assert (abs_row0 - band_lead - band_origin) % 8 == 0, (
        abs_row0, band_lead, band_origin)

    def block_body(blk, _):
        base = blk * row_block
        bs = pl.multiple_of(abs_row0 + base - band_lead - band_origin, 8)
        u = u_ref[0, pl.ds(base, row_block), :]
        v = v_ref[0, pl.ds(base, row_block), :]
        j = jax.lax.broadcasted_iota(
            jnp.int32, (row_block, width), 1).astype(jnp.float32)
        i_abs = (jax.lax.broadcasted_iota(
            jnp.int32, (row_block, width), 0).astype(jnp.float32)
            + (abs_row0 + base).astype(jnp.float32))
        x0f = jnp.floor(u)
        fx = u - x0f
        dk_raw = (width - 1.0) - x0f - j
        dk = dk_raw - width * jnp.floor((dk_raw + width / 2.0) / width)
        dk = jnp.clip(dk, -kh_max, kh_max)
        y0f = jnp.floor(v)
        fy = v - y0f
        dy = jnp.clip(y0f - i_abs, -kv_max, kv_max)

        bounds = [(_unpack2(kt_ref[p, blk, t]),
                   _unpack2(mt_ref[p, blk, t])) for t in range(nt)]
        gklo = functools.reduce(jnp.minimum, [k[0] for k, _ in bounds])
        gkhi = functools.reduce(jnp.maximum, [k[1] for k, _ in bounds])
        gmlo = functools.reduce(jnp.minimum, [m[0] for _, m in bounds])
        gmhi = functools.reduce(jnp.maximum, [m[1] for _, m in bounds])

        if do_rungs:
            # mpair widens the written range by one level each side: a
            # pair region may touch the partner level just outside
            # [gmlo, gmhi+1]; its coefficient is exactly zero there but
            # the cvs slot must hold that zero, not a stale block's.
            mwid = 1 if mpair else 0
            for mi, m in enumerate(range(-kv_max, kv_max + 2)):
                @pl.when((m >= gmlo - mwid) & (m <= gmhi + 1 + mwid))
                def _(mi=mi, m=m):
                    cvs_ref[mi, :, :] = ((1.0 - fy) * (dy == m)
                                         + fy * (dy == m - 1))

        acc_ref[:, :, :] = jnp.zeros((4, row_block, width),
                                     acc_ref.dtype)

        def rungs(k):
            if not do_rungs:
                return
            kf = k.astype(jnp.float32)
            if vtap:
                @pl.when((k >= gklo - 1) & (k <= gkhi))
                def _():
                    vtap_ref[:, :, :] = jnp.zeros(
                        (4, row_block, width), vtap_ref.dtype)
                    for mi, m in enumerate(range(-kv_max, kv_max + 2)):
                        @pl.when((m >= gmlo) & (m <= gmhi + 1))
                        def _(mi=mi, m=m):
                            vtap_ref[:, :, :] = (
                                vtap_ref[:, :, :]
                                + cvs_ref[mi, :, :][None]
                                * rolled_ref[:, band_lead + m:
                                             band_lead + m + row_block,
                                             :])
                    for t in range(nt):
                        (tklo, tkhi), _tm = bounds[t]

                        @pl.when((k >= tklo - 1) & (k <= tkhi))
                        def _(t=t):
                            c0 = t * wb
                            ch = ((1.0 - fx[:, c0:c0 + wb])
                                  * (dk[:, c0:c0 + wb] == kf)
                                  + fx[:, c0:c0 + wb]
                                  * (dk[:, c0:c0 + wb] == kf + 1.0))
                            acc_ref[:, :, c0:c0 + wb] = (
                                acc_ref[:, :, c0:c0 + wb]
                                + (ch[None]
                                   * vtap_ref[:, :, c0:c0 + wb]
                                   ).astype(acc_ref.dtype))
                return
            for t in range(nt):
                (tklo, tkhi), (tmlo, tmhi) = bounds[t]

                @pl.when((k >= tklo - 1) & (k <= tkhi))
                def _(t=t, tmlo=tmlo, tmhi=tmhi):
                    c0 = t * wb
                    if do_ch:
                        ch = ((1.0 - fx[:, c0:c0 + wb])
                              * (dk[:, c0:c0 + wb] == kf)
                              + fx[:, c0:c0 + wb]
                              * (dk[:, c0:c0 + wb] == kf + 1.0))
                    else:
                        ch = fx[:, c0:c0 + wb]
                    if dyn_m:
                        # perf_flags "dyn_m": a runtime-sized fori over
                        # the tile's ACTUAL vertical-tap range with a
                        # dynamic sublane slice of the rolled band,
                        # replacing the 2*kv_max+2-level static
                        # @pl.when cascade — the cascade's scalar
                        # branch tests dominate the ladder's non-roll
                        # overhead (r4 parts split: 2.06 ms of branch+
                        # coef machinery vs 0.24 ms of tap FMA). Same
                        # ascending-m visit order => bit-identical
                        # accumulation.
                        def m_body(m, _, t=t, ch=ch):
                            c0 = t * wb
                            coef = ch * cvs_ref[
                                pl.ds(m + kv_max, 1), :,
                                c0:c0 + wb][0]
                            tap = rolled_ref[
                                :, pl.ds(band_lead + m, row_block),
                                c0:c0 + wb]
                            acc_ref[:, :, c0:c0 + wb] = (
                                acc_ref[:, :, c0:c0 + wb]
                                + (coef[None] * tap).astype(
                                    acc_ref.dtype))
                            return 0
                        jax.lax.fori_loop(tmlo, tmhi + 2, m_body, 0)
                        return
                    if mpair:
                        # perf_flags "mpair": two vertical-tap levels
                        # per predicated region — halves the cascade's
                        # scalar branch tests (the ladder's dominant
                        # non-roll overhead, r4 parts split). A pair
                        # member outside [tmlo, tmhi+1] contributes an
                        # EXACTLY-zero coefficient at this tile's
                        # columns (dy never hits it), so results match
                        # the cascade to f32 association.
                        for mi, m in enumerate(range(-kv_max,
                                                     kv_max + 2)):
                            if mi % 2:
                                continue

                            @pl.when((m + 1 >= tmlo) & (m <= tmhi + 1))
                            def _(mi=mi, m=m, t=t, ch=ch):
                                c0 = t * wb
                                coef0 = ch * cvs_ref[mi, :,
                                                     c0:c0 + wb]
                                tap0 = rolled_ref[
                                    :, band_lead + m:
                                    band_lead + m + row_block,
                                    c0:c0 + wb]
                                coef1 = ch * cvs_ref[mi + 1, :,
                                                     c0:c0 + wb]
                                tap1 = rolled_ref[
                                    :, band_lead + m + 1:
                                    band_lead + m + 1 + row_block,
                                    c0:c0 + wb]
                                acc_ref[:, :, c0:c0 + wb] = (
                                    acc_ref[:, :, c0:c0 + wb]
                                    + (coef0[None] * tap0
                                       + coef1[None] * tap1).astype(
                                           acc_ref.dtype))
                        return
                    for mi, m in enumerate(range(-kv_max, kv_max + 2)):
                        @pl.when((m >= tmlo) & (m <= tmhi + 1))
                        def _(mi=mi, m=m, t=t, ch=ch):
                            c0 = t * wb
                            coef = ch * cvs_ref[mi, :, c0:c0 + wb]
                            if do_tap:
                                tap = rolled_ref[:, band_lead + m:
                                                 band_lead + m
                                                 + row_block,
                                                 c0:c0 + wb]
                                upd = (coef[None] * tap)
                            else:
                                upd = jnp.broadcast_to(
                                    coef[None], (4, row_block, wb))
                            if do_accrmw:
                                acc_ref[:, :, c0:c0 + wb] = (
                                    acc_ref[:, :, c0:c0 + wb]
                                    + upd.astype(acc_ref.dtype))
                            else:
                                acc_ref[:, :, c0:c0 + wb] = \
                                    upd.astype(acc_ref.dtype)

        def rungs_pair(k):
            """kpair: rungs k (from rolled_ref) and k+1 (rolledb_ref)
            under ONE set of tile/m-region branch tests."""
            kfA = k.astype(jnp.float32)
            kfB = kfA + 1.0
            for t in range(nt):
                (tklo, tkhi), (tmlo, tmhi) = bounds[t]

                @pl.when((k + 1 >= tklo - 1) & (k <= tkhi))
                def _(t=t, tmlo=tmlo, tmhi=tmhi):
                    c0 = t * wb
                    fxt = fx[:, c0:c0 + wb]
                    dkt = dk[:, c0:c0 + wb]
                    chA = ((1.0 - fxt) * (dkt == kfA)
                           + fxt * (dkt == kfA + 1.0))
                    chB = ((1.0 - fxt) * (dkt == kfB)
                           + fxt * (dkt == kfB + 1.0))
                    if mpair:
                        for mi, m in enumerate(range(-kv_max,
                                                     kv_max + 2)):
                            if mi % 2:
                                continue

                            @pl.when((m + 1 >= tmlo) & (m <= tmhi + 1))
                            def _(mi=mi, m=m, t=t, chA=chA, chB=chB):
                                c0 = t * wb
                                cv0 = cvs_ref[mi, :, c0:c0 + wb]
                                cv1 = cvs_ref[mi + 1, :, c0:c0 + wb]
                                tA0 = rolled_ref[
                                    :, band_lead + m:
                                    band_lead + m + row_block,
                                    c0:c0 + wb]
                                tA1 = rolled_ref[
                                    :, band_lead + m + 1:
                                    band_lead + m + 1 + row_block,
                                    c0:c0 + wb]
                                tB0 = rolledb_ref[
                                    :, band_lead + m:
                                    band_lead + m + row_block,
                                    c0:c0 + wb]
                                tB1 = rolledb_ref[
                                    :, band_lead + m + 1:
                                    band_lead + m + 1 + row_block,
                                    c0:c0 + wb]
                                acc_ref[:, :, c0:c0 + wb] = (
                                    acc_ref[:, :, c0:c0 + wb]
                                    + ((chA * cv0)[None] * tA0
                                       + (chA * cv1)[None] * tA1
                                       + (chB * cv0)[None] * tB0
                                       + (chB * cv1)[None] * tB1
                                       ).astype(acc_ref.dtype))
                        return
                    for mi, m in enumerate(range(-kv_max, kv_max + 2)):
                        @pl.when((m >= tmlo) & (m <= tmhi + 1))
                        def _(mi=mi, m=m, t=t, chA=chA, chB=chB):
                            c0 = t * wb
                            cv = cvs_ref[mi, :, c0:c0 + wb]
                            tA = rolled_ref[:, band_lead + m:
                                            band_lead + m + row_block,
                                            c0:c0 + wb]
                            tB = rolledb_ref[:, band_lead + m:
                                             band_lead + m + row_block,
                                             c0:c0 + wb]
                            acc_ref[:, :, c0:c0 + wb] = (
                                acc_ref[:, :, c0:c0 + wb]
                                + ((chA * cv)[None] * tA
                                   + (chB * cv)[None] * tB
                                   ).astype(acc_ref.dtype))

        if kpair:
            bandval = layer_ref[0, :, pl.ds(bs, band),
                                :].astype(rolled_ref.dtype)
            rolled_ref[:, :, :] = bandval
            rolledb_ref[:, :, :] = pltpu.roll(bandval, width - 1, axis=2)

            def kp_up(i, _):
                rungs_pair(2 * i)
                rolled_ref[:, :, :] = pltpu.roll(
                    rolled_ref[:, :, :], width - 2, axis=2)
                rolledb_ref[:, :, :] = pltpu.roll(
                    rolledb_ref[:, :, :], width - 2, axis=2)
                return 0

            # pairs (0,1), (2,3), ... cover rungs 0..gkhi; rungs past
            # gkhi (or below klo-1) carry all-zero masks, so the pair
            # over-coverage is safe (same argument as the single-rung
            # chains').
            jax.lax.fori_loop(0, (gkhi + 2) // 2, kp_up, 0)

            @pl.when(gklo - 1 < 0)
            def _():
                bandv2 = layer_ref[0, :, pl.ds(bs, band),
                                   :].astype(rolled_ref.dtype)
                rolledb_ref[:, :, :] = pltpu.roll(bandv2, 1, axis=2)
                rolled_ref[:, :, :] = pltpu.roll(bandv2, 2, axis=2)

            def kp_down(i, _):
                rungs_pair(-2 - 2 * i)
                rolled_ref[:, :, :] = pltpu.roll(rolled_ref[:, :, :], 2,
                                                 axis=2)
                rolledb_ref[:, :, :] = pltpu.roll(rolledb_ref[:, :, :],
                                                  2, axis=2)
                return 0

            # pairs (-2,-1), (-4,-3), ... cover rungs gklo-1..-1
            jax.lax.fori_loop(0, jnp.maximum(0, (2 - gklo) // 2),
                              kp_down, 0)
        else:
            rolled_ref[:, :, :] = layer_ref[0, :, pl.ds(bs, band),
                                            :].astype(rolled_ref.dtype)

            def k_up(i, _):
                rungs(i)
                if do_rolls:
                    rolled_ref[:, :, :] = pltpu.roll(
                        rolled_ref[:, :, :], width - 1, axis=2)
                return 0

            jax.lax.fori_loop(0, gkhi + 1, k_up, 0)

            @pl.when(gklo - 1 < 0)
            def _():
                rolled_ref[:, :, :] = layer_ref[
                    0, :, pl.ds(bs, band), :].astype(rolled_ref.dtype)

            def k_down(i, _):
                if do_rolls:
                    rolled_ref[:, :, :] = pltpu.roll(
                        rolled_ref[:, :, :], 1, axis=2)
                rungs(-1 - i)
                return 0

            jax.lax.fori_loop(0, jnp.maximum(0, 1 - gklo), k_down, 0)

        rgb = acc_ref[0:3, :, :].astype(jnp.float32)
        alpha = acc_ref[3:4, :, :].astype(jnp.float32)

        @pl.when(p == 0)
        def _():
            out_ref[:, pl.ds(base, row_block), :] = rgb

        @pl.when(p > 0)
        def _():
            prev = out_ref[:, pl.ds(base, row_block), :]
            out_ref[:, pl.ds(base, row_block), :] = (
                rgb * alpha + prev * (1.0 - alpha))
        return 0

    jax.lax.fori_loop(0, nblk, block_body, 0)


def _render_kernel_ftb(kt_ref, mt_ref, layer_hbm, u_ref, v_ref, out_ref,
                       band_ref, rolled_ref, cvs_ref, acc_ref, t_ref,
                       copy_sem, *, width: int, wb: int, cap: int,
                       row_block: int, kh_max: int, kv_max: int,
                       planes: int, eps: float, dyn_m: bool = False,
                       mpair: bool = False):
    """Block-major FRONT-TO-BACK ladder with early ray termination.

    Grid (NBLK,): each program renders one row block across ALL shells,
    walking planes nearest-first and accumulating
        out += rgb_p * a_p * T,   T *= (1 - a_p)
    (the farthest shell contributes rgb_0 * T with its alpha treated as
    1, matching projector.py:246-265 — algebraically identical to the
    back-to-front recurrence). Once every pixel of the block satisfies
    T < eps, the remaining (farther) shells cannot change the output by
    more than eps and the whole per-plane body — band convert, roll
    chains, rung FMA — is skipped; tiles are additionally culled
    individually by their own T maximum. eps=0 disables culling and
    reproduces the plane-major kernels' sums exactly up to f32
    compositing association.

    The layer stack arrives in ANY/HBM space; each program DMAs its own
    [P, 4, band, W] row band (BlockSpec windows cannot overlap, and
    neighbouring blocks share band rows)."""
    blk = pl.program_id(0)
    nt = width // wb if wb else 1
    wbw = wb if wb else width
    band_lead, band, pad = _band_geometry(cap, row_block, kv_max)
    # HBM row slices must be 8-aligned in offset AND extent (Mosaic);
    # the offset is aligned by _band_geometry's congruence, the extent
    # is rounded up (the caller's scratch + bounds account for band8).
    band8 = 8 * -(-band // 8)

    base_abs = cap + blk * row_block
    g0 = pl.multiple_of(base_abs - band_lead + pad, 8)
    cp = pltpu.make_async_copy(
        layer_hbm.at[:, :, pl.ds(g0, band8), :], band_ref, copy_sem)
    cp.start()

    j = jax.lax.broadcasted_iota(
        jnp.int32, (row_block, width), 1).astype(jnp.float32)
    i_abs = (jax.lax.broadcasted_iota(
        jnp.int32, (row_block, width), 0).astype(jnp.float32)
        + base_abs.astype(jnp.float32))

    out_ref[:, :, :] = jnp.zeros((3, row_block, width), jnp.float32)
    t_ref[:, :] = jnp.ones((row_block, width), jnp.float32)
    cp.wait()

    def plane_body(pi, alive):
        p = planes - 1 - pi

        @pl.when(alive > 0)
        def _():
            u = u_ref[p, :, :]
            v = v_ref[p, :, :]
            x0f = jnp.floor(u)
            fx = u - x0f
            dk_raw = (width - 1.0) - x0f - j
            dk = dk_raw - width * jnp.floor(
                (dk_raw + width / 2.0) / width)
            dk = jnp.clip(dk, -kh_max, kh_max)
            y0f = jnp.floor(v)
            fy = v - y0f
            dy = jnp.clip(y0f - i_abs, -kv_max, kv_max)

            bounds = [(_unpack2(kt_ref[p, blk, t]),
                       _unpack2(mt_ref[p, blk, t])) for t in range(nt)]
            talive = [jnp.max(t_ref[:, t * wbw:(t + 1) * wbw]) >= eps
                      for t in range(nt)]
            # rung/tap unions over ALIVE tiles only: tiles that
            # saturated early (pole-adjacent ones do, fast) stop
            # forcing long roll chains on the rest of the block.
            big = jnp.int32(1 << 14)
            gklo = functools.reduce(jnp.minimum, [
                jnp.where(talive[t], bounds[t][0][0], big)
                for t in range(nt)])
            gkhi = functools.reduce(jnp.maximum, [
                jnp.where(talive[t], bounds[t][0][1], -big)
                for t in range(nt)])
            gmlo = functools.reduce(jnp.minimum, [
                jnp.where(talive[t], bounds[t][1][0], big)
                for t in range(nt)])
            gmhi = functools.reduce(jnp.maximum, [
                jnp.where(talive[t], bounds[t][1][1], -big)
                for t in range(nt)])

            # mpair: widen the written range one level each side (the
            # pair regions read the partner level's zero coefficient —
            # see _render_kernel_tiled).
            mwid = 1 if mpair else 0
            for mi, m in enumerate(range(-kv_max, kv_max + 2)):
                @pl.when((m >= gmlo - mwid) & (m <= gmhi + 1 + mwid))
                def _(mi=mi, m=m):
                    cvs_ref[mi, :, :] = ((1.0 - fy) * (dy == m)
                                         + fy * (dy == m - 1))

            acc_ref[:, :, :] = jnp.zeros((4, row_block, width),
                                         acc_ref.dtype)

            def rungs(k):
                kf = k.astype(jnp.float32)
                for t in range(nt):
                    (tklo, tkhi), (tmlo, tmhi) = bounds[t]

                    @pl.when((k >= tklo - 1) & (k <= tkhi) & talive[t])
                    def _(t=t, tmlo=tmlo, tmhi=tmhi):
                        c0 = t * wbw
                        ch = ((1.0 - fx[:, c0:c0 + wbw])
                              * (dk[:, c0:c0 + wbw] == kf)
                              + fx[:, c0:c0 + wbw]
                              * (dk[:, c0:c0 + wbw] == kf + 1.0))
                        if dyn_m:
                            # perf_flags "dyn_m": runtime-sized m loop
                            # + dynamic sublane band slice instead of
                            # the static @pl.when cascade (see
                            # _render_kernel_tiled). Bit-identical
                            # ascending-m accumulation.
                            def m_body(m, _, t=t, ch=ch):
                                c0 = t * wbw
                                coef = ch * cvs_ref[
                                    pl.ds(m + kv_max, 1), :,
                                    c0:c0 + wbw][0]
                                tap = rolled_ref[
                                    :, pl.ds(band_lead + m,
                                             row_block),
                                    c0:c0 + wbw]
                                acc_ref[:, :, c0:c0 + wbw] = (
                                    acc_ref[:, :, c0:c0 + wbw]
                                    + (coef[None] * tap).astype(
                                        acc_ref.dtype))
                                return 0
                            jax.lax.fori_loop(tmlo, tmhi + 2,
                                              m_body, 0)
                            return
                        if mpair:
                            # perf_flags "mpair": two tap levels per
                            # region (see _render_kernel_tiled).
                            for mi, m in enumerate(range(-kv_max,
                                                         kv_max + 2)):
                                if mi % 2:
                                    continue

                                @pl.when((m + 1 >= tmlo)
                                         & (m <= tmhi + 1))
                                def _(mi=mi, m=m, t=t, ch=ch):
                                    c0 = t * wbw
                                    coef0 = ch * cvs_ref[
                                        mi, :, c0:c0 + wbw]
                                    tap0 = rolled_ref[
                                        :, band_lead + m:
                                        band_lead + m + row_block,
                                        c0:c0 + wbw]
                                    coef1 = ch * cvs_ref[
                                        mi + 1, :, c0:c0 + wbw]
                                    tap1 = rolled_ref[
                                        :, band_lead + m + 1:
                                        band_lead + m + 1
                                        + row_block,
                                        c0:c0 + wbw]
                                    acc_ref[:, :, c0:c0 + wbw] = (
                                        acc_ref[:, :, c0:c0 + wbw]
                                        + (coef0[None] * tap0
                                           + coef1[None] * tap1
                                           ).astype(acc_ref.dtype))
                            return
                        for mi, m in enumerate(range(-kv_max,
                                                     kv_max + 2)):
                            @pl.when((m >= tmlo) & (m <= tmhi + 1))
                            def _(mi=mi, m=m, t=t, ch=ch):
                                c0 = t * wbw
                                coef = ch * cvs_ref[mi, :,
                                                    c0:c0 + wbw]
                                tap = rolled_ref[
                                    :, band_lead + m:
                                    band_lead + m + row_block,
                                    c0:c0 + wbw]
                                acc_ref[:, :, c0:c0 + wbw] = (
                                    acc_ref[:, :, c0:c0 + wbw]
                                    + (coef[None] * tap).astype(
                                        acc_ref.dtype))

            rolled_ref[:, :, :] = band_ref[p].astype(jnp.float32)

            def k_up(i, _):
                rungs(i)
                rolled_ref[:, :, :] = pltpu.roll(rolled_ref[:, :, :],
                                                 width - 1, axis=2)
                return 0

            jax.lax.fori_loop(0, gkhi + 1, k_up, 0)

            @pl.when(gklo - 1 < 0)
            def _():
                rolled_ref[:, :, :] = band_ref[p].astype(jnp.float32)

            def k_down(i, _):
                rolled_ref[:, :, :] = pltpu.roll(rolled_ref[:, :, :],
                                                 1, axis=2)
                rungs(-1 - i)
                return 0

            jax.lax.fori_loop(0, jnp.maximum(0, 1 - gklo), k_down, 0)

            rgb_w = acc_ref[0:3, :, :].astype(jnp.float32)
            a_w = acc_ref[3, :, :].astype(jnp.float32)
            trans = t_ref[:, :]

            @pl.when(p > 0)
            def _():
                out_ref[:, :, :] = (out_ref[:, :, :]
                                    + rgb_w * (a_w * trans)[None])
                t_ref[:, :] = trans * (1.0 - a_w)

            @pl.when(p == 0)
            def _():
                # farthest shell: alpha treated as 1
                out_ref[:, :, :] = out_ref[:, :, :] + rgb_w * trans[None]

        return jnp.where(alive > 0,
                         (jnp.max(t_ref[:, :]) >= eps).astype(jnp.int32),
                         0)

    jax.lax.fori_loop(0, planes, plane_body, jnp.int32(1))


def _render_kernel_ftbb(kt_ref, mt_ref, fg_hbm, bg_hbm, pred_hbm,
                        u_ref, v_ref, out_ref,
                        fgb_ref, bgb_ref, blb_ref, alb_ref, bandf_ref,
                        rolled_ref, cvs_ref, acc_ref, t_ref, vtap_ref,
                        *rest,
                        width: int, wb: int, cap: int, row_block: int,
                        kh_max: int, kv_max: int, planes: int,
                        eps: float, vpad: int, depth: bool = False,
                        vtap: bool = False, dyn_m: bool = False,
                        mpair: bool = False, kpair: bool = False):
    """FTB ladder with the ASSEMBLE BLEND fused in (blend_psv scheme).

    depth=True renders the depth proxy instead: rgb is the constant
    p/planes per shell (msi.render_equirect_depth_from_prepared's
    identity), only the alpha prediction is DMA'd, and the fg/bg
    volumes are never touched.

    Reads the sweep kernel's flipped plane-major volumes fgP/bgP
    ([P, 3, H + 2*vpad, W], ANY) and the net prediction ([K, H, W] f32
    channel-major, ANY: blend channel p, alpha channel planes + p) and
    blends rgb = w*fg + (1-w)*bg, a = (pa+1)/2 per plane band in VMEM —
    the [P, 4, H+2*pad, W] `prepared` stack is never materialized in
    HBM (it cost a 58 MB write + read per frame at 640x320x32, plus the
    assemble pass that built it). Requires cap >= band_lead and
    kv_max + 1 <= cap so every band stays inside [0, H) (the caller
    asserts; production geometry satisfies both). Per-plane band DMAs
    are double-buffered across the front-to-back plane walk; compute is
    culled exactly like _render_kernel_ftb."""
    if kpair:
        assert not vtap and not dyn_m, "kpair composes only with mpair"
        rolledb_ref, sems = rest
    else:
        (sems,) = rest
    blk = pl.program_id(0)
    nt = width // wb if wb else 1
    wbw = wb if wb else width
    band_lead, band, _ = _band_geometry(cap, row_block, kv_max)
    # 8-aligned band extent (Mosaic HBM slice rule); the caller asserts
    # the bounds (kv_max + 1 + (band8 - band) <= cap).
    band8 = 8 * -(-band // 8)

    base_abs = cap + blk * row_block
    g0u = base_abs - band_lead          # unpadded band start, >= 0
    g0 = pl.multiple_of(g0u + vpad, 8)  # into the vpad-padded volumes

    def start(pi, slot):
        p = planes - 1 - pi
        if not depth:
            pltpu.make_async_copy(
                fg_hbm.at[pl.ds(p, 1), :, pl.ds(g0, band8), :],
                fgb_ref.at[pl.ds(slot, 1)], sems.at[slot, 0]).start()
            pltpu.make_async_copy(
                bg_hbm.at[pl.ds(p, 1), :, pl.ds(g0, band8), :],
                bgb_ref.at[pl.ds(slot, 1)], sems.at[slot, 1]).start()
            pltpu.make_async_copy(
                pred_hbm.at[pl.ds(p, 1), pl.ds(g0u, band8), :],
                blb_ref.at[slot], sems.at[slot, 2]).start()
        pltpu.make_async_copy(
            pred_hbm.at[pl.ds(planes + p, 1), pl.ds(g0u, band8), :],
            alb_ref.at[slot], sems.at[slot, 3]).start()

    def wait(slot):
        # byte-count-matching self-descriptors (net-kernel wait pattern)
        if not depth:
            pltpu.make_async_copy(fgb_ref.at[pl.ds(slot, 1)],
                                  fgb_ref.at[pl.ds(slot, 1)],
                                  sems.at[slot, 0]).wait()
            pltpu.make_async_copy(bgb_ref.at[pl.ds(slot, 1)],
                                  bgb_ref.at[pl.ds(slot, 1)],
                                  sems.at[slot, 1]).wait()
            pltpu.make_async_copy(blb_ref.at[slot], blb_ref.at[slot],
                                  sems.at[slot, 2]).wait()
        pltpu.make_async_copy(alb_ref.at[slot], alb_ref.at[slot],
                              sems.at[slot, 3]).wait()

    j = jax.lax.broadcasted_iota(
        jnp.int32, (row_block, width), 1).astype(jnp.float32)
    i_abs = (jax.lax.broadcasted_iota(
        jnp.int32, (row_block, width), 0).astype(jnp.float32)
        + base_abs.astype(jnp.float32))

    out_ref[:, :, :] = jnp.zeros((3, row_block, width), jnp.float32)
    t_ref[:, :] = jnp.ones((row_block, width), jnp.float32)
    start(0, 0)

    def plane_body(pi, carry):
        # carry: (alive, started) — started tracks whether THIS plane's
        # band copy was issued (prefetch is gated on liveness, so dead
        # blocks stop paying DMA for the remaining far shells; waits
        # must mirror the gate exactly for semaphore hygiene).
        alive, started = carry
        p = planes - 1 - pi
        slot = jax.lax.rem(pi, 2)

        @pl.when((alive > 0) & (pi + 1 < planes))
        def _():
            start(pi + 1, 1 - slot)

        @pl.when(started > 0)
        def _():
            wait(slot)

        @pl.when(alive > 0)
        def _():
            # fused assemble: blend the band in f32 (blend_psv math,
            # msi.py:108-273 / assemble_rgba_prepared)
            alw = (alb_ref[slot, 0, :, :] + 1.0) * 0.5
            if depth:
                val = p.astype(jnp.float32) / float(planes)
                bandf_ref[0:3, :, :] = (jnp.full(
                    (3, band8, width), 0.0, jnp.float32) + val).astype(
                        bandf_ref.dtype)
            else:
                blw = (blb_ref[slot, 0, :, :] + 1.0) * 0.5  # [band8, W]
                fg = fgb_ref[slot].astype(jnp.float32)
                bg = bgb_ref[slot].astype(jnp.float32)
                bandf_ref[0:3, :, :] = (blw[None] * fg
                                        + (1.0 - blw[None]) * bg
                                        ).astype(bandf_ref.dtype)
            bandf_ref[3, :, :] = alw.astype(bandf_ref.dtype)

            u = u_ref[p, :, :]
            v = v_ref[p, :, :]
            x0f = jnp.floor(u)
            fx = u - x0f
            dk_raw = (width - 1.0) - x0f - j
            dk = dk_raw - width * jnp.floor(
                (dk_raw + width / 2.0) / width)
            dk = jnp.clip(dk, -kh_max, kh_max)
            y0f = jnp.floor(v)
            fy = v - y0f
            dy = jnp.clip(y0f - i_abs, -kv_max, kv_max)

            bounds = [(_unpack2(kt_ref[p, blk, t]),
                       _unpack2(mt_ref[p, blk, t])) for t in range(nt)]
            talive = [jnp.max(t_ref[:, t * wbw:(t + 1) * wbw]) >= eps
                      for t in range(nt)]
            big = jnp.int32(1 << 14)
            gklo = functools.reduce(jnp.minimum, [
                jnp.where(talive[t], bounds[t][0][0], big)
                for t in range(nt)])
            gkhi = functools.reduce(jnp.maximum, [
                jnp.where(talive[t], bounds[t][0][1], -big)
                for t in range(nt)])
            gmlo = functools.reduce(jnp.minimum, [
                jnp.where(talive[t], bounds[t][1][0], big)
                for t in range(nt)])
            gmhi = functools.reduce(jnp.maximum, [
                jnp.where(talive[t], bounds[t][1][1], -big)
                for t in range(nt)])

            # mpair: widen the written range one level each side (the
            # pair regions read the partner level's zero coefficient —
            # see _render_kernel_tiled).
            mwid = 1 if mpair else 0
            for mi, m in enumerate(range(-kv_max, kv_max + 2)):
                @pl.when((m >= gmlo - mwid) & (m <= gmhi + 1 + mwid))
                def _(mi=mi, m=m):
                    cvs_ref[mi, :, :] = ((1.0 - fy) * (dy == m)
                                         + fy * (dy == m - 1))

            acc_ref[:, :, :] = jnp.zeros((4, row_block, width),
                                         acc_ref.dtype)

            def rungs(k):
                kf = k.astype(jnp.float32)
                if vtap:
                    # perf_flags "vtap": vertical pre-blend once per
                    # rung, then ONE ch-weighted FMA per active tile
                    # (see _render_kernel_tiled docstring).
                    @pl.when((k >= gklo - 1) & (k <= gkhi))
                    def _():
                        vtap_ref[:, :, :] = jnp.zeros(
                            (4, row_block, width), vtap_ref.dtype)
                        for mi, m in enumerate(range(-kv_max,
                                                     kv_max + 2)):
                            @pl.when((m >= gmlo) & (m <= gmhi + 1))
                            def _(mi=mi, m=m):
                                vtap_ref[:, :, :] = (
                                    vtap_ref[:, :, :]
                                    + cvs_ref[mi, :, :][None]
                                    * rolled_ref[
                                        :, band_lead + m:
                                        band_lead + m + row_block, :])
                        for t in range(nt):
                            (tklo, tkhi), _tm = bounds[t]

                            @pl.when((k >= tklo - 1) & (k <= tkhi)
                                     & talive[t])
                            def _(t=t):
                                c0 = t * wbw
                                ch = ((1.0 - fx[:, c0:c0 + wbw])
                                      * (dk[:, c0:c0 + wbw] == kf)
                                      + fx[:, c0:c0 + wbw]
                                      * (dk[:, c0:c0 + wbw]
                                         == kf + 1.0))
                                acc_ref[:, :, c0:c0 + wbw] = (
                                    acc_ref[:, :, c0:c0 + wbw]
                                    + (ch[None]
                                       * vtap_ref[:, :, c0:c0 + wbw]
                                       ).astype(acc_ref.dtype))
                    return
                for t in range(nt):
                    (tklo, tkhi), (tmlo, tmhi) = bounds[t]

                    @pl.when((k >= tklo - 1) & (k <= tkhi) & talive[t])
                    def _(t=t, tmlo=tmlo, tmhi=tmhi):
                        c0 = t * wbw
                        ch = ((1.0 - fx[:, c0:c0 + wbw])
                              * (dk[:, c0:c0 + wbw] == kf)
                              + fx[:, c0:c0 + wbw]
                              * (dk[:, c0:c0 + wbw] == kf + 1.0))
                        if dyn_m:
                            # perf_flags "dyn_m": runtime-sized m loop
                            # + dynamic sublane band slice instead of
                            # the static @pl.when cascade (see
                            # _render_kernel_tiled). Bit-identical
                            # ascending-m accumulation.
                            def m_body(m, _, t=t, ch=ch):
                                c0 = t * wbw
                                coef = ch * cvs_ref[
                                    pl.ds(m + kv_max, 1), :,
                                    c0:c0 + wbw][0]
                                tap = rolled_ref[
                                    :, pl.ds(band_lead + m,
                                             row_block),
                                    c0:c0 + wbw]
                                acc_ref[:, :, c0:c0 + wbw] = (
                                    acc_ref[:, :, c0:c0 + wbw]
                                    + (coef[None] * tap).astype(
                                        acc_ref.dtype))
                                return 0
                            jax.lax.fori_loop(tmlo, tmhi + 2,
                                              m_body, 0)
                            return
                        if mpair:
                            # perf_flags "mpair": two tap levels per
                            # region (see _render_kernel_tiled).
                            for mi, m in enumerate(range(-kv_max,
                                                         kv_max + 2)):
                                if mi % 2:
                                    continue

                                @pl.when((m + 1 >= tmlo)
                                         & (m <= tmhi + 1))
                                def _(mi=mi, m=m, t=t, ch=ch):
                                    c0 = t * wbw
                                    coef0 = ch * cvs_ref[
                                        mi, :, c0:c0 + wbw]
                                    tap0 = rolled_ref[
                                        :, band_lead + m:
                                        band_lead + m + row_block,
                                        c0:c0 + wbw]
                                    coef1 = ch * cvs_ref[
                                        mi + 1, :, c0:c0 + wbw]
                                    tap1 = rolled_ref[
                                        :, band_lead + m + 1:
                                        band_lead + m + 1
                                        + row_block,
                                        c0:c0 + wbw]
                                    acc_ref[:, :, c0:c0 + wbw] = (
                                        acc_ref[:, :, c0:c0 + wbw]
                                        + (coef0[None] * tap0
                                           + coef1[None] * tap1
                                           ).astype(acc_ref.dtype))
                            return
                        for mi, m in enumerate(range(-kv_max,
                                                     kv_max + 2)):
                            @pl.when((m >= tmlo) & (m <= tmhi + 1))
                            def _(mi=mi, m=m, t=t, ch=ch):
                                c0 = t * wbw
                                coef = ch * cvs_ref[mi, :,
                                                    c0:c0 + wbw]
                                tap = rolled_ref[
                                    :, band_lead + m:
                                    band_lead + m + row_block,
                                    c0:c0 + wbw]
                                acc_ref[:, :, c0:c0 + wbw] = (
                                    acc_ref[:, :, c0:c0 + wbw]
                                    + (coef[None] * tap).astype(
                                        acc_ref.dtype))

            def rungs_pair(k):
                """kpair: rungs k (rolled_ref) and k+1 (rolledb_ref)
                under one set of tile/m-region branch tests (see
                _render_kernel_tiled)."""
                kfA = k.astype(jnp.float32)
                kfB = kfA + 1.0
                for t in range(nt):
                    (tklo, tkhi), (tmlo, tmhi) = bounds[t]

                    @pl.when((k + 1 >= tklo - 1) & (k <= tkhi)
                             & talive[t])
                    def _(t=t, tmlo=tmlo, tmhi=tmhi):
                        c0 = t * wbw
                        fxt = fx[:, c0:c0 + wbw]
                        dkt = dk[:, c0:c0 + wbw]
                        chA = ((1.0 - fxt) * (dkt == kfA)
                               + fxt * (dkt == kfA + 1.0))
                        chB = ((1.0 - fxt) * (dkt == kfB)
                               + fxt * (dkt == kfB + 1.0))
                        if mpair:
                            for mi, m in enumerate(range(-kv_max,
                                                         kv_max + 2)):
                                if mi % 2:
                                    continue

                                @pl.when((m + 1 >= tmlo)
                                         & (m <= tmhi + 1))
                                def _(mi=mi, m=m, t=t, chA=chA,
                                      chB=chB):
                                    c0 = t * wbw
                                    cv0 = cvs_ref[mi, :, c0:c0 + wbw]
                                    cv1 = cvs_ref[mi + 1, :,
                                                  c0:c0 + wbw]
                                    tA0 = rolled_ref[
                                        :, band_lead + m:
                                        band_lead + m + row_block,
                                        c0:c0 + wbw]
                                    tA1 = rolled_ref[
                                        :, band_lead + m + 1:
                                        band_lead + m + 1 + row_block,
                                        c0:c0 + wbw]
                                    tB0 = rolledb_ref[
                                        :, band_lead + m:
                                        band_lead + m + row_block,
                                        c0:c0 + wbw]
                                    tB1 = rolledb_ref[
                                        :, band_lead + m + 1:
                                        band_lead + m + 1 + row_block,
                                        c0:c0 + wbw]
                                    acc_ref[:, :, c0:c0 + wbw] = (
                                        acc_ref[:, :, c0:c0 + wbw]
                                        + ((chA * cv0)[None] * tA0
                                           + (chA * cv1)[None] * tA1
                                           + (chB * cv0)[None] * tB0
                                           + (chB * cv1)[None] * tB1
                                           ).astype(acc_ref.dtype))
                            return
                        for mi, m in enumerate(range(-kv_max,
                                                     kv_max + 2)):
                            @pl.when((m >= tmlo) & (m <= tmhi + 1))
                            def _(mi=mi, m=m, t=t, chA=chA, chB=chB):
                                c0 = t * wbw
                                cv = cvs_ref[mi, :, c0:c0 + wbw]
                                tA = rolled_ref[
                                    :, band_lead + m:
                                    band_lead + m + row_block,
                                    c0:c0 + wbw]
                                tB = rolledb_ref[
                                    :, band_lead + m:
                                    band_lead + m + row_block,
                                    c0:c0 + wbw]
                                acc_ref[:, :, c0:c0 + wbw] = (
                                    acc_ref[:, :, c0:c0 + wbw]
                                    + ((chA * cv)[None] * tA
                                       + (chB * cv)[None] * tB
                                       ).astype(acc_ref.dtype))

            if kpair:
                rolled_ref[:, :, :] = bandf_ref[:, :, :]
                rolledb_ref[:, :, :] = pltpu.roll(
                    bandf_ref[:, :, :], width - 1, axis=2)

                def kp_up(i, _):
                    rungs_pair(2 * i)
                    rolled_ref[:, :, :] = pltpu.roll(
                        rolled_ref[:, :, :], width - 2, axis=2)
                    rolledb_ref[:, :, :] = pltpu.roll(
                        rolledb_ref[:, :, :], width - 2, axis=2)
                    return 0

                jax.lax.fori_loop(0, (gkhi + 2) // 2, kp_up, 0)

                @pl.when(gklo - 1 < 0)
                def _():
                    rolledb_ref[:, :, :] = pltpu.roll(
                        bandf_ref[:, :, :], 1, axis=2)
                    rolled_ref[:, :, :] = pltpu.roll(
                        bandf_ref[:, :, :], 2, axis=2)

                def kp_down(i, _):
                    rungs_pair(-2 - 2 * i)
                    rolled_ref[:, :, :] = pltpu.roll(
                        rolled_ref[:, :, :], 2, axis=2)
                    rolledb_ref[:, :, :] = pltpu.roll(
                        rolledb_ref[:, :, :], 2, axis=2)
                    return 0

                jax.lax.fori_loop(0, jnp.maximum(0, (2 - gklo) // 2),
                                  kp_down, 0)
            else:
                rolled_ref[:, :, :] = bandf_ref[:, :, :]

                def k_up(i, _):
                    rungs(i)
                    rolled_ref[:, :, :] = pltpu.roll(
                        rolled_ref[:, :, :], width - 1, axis=2)
                    return 0

                jax.lax.fori_loop(0, gkhi + 1, k_up, 0)

                @pl.when(gklo - 1 < 0)
                def _():
                    rolled_ref[:, :, :] = bandf_ref[:, :, :]

                def k_down(i, _):
                    rolled_ref[:, :, :] = pltpu.roll(
                        rolled_ref[:, :, :], 1, axis=2)
                    rungs(-1 - i)
                    return 0

                jax.lax.fori_loop(0, jnp.maximum(0, 1 - gklo),
                                  k_down, 0)

            rgb_w = acc_ref[0:3, :, :].astype(jnp.float32)
            a_w = acc_ref[3, :, :].astype(jnp.float32)
            trans = t_ref[:, :]

            @pl.when(p > 0)
            def _():
                out_ref[:, :, :] = (out_ref[:, :, :]
                                    + rgb_w * (a_w * trans)[None])
                t_ref[:, :] = trans * (1.0 - a_w)

            @pl.when(p == 0)
            def _():
                out_ref[:, :, :] = out_ref[:, :, :] + rgb_w * trans[None]

        newalive = jnp.where(
            alive > 0,
            (jnp.max(t_ref[:, :]) >= eps).astype(jnp.int32), 0)
        return (newalive, alive)   # next plane's copy issued iff alive

    jax.lax.fori_loop(0, planes, plane_body,
                      (jnp.int32(1), jnp.int32(1)))


@functools.partial(jax.jit, static_argnames=("cap", "row_block", "kh_max",
                                             "kv_max", "wb", "eps",
                                             "vpad", "depth",
                                             "interpret", "vtap",
                                             "roll16", "dyn_m",
                                             "mpair", "kpair"))
def _ladder_render_mid_ftbb(fgP: Array, bgP: Array, pred: Array,
                            u: Array, v: Array, cap: int,
                            row_block: int, kh_max: int, kv_max: int,
                            wb: int = None, eps: float = 1e-6,
                            vpad: int = 0, depth: bool = False,
                            interpret: bool = False,
                            vtap: bool = None,
                            roll16: bool = None,
                            dyn_m: bool = None,
                            mpair: bool = None,
                            kpair: bool = None) -> Array:
    """Blend-fused FTB mid render. fgP/bgP: [P, 3, H + 2*vpad, W]
    flipped plane-major sweep volumes; pred: [H, 2P(+extra), W] f32
    flipped row-major net output (blend_psv layout: blend ch p, alpha
    ch P+p); u, v: [P, Hm, W] f32. Returns [Hm, W, 3]."""
    p = fgP.shape[0]
    w = fgP.shape[3]
    hm = u.shape[1]
    h = hm + 2 * cap
    band_lead, band, _ = _band_geometry(cap, row_block, kv_max)
    band8 = 8 * -(-band // 8)
    assert cap >= band_lead and kv_max + 1 + (band8 - band) <= cap, (
        "band8 would leave [0, H)", cap, band_lead, kv_max, band8, band)
    assert fgP.shape[2] == h + 2 * vpad, (fgP.shape, h, vpad)
    assert (h - cap - row_block) - band_lead + vpad + band8 \
        <= h + 2 * vpad, ("fg band8 overrun", band8, vpad)
    mv = 2 * kv_max + 2
    if wb is not None:
        assert w % wb == 0 and wb % 128 == 0, (w, wb)
    nblk = hm // row_block

    klo, khi, mlo, mhi = _residual_tables(
        u, v, cap, row_block, kh_max, kv_max, wb=wb)
    kt, mt = _pack_tables(klo, khi, mlo, mhi)
    if wb is None:
        kt = kt[..., None]
        mt = mt[..., None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((p, row_block, w), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, row_block, w), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, row_block, w), lambda i, *_: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 3, band8, w), fgP.dtype),
            pltpu.VMEM((2, 3, band8, w), bgP.dtype),
            pltpu.VMEM((2, 1, band8, w), jnp.float32),
            pltpu.VMEM((2, 1, band8, w), jnp.float32),
            # roll16: blended band + roll chain in the sweep-volume
            # storage dtype (the same bf16 rounding the prepared stack
            # applies in HBM); f32 otherwise.
            pltpu.VMEM((4, band8, w),
                       fgP.dtype if roll16 else jnp.float32),
            pltpu.VMEM((4, band8, w),
                       fgP.dtype if roll16 else jnp.float32),
            pltpu.VMEM((mv, row_block, w), jnp.float32),
            pltpu.VMEM((4, row_block, w), jnp.float32),
            pltpu.VMEM((row_block, w), jnp.float32),
            pltpu.VMEM((4, row_block, w), jnp.float32),
        ] + ([pltpu.VMEM((4, band8, w),
                         fgP.dtype if roll16 else jnp.float32)]
             if kpair else [])
          + [pltpu.SemaphoreType.DMA((2, 4))],
    )
    vtap = bool(vtap)   # None == False; wrappers resolve the defaults
    out = pl.pallas_call(
        functools.partial(_render_kernel_ftbb, width=w, wb=wb, cap=cap,
                          row_block=row_block, kh_max=kh_max,
                          kv_max=kv_max, planes=p, eps=eps, vpad=vpad,
                          depth=depth, vtap=vtap, dyn_m=bool(dyn_m),
                          mpair=bool(mpair), kpair=bool(kpair)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, hm, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(kt, mt, fgP, bgP,
      # [K, H, W]: the per-plane channel slices must ride the UNtiled
      # leading dim (Mosaic rejects extent-1 slices of the tiled K dim)
      jnp.transpose(pred, (1, 0, 2)), u, v)
    return jnp.transpose(out, (1, 2, 0))


def blend_fused_supported(h: int, w: int, cap: int = CAP_ROWS,
                          row_block: int = ROW_BLOCK) -> bool:
    """Static predicate for the blend-fused FTB path: the shape must fit
    the ladder AND every band must stay inside [0, H) (cap >= band_lead
    and kv_max + 1 <= cap — true for the production geometry)."""
    if not shape_supported(h, w, 4, cap, row_block, True):
        return False
    geom = prepared_geometry(h, w, cap, row_block)
    band_lead, band, _ = _band_geometry(cap, row_block, geom["kv_max"])
    band8 = 8 * -(-band // 8)
    return (cap >= band_lead
            and geom["kv_max"] + 1 + (band8 - band) <= cap)


def render_mid_fused_blend(fgP: Array, bgP: Array, pred: Array,
                           u: Array, v: Array, vpad: int,
                           cap: int = CAP_ROWS,
                           row_block: int = ROW_BLOCK,
                           kh_max: int = None, kv_max: int = None,
                           wb="auto", depth: bool = False,
                           interpret: bool = False,
                           vtap: bool = None,
                           roll16: bool = None,
                           dyn_m: bool = None,
                           mpair: bool = None,
                           kpair: bool = None) -> Array:
    """Blend-fused FTB mid render from the sweep kernel's planar
    volumes + the net's flipped row-major prediction (blend_psv).
    fgP/bgP: [P, 3, H + 2*vpad, W]; pred: [H, K, W] f32 (hkwF);
    u, v: [P, H, W] full height. Returns [H - 2*cap, W, 3]."""
    h = u.shape[1]
    w = fgP.shape[3]
    geom = prepared_geometry(h, w, cap, row_block)
    kh_max = geom["kh_max"] if kh_max is None else kh_max
    kv_max = geom["kv_max"] if kv_max is None else kv_max
    if wb == "auto":
        wb = default_wb(w)
    vtap = DEFAULT_VTAP if vtap is None else vtap
    dyn_m = DEFAULT_DYN_M if dyn_m is None else dyn_m
    kpair = DEFAULT_KPAIR if kpair is None else kpair
    if vtap or dyn_m:
        kpair = False       # alternative rung forms take precedence
    return _ladder_render_mid_ftbb(
        fgP, bgP, pred,
        u[:, cap:h - cap].astype(jnp.float32),
        v[:, cap:h - cap].astype(jnp.float32),
        cap, row_block, kh_max, kv_max, wb=wb, eps=FTB_EPS,
        vpad=vpad, depth=depth, interpret=interpret,
        vtap=vtap,
        roll16=DEFAULT_ROLL16 if roll16 is None else roll16,
        dyn_m=dyn_m,
        mpair=DEFAULT_MPAIR if mpair is None else mpair,
        kpair=kpair)


@functools.partial(jax.jit, static_argnames=("cap", "row_block", "kh_max",
                                             "kv_max", "wb", "eps",
                                             "interpret"))
def _ladder_render_mid_ftb(layers_flipped_padded: Array, u: Array,
                           v: Array, cap: int, row_block: int,
                           kh_max: int, kv_max: int, wb: int = None,
                           eps: float = 1e-6,
                           interpret: bool = False) -> Array:
    """Front-to-back block-major twin of _ladder_render_mid_uv. Same
    operand layouts; compositing matches up to f32 association plus an
    eps-bounded truncation of fully-saturated rays (eps=0 -> none)."""
    p, c, hpad, w = layers_flipped_padded.shape
    hm = u.shape[1]
    assert c == 4 and hm % row_block == 0, (c, hm, row_block)
    band_lead, band, pad = _band_geometry(cap, row_block, kv_max)
    band8 = 8 * -(-band // 8)
    assert hpad == (hm + 2 * cap) + 2 * pad, (hpad, hm, cap, pad)
    # last block's 8-aligned band superset must stay inside the padded
    # stack: g0_last + band8 <= hpad
    assert (cap + hm - row_block) - band_lead + pad + band8 <= hpad, (
        "band8 overruns the padded stack", band8, pad, hpad)
    mv = 2 * kv_max + 2
    if wb is not None:
        assert w % wb == 0 and wb % 128 == 0, (w, wb)
    nblk = hm // row_block

    klo, khi, mlo, mhi = _residual_tables(
        u, v, cap, row_block, kh_max, kv_max, wb=wb)
    kt, mt = _pack_tables(klo, khi, mlo, mhi)
    if wb is None:
        kt = kt[..., None]
        mt = mt[..., None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((p, row_block, w), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, row_block, w), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, row_block, w), lambda i, *_: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((p, 4, band8, w), layers_flipped_padded.dtype),
            pltpu.VMEM((4, band8, w), jnp.float32),
            pltpu.VMEM((mv, row_block, w), jnp.float32),
            pltpu.VMEM((4, row_block, w), jnp.float32),
            pltpu.VMEM((row_block, w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_render_kernel_ftb, width=w, wb=wb, cap=cap,
                          row_block=row_block, kh_max=kh_max,
                          kv_max=kv_max, planes=p, eps=eps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, hm, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(kt, mt, layers_flipped_padded, u, v)
    return jnp.transpose(out, (1, 2, 0))


@functools.partial(jax.jit, static_argnames=("cap", "row_block", "kh_max",
                                             "kv_max", "wb", "interpret",
                                             "parts", "vtap", "roll16",
                                             "dyn_m", "mpair", "kpair"))
def _ladder_render_mid_uv(layers_flipped_padded: Array, u: Array, v: Array,
                          cap: int, row_block: int, kh_max: int,
                          kv_max: int, wb: int = None,
                          interpret: bool = False,
                          parts: str = "all",
                          vtap: bool = None,
                          roll16: bool = None,
                          dyn_m: bool = None,
                          mpair: bool = None,
                          kpair: bool = None) -> Array:
    """layers_flipped_padded: [P, 4, H+2*pad, W]; u, v: [P, Hm, W] f32
    (separate operands — no stacked uv field is ever materialized).
    wb: column-tile width (None = full-width blocks). Returns the
    composited mid rows [Hm, W, 3]."""
    p, c, hpad, w = layers_flipped_padded.shape
    hm = u.shape[1]
    assert c == 4 and hm % row_block == 0, (c, hm, row_block)
    band_lead, band, pad = _band_geometry(cap, row_block, kv_max)
    assert hpad == (hm + 2 * cap) + 2 * pad, (hpad, hm, cap, pad)
    mv = 2 * kv_max + 2
    if wb is not None:
        assert w % wb == 0 and wb % 128 == 0, (w, wb)

    klo, khi, mlo, mhi = _residual_tables(
        u, v, cap, row_block, kh_max, kv_max, wb=wb)
    if wb is None:
        tables = (klo, khi, mlo, mhi)
    else:
        tables = _pack_tables(klo, khi, mlo, mhi)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(tables),
        grid=(p,),
        in_specs=[
            pl.BlockSpec((1, 4, hpad, w), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hm, w), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hm, w), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, hm, w), lambda i, *_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            # roll16: the rolled band stays in the layer storage dtype
            # (the bf16->f32 band upcast is deferred to the tap FMA).
            pltpu.VMEM((4, band, w),
                       layers_flipped_padded.dtype if roll16
                       else jnp.float32),
            pltpu.VMEM((mv, row_block, w), jnp.float32),
            # f32 accumulator: a bf16 accumulator (tried) halves the
            # read-modify-write traffic but the per-FMA mixed-dtype
            # converts made the kernel NET SLOWER (54.7 -> 52.0 fps
            # e2e) — and costs the bit-close-to-gather guarantee.
            pltpu.VMEM((4, row_block, w), jnp.float32),
        ] + ([pltpu.VMEM((4, row_block, w), jnp.float32)]
             if wb is not None else [])
          + ([pltpu.VMEM((4, band, w),
                         layers_flipped_padded.dtype if roll16
                         else jnp.float32)]
             if (wb is not None and kpair) else []),
    )
    # None == False here (NOT DEFAULT_VTAP/_ROLL16: this function is
    # jitted on static flags, so a module-global read would bake the
    # import-time value into the trace cache); the non-jitted wrappers
    # (render_mid_prepared_cf / render_mid_fused_blend) resolve the
    # armed defaults.
    vtap = bool(vtap)
    if wb is None:
        kern = functools.partial(_render_kernel, h_mid=hm, width=w,
                                 cap=cap, row_block=row_block,
                                 kh_max=kh_max, kv_max=kv_max)
    else:
        kern = functools.partial(_render_kernel_tiled, h_mid=hm, width=w,
                                 wb=wb, cap=cap, row_block=row_block,
                                 kh_max=kh_max, kv_max=kv_max,
                                 parts=parts, vtap=vtap,
                                 dyn_m=bool(dyn_m), mpair=bool(mpair),
                                 kpair=bool(kpair))
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, hm, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*tables, layers_flipped_padded, u, v)
    return jnp.transpose(out, (1, 2, 0))


def _ladder_render_mid(layers_flipped_padded: Array, uvm: Array,
                       cap: int, row_block: int, kh_max: int, kv_max: int,
                       wb: int = None,
                       interpret: bool = False) -> Array:
    """Stacked-uv compatibility wrapper: uvm [P, 2, Hm, W]."""
    return _ladder_render_mid_uv(layers_flipped_padded, uvm[:, 0],
                                 uvm[:, 1], cap, row_block, kh_max,
                                 kv_max, wb=wb, interpret=interpret)


@functools.partial(jax.jit, static_argnames=(
    "abs_row0", "row_block", "kh_max", "kv_max", "cache_cvs",
    "interpret"))
def _ladder_render_chunk(layer_band: Array, uvm_chunk: Array,
                         abs_row0: int, row_block: int, kh_max: int,
                         kv_max: int, cache_cvs: bool = True,
                         interpret: bool = False) -> Array:
    """One chunk of output rows from layer row BANDS (the high-res
    entry: VMEM is bounded by the band height, not the image height).

    layer_band: [P, 4, bandH, W] where row 0 holds global image row
    (abs_row0 - band_lead); uvm_chunk: [P, 2, nr, W] for output rows
    [abs_row0, abs_row0 + nr). Returns [nr, W, 3]."""
    p, c, bandh, w = layer_band.shape
    nr = uvm_chunk.shape[2]
    band_lead, band, _ = _band_geometry(0, row_block, kv_max)
    assert c == 4 and nr % row_block == 0, (c, nr, row_block)
    assert bandh == band_lead + nr + kv_max + 1, (bandh, band_lead, nr)
    mv = 2 * kv_max + 2

    klo, khi, mlo, mhi = _residual_tables(
        uvm_chunk[:, 0], uvm_chunk[:, 1], abs_row0, row_block,
        kh_max, kv_max)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(p,),
        in_specs=[
            pl.BlockSpec((1, 4, bandh, w), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nr, w), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nr, w), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, nr, w), lambda i, *_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((4, band, w), jnp.float32),
            pltpu.VMEM((mv, row_block, w) if cache_cvs else (1, 8, 128),
                       jnp.float32),
            pltpu.VMEM((4, row_block, w), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_render_kernel, h_mid=nr, width=w, cap=0,
                          row_block=row_block, kh_max=kh_max,
                          kv_max=kv_max, abs_row0=abs_row0,
                          band_origin=abs_row0 - band_lead,
                          cache_cvs=cache_cvs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, nr, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(klo, khi, mlo, mhi, layer_band, uvm_chunk[:, 0], uvm_chunk[:, 1])
    return jnp.transpose(out, (1, 2, 0))


def render_mid_chunked(prepared: Array, uv: Array, height: int,
                       cap: int, chunk_rows: int,
                       row_block: int = ROW_BLOCK,
                       kh_max: int = None, kv_max: int = None,
                       cache_cvs: bool = None,
                       interpret: bool = False) -> Array:
    """Mid rows rendered in row chunks — the high-res path: each chunk
    call sees only a band of layer rows, so VMEM stays bounded at any
    resolution. Numerically identical to render_mid_prepared.

    prepared: [P, 4, H+2*pad, W] (assemble_rgba_prepared layout);
    uv: [P, H, W, 2]. Returns [H-2*cap, W, 3]."""
    p, _, hpad, w = prepared.shape
    h = height
    dkh, dkv = default_bounds(h, w, cap)
    kh_max = dkh if kh_max is None else kh_max
    kv_max = dkv if kv_max is None else kv_max
    # pad must match what prepare_layers/assemble used for THIS kv_max
    _, _, pad = _band_geometry(cap, row_block, kv_max)
    band_lead, _, _ = _band_geometry(0, row_block, kv_max)
    if cache_cvs is None:
        cache_cvs = (2 * kv_max + 2) * row_block * w * 4 < 16_000_000
    hm = h - 2 * cap
    assert hm % chunk_rows == 0 and chunk_rows % row_block == 0
    assert cap + pad >= band_lead, (cap, pad, band_lead)
    bandh = band_lead + chunk_rows + kv_max + 1
    outs = []
    for ci in range(hm // chunk_rows):
        r0 = cap + ci * chunk_rows
        lo = r0 - band_lead + pad          # layer-array row of band row 0
        band = jax.lax.slice_in_dim(prepared, lo, lo + bandh, axis=2)
        uvm = jnp.transpose(uv[:, r0:r0 + chunk_rows], (0, 3, 1, 2))
        outs.append(_ladder_render_chunk(
            band, uvm.astype(jnp.float32), r0, row_block, kh_max,
            kv_max, cache_cvs=cache_cvs, interpret=interpret))
    return jnp.concatenate(outs, axis=0)


def prepared_geometry(h: int, w: int, cap: int = CAP_ROWS,
                      row_block: int = ROW_BLOCK):
    """The one source of truth for the render-native layer layout:
    (cap, row_block, kh_max, kv_max, pad) for an HxW ERP. Producers
    (msi.assemble_rgba_prepared) and the consumer (_ladder_render_mid)
    must agree on `pad` or the band slices read the wrong rows."""
    kh, kv = default_bounds(h, w, cap)
    _, _, pad = _band_geometry(cap, row_block, kv)
    return {"cap": cap, "row_block": row_block, "kh_max": kh,
            "kv_max": kv, "pad": pad}


def narrow_bounds(h: int, w: int, cap: int = CAP_ROWS):
    """The TIGHT second tier of the pose-adaptive ladder dispatch.

    kv=7 is the largest vertical bound whose band keeps an 8-row lead
    (band_lead jumps 8 -> 16 at kv=8), so the narrow kernel's rolled
    band is 48 rows instead of default_bounds' 58-64 at 640x320 — a
    measured 4.09 -> 3.55 ms FTBB win (tools/exp_kv7.py, bit-exact
    in-contract). Poses whose residuals exceed it (|t| ~> 0.058 at
    640 wide) take the default-bounds kernel, then the gather path —
    geometry/render.py's lax.cond chain. Returns (kh, kv) or None when
    default_bounds is already that narrow."""
    _, dkv = default_bounds(h, w, cap)
    if dkv <= 7:
        return None
    import math
    amp = 1.0 / math.sin((cap + 0.5) * math.pi / h)
    return int(math.ceil(7 * amp)) + 2, 7


def default_wb(w: int):
    """Column-tile width for the hybrid FMA predication (None = plain
    full-width kernel). 128-lane tiles measured strictly faster at
    every tested pose whenever the width splits into >= 2 tiles."""
    return 128 if (w % 128 == 0 and w >= 256) else None


# Front-to-back block-major kernel with early ray termination
# (_ladder_render_mid_ftb) and the blend-fused inference path
# (_render_kernel_ftbb; msi.infer_msi_prepared(blend_fused=...)).
# Both default OFF; the TPU measurement session
# (tools/r3_hw_session.py) A/Bs them against the plane-major prepared
# pipeline and, when a variant wins AND matches it numerically, arms
# it by writing perf_flags.json at the repo root — read here at
# import so later processes (the driver's bench included) pick the
# winners up. FTB_EPS bounds the truncation error of culled (fully
# saturated) rays — well under the 1e-5 exactness tests.
FTB_EPS = 1e-6


# The complete set of keys perf_flags.json may carry. Anything else is
# a typo in the arming pipeline and must fail LOUDLY — a silently
# ignored key would leave a measured-winning kernel disarmed.
PERF_FLAG_SCHEMA = frozenset({"ftb", "ftbb", "net_x2", "vtap",
                              "roll16", "dyn_m", "mpair", "kpair",
                              "sdyn", "xrm"})


def _read_perf_flags(path=None):
    """Load + schema-check perf_flags.json. Absent file = defaults
    (silent: that is the normal un-armed state). Corrupt JSON, unknown
    keys, or non-bool values warn loudly and the offending entries are
    dropped so a garbage file can never arm (or silently disarm) a
    production kernel."""
    import json
    import os
    import warnings
    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "perf_flags.json")
    if not os.path.exists(path):
        return {}, path
    try:
        with open(path) as f:
            raw = json.load(f)
    except Exception as e:  # noqa: BLE001 — unreadable/corrupt file
        warnings.warn(f"perf_flags.json at {path} is unreadable "
                      f"({type(e).__name__}: {e}); kernel flags fall "
                      f"back to defaults", stacklevel=2)
        return {}, path
    if not isinstance(raw, dict):
        warnings.warn(f"perf_flags.json must be a JSON object, got "
                      f"{type(raw).__name__}; ignoring it", stacklevel=2)
        return {}, path
    flags = {}
    for k, v in raw.items():
        if k == "_backend":
            # Metadata written by ops.perf_probe.ensure_armed: the
            # backend fingerprint the flags were armed against. Not a
            # kernel flag; consumed by the prober, ignored here.
            if isinstance(v, str):
                flags[k] = v
            continue
        if k not in PERF_FLAG_SCHEMA:
            warnings.warn(f"perf_flags.json: unknown key {k!r} "
                          f"(known: {sorted(PERF_FLAG_SCHEMA)}) — "
                          f"ignored; check the arming pipeline for a "
                          f"typo", stacklevel=2)
            continue
        if not isinstance(v, bool):
            warnings.warn(f"perf_flags.json: key {k!r} must be a JSON "
                          f"bool, got {v!r} — ignored", stacklevel=2)
            continue
        flags[k] = v
    return flags, path


_PERF_FLAGS, PERF_FLAGS_PATH = _read_perf_flags()
DEFAULT_FTB = bool(_PERF_FLAGS.get("ftb", False))
DEFAULT_FTBB = bool(_PERF_FLAGS.get("ftbb", False))
# Vertical pre-blend rung form for the tiled + blend-fused ladders
# (r4 parts split: coefficient/branch machinery 2.06 ms of 4.75 vs
# 0.24 ms tap FMA). Armed by the hardware A/B in tools/r4_hw_session.
DEFAULT_VTAP = bool(_PERF_FLAGS.get("vtap", False))
# Keep the rolled band in the LAYER STORAGE dtype (bf16 on the hot
# path) instead of upcasting to f32 at band load: the roll chain is the
# ladder's largest cost (r4 parts split: 1.53 ms of 4.75 at the bench
# pose) and scales with band bytes, while the tap FMA that pays the
# bf16->f32 promote is only 0.24 ms. Bit-exact for the prepared stack
# (its layers are already bf16; the promote is exact); for the
# blend-fused kernel it rounds the blended band to bf16 — the same
# rounding the prepared pipeline applies in HBM. Armed by the hardware
# A/B (tools/r4_hw_session.py, "roll16").
DEFAULT_ROLL16 = bool(_PERF_FLAGS.get("roll16", False))

#: runtime-sized vertical-tap loop (dynamic sublane band slice) instead
#: of the static 2*kv_max+2-level @pl.when cascade in the ladder rungs.
#: Backend-sensitive (dynamic sublane starts) AND a measured A/B —
#: armed by the hardware session, validated by ops.perf_probe.
DEFAULT_DYN_M = bool(_PERF_FLAGS.get("dyn_m", False))

#: two vertical-tap levels per predicated region in the ladder rungs —
#: halves the m-cascade's scalar branch tests for one (usually zero-
#: coefficient) extra FMA level per tile. Measured A/B (hardware
#: session); static constructs, compiles everywhere.
DEFAULT_MPAIR = bool(_PERF_FLAGS.get("mpair", False))

#: two HORIZONTAL rungs per k-loop iteration from two rolled bands
#: offset by one rung — halves the k-loop iteration count (branch/loop
#: machinery, the ladder's dominant non-roll slab) at unchanged roll
#: volume. Composes with mpair (2x2 tap levels per predicated region).
#: Measured A/B (hardware session); static constructs, compiles
#: everywhere.
DEFAULT_KPAIR = bool(_PERF_FLAGS.get("kpair", False))


def render_mid_prepared(prepared: Array, uv: Array, cap: int = CAP_ROWS,
                        row_block: int = ROW_BLOCK,
                        kh_max: int = None, kv_max: int = None,
                        wb="auto",
                        interpret: bool = False) -> Array:
    """Ladder-render the mid rows from an ALREADY render-native layer
    stack (flipped + row-wrap-padded [P, 4, H+2*pad, W], any dtype) —
    the layout assemble_rgba_prepared emits, skipping prepare_layers'
    transpose/flip/pad tax entirely. uv: [P, H, W, 2]."""
    p, c, hpad, w = prepared.shape
    h = uv.shape[1]
    geom = prepared_geometry(h, w, cap, row_block)
    kh_max = geom["kh_max"] if kh_max is None else kh_max
    kv_max = geom["kv_max"] if kv_max is None else kv_max
    if wb == "auto":
        wb = default_wb(w)
    uvm = jnp.transpose(uv[:, cap:h - cap], (0, 3, 1, 2))
    return _ladder_render_mid(prepared, uvm.astype(jnp.float32), cap,
                              row_block, kh_max, kv_max, wb=wb,
                              interpret=interpret)


def render_mid_prepared_cf(prepared: Array, u: Array, v: Array,
                           cap: int = CAP_ROWS,
                           row_block: int = ROW_BLOCK,
                           kh_max: int = None, kv_max: int = None,
                           wb="auto", ftb=None,
                           interpret: bool = False,
                           vtap: bool = None,
                           roll16: bool = None) -> Array:
    """Channel-first twin of render_mid_prepared: u, v each [P, H, W]
    (full height; mid rows are sliced here). Passes u and v as separate
    kernel operands — stacking them into a [P, 2, Hm, W] field costs a
    ~47 MB XLA concat pass at 640x320x32. ftb=None follows DEFAULT_FTB
    (front-to-back early-termination kernel vs plane-major)."""
    p, c, hpad, w = prepared.shape
    h = u.shape[1]
    geom = prepared_geometry(h, w, cap, row_block)
    kh_max = geom["kh_max"] if kh_max is None else kh_max
    kv_max = geom["kv_max"] if kv_max is None else kv_max
    if wb == "auto":
        wb = default_wb(w)
    ftb = DEFAULT_FTB if ftb is None else ftb
    fn = _ladder_render_mid_ftb if ftb else _ladder_render_mid_uv
    vt = DEFAULT_VTAP if vtap is None else vtap
    kw = ({"eps": FTB_EPS} if ftb
          else {"vtap": vt,
                "roll16": DEFAULT_ROLL16 if roll16 is None else roll16,
                "dyn_m": DEFAULT_DYN_M, "mpair": DEFAULT_MPAIR,
                # alternative rung forms take precedence over kpair
                "kpair": (DEFAULT_KPAIR and not vt
                          and not DEFAULT_DYN_M)})
    return fn(prepared,
              u[:, cap:h - cap].astype(jnp.float32),
              v[:, cap:h - cap].astype(jnp.float32),
              cap, row_block, kh_max, kv_max, wb=wb,
              interpret=interpret, **kw)


def prepare_layers(rgba_layers: Array, cap: int = None, row_block: int = None,
                   kv_max: int = KV_MAX, dtype=jnp.float32) -> Array:
    """[H, W, P, 4] -> flipped + row-wrap-padded [P, 4, H+2*pad, W]."""
    cap = CAP_ROWS if cap is None else cap
    row_block = ROW_BLOCK if row_block is None else row_block
    _, _, pad = _band_geometry(cap, row_block, kv_max)
    x = jnp.transpose(rgba_layers.astype(dtype), (2, 3, 0, 1))
    x = jnp.flip(x, axis=3)                           # [P, 4, H, W]
    return jnp.concatenate([x[:, :, -pad:], x, x[:, :, :pad]], axis=2)


def shape_supported(h: int, w: int, c: int, cap: int = CAP_ROWS,
                    row_block: int = ROW_BLOCK,
                    interpret: bool = False) -> bool:
    """Static dispatch predicate: can the ladder kernel run this shape
    on this backend? (Runtime pose bounds are checked separately by
    residual_ok — geometry/render.py selects per-frame via lax.cond.)"""
    hm = h - 2 * cap
    if c != 4 or hm <= 0 or hm % row_block or w % 128 or hm < 8:
        return False
    return interpret or jax.default_backend() == "tpu"


def residual_ok(uv: Array, cap: int = CAP_ROWS,
                kh_max: int = None, kv_max: int = None,
                cap_pad: int = 16) -> Array:
    """Scalar bool: does this uv field stay inside the fused-render
    contract? True iff (a) every mid-row residual fits the ladder's
    static clamps (the kernel nearest-edge-clamps beyond them — silent
    garbage for rotation-dominant or large-|t| poses) and (b) every
    pole-cap vertical residual fits the cap gather band. Cheap vector
    reductions over fields the kernel path computes anyway (XLA CSE).
    """
    p, h, w, _ = uv.shape
    return residual_ok_uv(uv[..., 0], uv[..., 1], cap, kh_max, kv_max,
                          cap_pad)


def residual_ok_uv(u: Array, v: Array, cap: int = CAP_ROWS,
                   kh_max: int = None, kv_max: int = None,
                   cap_pad: int = 16) -> Array:
    """Channel-first residual_ok: u, v each [P, H, W]."""
    p, h, w = u.shape
    dkh, dkv = default_bounds(h, w, cap)
    kh_max = dkh if kh_max is None else kh_max
    kv_max = dkv if kv_max is None else kv_max
    um = u[:, cap:h - cap]
    vm = v[:, cap:h - cap]
    j = jax.lax.broadcasted_iota(jnp.float32, (1, 1, w), 2)
    i_mid = (jax.lax.broadcasted_iota(jnp.float32, (1, h - 2 * cap, 1), 1)
             + cap)
    dk_raw = (w - 1.0) - jnp.floor(um) - j
    dk = dk_raw - w * jnp.floor((dk_raw + w / 2.0) / w)
    dy = jnp.floor(vm) - i_mid
    ok_mid = ((jnp.max(jnp.abs(dk)) <= kh_max)
              & (jnp.max(jnp.abs(dy)) <= kv_max))
    v_top = v[:, :cap]
    v_bot = v[:, h - cap:]
    i_top = jax.lax.broadcasted_iota(jnp.float32, (1, cap, 1), 1)
    i_bot = i_top + (h - cap)
    ok_caps = ((jnp.max(jnp.abs(jnp.floor(v_top) - i_top)) <= cap_pad - 2)
               & (jnp.max(jnp.abs(jnp.floor(v_bot) - i_bot)) <= cap_pad - 2))
    return ok_mid & ok_caps


def render_equirect_mid_pallas(rgba_layers: Array, uv: Array,
                               cap: int = CAP_ROWS,
                               row_block: int = ROW_BLOCK,
                               kh_max: int = None, kv_max: int = None,
                               dtype=jnp.float32, wb="auto",
                               interpret: bool = False) -> Optional[Array]:
    """Composite the mid rows [cap, H-cap) of an ERP novel view.

    rgba_layers: [H, W, P, 4]; uv: [P, H, W, 2] full-height lookup field
    (from intersect_sphere). Returns [H-2*cap, W, 3] or None when the
    shape doesn't fit the kernel (caller falls back to gathers).
    """
    h, w, p, c = rgba_layers.shape
    hm = h - 2 * cap
    if not shape_supported(h, w, c, cap, row_block, interpret):
        return None
    dkh, dkv = default_bounds(h, w, cap)
    kh_max = dkh if kh_max is None else kh_max
    kv_max = dkv if kv_max is None else kv_max
    if wb == "auto":
        wb = default_wb(w)
    layers = prepare_layers(rgba_layers, cap, row_block, kv_max, dtype)
    uvm = jnp.transpose(uv[:, cap:h - cap], (0, 3, 1, 2))  # [P, 2, Hm, W]
    return _ladder_render_mid(layers, uvm.astype(jnp.float32), cap,
                              row_block, kh_max, kv_max, wb=wb,
                              interpret=interpret)
