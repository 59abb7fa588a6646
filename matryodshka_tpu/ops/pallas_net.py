"""Whole-U-Net Pallas kernel: the MSI CNN as ONE fused TPU program.

Why: the XLA-lowered net sits at the measured MXU N-rate wall — conv
GEMMs with N = cout (64..256) cap at 21-67 TFLOP/s of the 197 peak
(STATUS.md hardware facts), and per-layer Pallas convs lose end-to-end
because every custom-call boundary breaks XLA's cross-layer pipelining
(+3.4 ms for ONE boundary; commits 5f283ff/ff347fd). The remaining
route (VERDICT round-2 item 2) is whole-subgraph granularity: the
entire network in one kernel, with GEMMs re-oriented so N = spatial
width.

Reference network: matryodshka/nets.py:387-469 (msi_train_net, the
wrap-padded variant). Same topology, same math as models/unet.py.

Design (every choice forced by a Mosaic constraint):

  * Activation layout [H, C, W] — "row-major": H on the LEADING
    (untiled) axis so vertical conv taps and stride-2 row selection are
    free leading-dim arithmetic (dynamic sublane slices would need
    8-alignment); C on sublanes (all channel counts are multiples of
    8); W on lanes, so every GEMM is [cout, 3C] @ [3C, W] with N = W.
  * The rhs for output row r is rows r-1..r+1 viewed as [3C, W] — a
    free reshape (leading x sublane merge, C % 8 == 0).
  * Horizontal taps dx in {-1,0,1}: three dx-grouped dots share that
    one rhs; their f32 outputs combine as
        out = roll(y[-1], +1) + y[0] + roll(y[+1], -1)
    — lane rolls on the SMALL [cout, W] f32 results (pltpu.roll is
    32-bit-only, which is why the rolls sit on the f32 outputs, not the
    bf16 inputs). Circular roll IS the ERP horizontal wrap — the
    reference's wrap_pad (nets.py:288-295) for free.
  * Stride-2 W: dense row computed, then one one-hot selection dot
    [W, W/2] picks even lanes (static constant; avoids strided lane
    slices). Stride-2 H: output row r reads input rows 2r-1..2r+1 —
    leading-dim indexing.
  * Dilated (rate-2) convs: rows r-2, r, r+2 and output rolls by +-2.
  * Transposed convs: subpixel decomposition (the FusedDeconvCrop
    identity, models/unet.py:98-138): one dense 2x2-tap conv emitting
    4f parity channels, rows routed by parity (leading-dim writes),
    columns interleaved with two one-hot expansion dots.
  * Skip concats: concat(a, b) @ W == a @ W1 + b @ W2 — two dots, no
    concatenated tensor ever exists.
  * Layer norm: s1/s2 accumulated from the bf16-ROUNDED outputs as
    they are written (the stats must describe the stored tensor);
    normalize + relu are applied to each consumer's freshly-DMA'd
    window copy, so overlapping window rows are never normalized
    twice in place.
  * Vertical pad is zero-pad (nets.py wrap_pad pads H with zeros):
    every HBM activation buffer carries `rate` zero rows top/bottom,
    zeroed once at kernel start; window normalization skips them.

Memory model: ALL activations live in HBM scratch; each stage streams
double-buffered row-band windows through VMEM (in) and row bands out
(the uniform-banding model — VMEM holds only weights + windows, so the
same kernel runs 640x320 production shapes and tiny test shapes). The
MXU work (~293 GFLOP at 640x320) dwarfs the ~350 MB of HBM activation
traffic, so the DMAs hide behind the GEMMs.

The kernel is inference-only (training keeps the XLA path; the jitted
XLA net is also the fallback wherever shapes/backends don't fit).
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# ---------------------------------------------------------------------------
# Layer plan: the wrap-variant U-Net topology (nets.py:403-450), ngf=64.
# ---------------------------------------------------------------------------


def unet_plan(ngf: int, cin0: int, num_outputs: int):
    g = ngf
    return [
        # name, kind, srcs, cin_each, cout, in_div, out_div, rate
        ("conv1_1", "conv", ["x"], [cin0], g, 1, 1, 1),
        ("conv1_2", "down", ["conv1_1"], [g], 2 * g, 1, 2, 1),
        ("conv2_1", "conv", ["conv1_2"], [2 * g], 2 * g, 2, 2, 1),
        ("conv2_2", "down", ["conv2_1"], [2 * g], 4 * g, 2, 4, 1),
        ("conv3_1", "conv", ["conv2_2"], [4 * g], 4 * g, 4, 4, 1),
        ("conv3_2", "conv", ["conv3_1"], [4 * g], 4 * g, 4, 4, 1),
        ("conv3_3", "down", ["conv3_2"], [4 * g], 8 * g, 4, 8, 1),
        ("conv4_1", "conv", ["conv3_3"], [8 * g], 8 * g, 8, 8, 2),
        ("conv4_2", "conv", ["conv4_1"], [8 * g], 8 * g, 8, 8, 2),
        ("conv4_3", "conv", ["conv4_2"], [8 * g], 8 * g, 8, 8, 2),
        ("conv6_1", "deconv", ["conv4_3", "conv3_3"], [8 * g, 8 * g],
         4 * g, 8, 4, 1),
        ("conv6_2", "conv", ["conv6_1"], [4 * g], 4 * g, 4, 4, 1),
        ("conv6_3", "conv", ["conv6_2"], [4 * g], 4 * g, 4, 4, 1),
        ("conv7_1", "deconv", ["conv6_3", "conv2_2"], [4 * g, 4 * g],
         2 * g, 4, 2, 1),
        ("conv7_2", "conv", ["conv7_1"], [2 * g], 2 * g, 2, 2, 1),
        ("conv8_1", "deconv", ["conv7_2", "conv1_2"], [2 * g, 2 * g],
         g, 2, 1, 1),
        ("conv8_2", "conv", ["conv8_1"], [g], g, 1, 1, 1),
        ("color_pred", "head", ["conv8_2"], [g], num_outputs, 1, 1, 1),
    ]


# ---------------------------------------------------------------------------
# Weight preparation (XLA side, tiny): flax param tree -> kernel operands.
# ---------------------------------------------------------------------------


def _conv_lhs(kernel, dtype):
    """kernel [3, 3, cin, cout] -> three [cout, 3*cin] dx-grouped lhs.

    L_dx[o, dy * cin + c] = kernel[dy, dx, c, o].
    """
    k = jnp.asarray(kernel)
    out = []
    for dx in range(3):
        sub = k[:, dx]                           # [3, cin, cout]
        sub = jnp.transpose(sub, (2, 0, 1))      # [cout, 3, cin]
        out.append(sub.reshape(sub.shape[0], -1).astype(dtype))
    return out


def _wp(w: int) -> int:
    """Padded lane width (Mosaic: DMA lane dims must be 128-aligned)."""
    return max(128, 128 * -(-w // 128))


def _even_select(w: int, dtype, parity: int = 0):
    """One-hot [Wp(w), Wp(w/2)] selecting even LOGICAL lanes:
    (x @ S)[c] = x[2c + parity] for c < w/2, 0 in pad lanes (keeps pads
    clean). parity=1 serves the FLIPPED net (see prepare_params): on a
    horizontally flipped row the stride-2 centers sit at odd columns
    (jF = W-1-j maps even j to odd jF for even W)."""
    s = np.zeros((_wp(w), _wp(w // 2)), np.float32)
    s[np.arange(parity, w, 2), np.arange(w // 2)] = 1.0
    return jnp.asarray(s, dtype=dtype)


def _interleave_expand(w_half: int, parity: int, dtype):
    """One-hot [Wp(W/2), Wp(W)] scattering lanes to (2c + parity);
    pad rows/columns zero."""
    s = np.zeros((_wp(w_half), _wp(2 * w_half)), np.float32)
    s[np.arange(w_half), 2 * np.arange(w_half) + parity] = 1.0
    return jnp.asarray(s, dtype=dtype)


def _shift_zero(y, k: int, wlog: int, left: bool, slotw: int = None):
    """Zero-fill shift by k within each slot's logical width — the
    coord variant's SAME horizontal padding (nets.py coord_conv2d uses
    plain zero-padded convs, no wrap). left=False: z[j] = y[j-k]
    (lanes [0, k) zeroed); left=True: z[j] = y[j+k] (lanes
    [wlog-k, wlog) zeroed). Pad lanes (>= wlog) come out zero."""
    wp = y.shape[-1]
    slotw = wp if slotw is None else slotw
    t = (wlog - k) % wlog if left else k
    z = _wrap_roll(y, t, wlog, slotw)
    lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
    lane_in = lane % slotw if slotw != wp else lane
    if left:
        keep = lane_in < wlog - k
    else:
        keep = (lane_in >= k) & (lane_in < wlog)
    return jnp.where(keep, z, 0.0)


def _wrap_roll(y, amt: int, wlog: int, slotw: int = None):
    """Circular roll over the first `wlog` lanes of each `slotw`-lane
    slot (slotw defaults to the whole lane dim): within every slot,
    z[j] = y[(j - amt) mod wlog] for j < wlog; pad lanes undefined.
    One native roll when unpadded; two rolls + a lane select otherwise
    — never READS pad lanes, so garbage there stays contained. The
    slot form services the lane-PACKED deep layers (R rows side by
    side, each wrapping independently)."""
    wp = y.shape[-1]
    slotw = wp if slotw is None else slotw
    t = amt % wlog
    if t == 0:
        return y
    if wp == wlog:
        return pltpu.roll(y, t, axis=1)
    a = pltpu.roll(y, t, axis=1)
    b = pltpu.roll(y, (t - wlog) % wp, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
    lane_in = lane % slotw if slotw != wp else lane
    return jnp.where(lane_in < t, b, a)


def prepare_params(flax_params: Dict, ngf: int, cin0: int,
                   num_outputs: int, dtype=jnp.bfloat16,
                   flipped: bool = False,
                   variant: str = "wrap") -> List[Array]:
    """Flax MSIUNet (variant='wrap') param tree -> flat kernel operands.

    Per layer: conv/down -> [L ([3*cout, 3cin]: the dx-grouped lhs
    STACKED on M — one MXU dot computes all three dx taps from one rhs
    read, and cout=64 stages fill whole 128-row M tiles), bias, gamma,
    beta]; deconv -> per source s, per da the [4*cout, 2*cin_s] lhs
    stacking the four (db, kb) taps (ka merged into K, subpixel
    identity of models/unet.py:124-131), then bias, gamma, beta;
    head -> [L, bias].

    flipped=True prepares the HORIZONTALLY-FLIPPED net: with these
    operands (and flipped=True selectors from static_operands) the
    UNCHANGED kernel satisfies net_flipped(flip_W(x)) == flip_W(net(x)),
    so the sweep kernel's natively-flipped row-major volume feeds the
    net with no XLA flip/transpose pass, and the prediction comes out
    pre-flipped for assemble_rgba_prepared. Derivation (formal, and
    pinned by tests/test_pallas_net.py::test_flipped_mode):
      conv:   out[j] = sum_dx w_dx x[j+dx-1]; on flipped inputs the
              same roll structure needs the dx order reversed -> swap
              L0 <-> L2 (rate-2 dilated convs: identical argument).
      down:   flipped stride-2 centers sit at odd columns -> parity-1
              selector.
      deconv: out[2c+db] = sum_kb L[da,db,kb] x[c+db+kb-1]; substituting
              j -> flipped gives L'[da,db,kb] = L[da,1-db,1-kb] with the
              sh = db+kb-1 rolls and the e0/e1 expanders unchanged.
      head:   1x1, unaffected.
    """
    coord = variant == "coord"
    p = flax_params["params"] if "params" in flax_params else flax_params
    ops: List[Array] = []
    for (name, kind, srcs, cins, cout, ind, outd, rate) in unet_plan(
            ngf, cin0, num_outputs):
        lp = p[name]
        k = jnp.asarray(lp["kernel"])
        if kind in ("conv", "down"):
            if coord:
                # the |sin(lat)| channel is appended LAST
                # (unet.py:253-257); it is constant along W, so it
                # factors out of the GEMM into a per-row bias: kc
                # [cout, 3(dy), 3(dx)] are its 3x3 weights.
                cin = cins[0]
                kc = jnp.transpose(k[:, :, cin, :], (2, 0, 1))
                if flipped:
                    kc = kc[:, :, ::-1]
                k = k[:, :, :cin]
                lhs = _conv_lhs(k, dtype)
                if flipped:
                    lhs = lhs[::-1]
                ops.append(jnp.concatenate(lhs, axis=0))
                # [cout, 9] = [row-sum | left-edge col | right-edge col]
                # per dy — everything the per-row bias math needs
                kcx = jnp.concatenate(
                    [kc.sum(axis=2), kc[:, :, 0], kc[:, :, 2]], axis=1)
                ops.append(kcx.astype(jnp.float32))
                ops.append(jnp.asarray(lp["bias"],
                                       jnp.float32).reshape(cout, 1))
                ln = p[name + "_ln"]
                ops.append(jnp.asarray(ln["gamma"], jnp.float32)
                           .reshape(cout, 1))
                ops.append(jnp.asarray(ln["beta"], jnp.float32)
                           .reshape(cout, 1))
                continue
            lhs = _conv_lhs(k, dtype)
            if flipped:
                lhs = lhs[::-1]
            ops.append(jnp.concatenate(lhs, axis=0))   # [3*cout, 3cin]
        elif kind == "deconv":
            off = 0
            for cs in cins:
                ks = k[:, :, off:off + cs]
                off += cs
                for da in range(2):
                    subs = []
                    for db_s in range(2):
                        for kb_s in range(2):
                            db = 1 - db_s if flipped else db_s
                            kb = 1 - kb_s if flipped else kb_s
                            # L[o, ka*cs + c] = k[da+2ka, db+2kb, c, o]
                            sub = jnp.stack(
                                [jnp.transpose(ks[da + 2 * ka, db + 2 * kb],
                                               (1, 0)) for ka in range(2)],
                                axis=1)          # [cout, 2, cs]
                            subs.append(sub.reshape(cout, 2 * cs)
                                        .astype(dtype))
                    ops.append(jnp.concatenate(subs, axis=0))
        elif kind == "head":
            ops.append(jnp.transpose(k[0, 0], (1, 0)).astype(dtype))
        ops.append(jnp.asarray(lp["bias"], jnp.float32).reshape(cout, 1))
        if kind != "head":
            ln = p[name + "_ln"]
            ops.append(jnp.asarray(ln["gamma"], jnp.float32)
                       .reshape(cout, 1))
            ops.append(jnp.asarray(ln["beta"], jnp.float32)
                       .reshape(cout, 1))
    return ops


def static_operands(w: int, dtype=jnp.bfloat16,
                    flipped: bool = False,
                    variant: str = "wrap") -> List[Array]:
    """One-hot stride-select / interleave-expand constants (appended
    after the params in the operand list). flipped selects the odd
    stride-2 phase (see prepare_params); the expanders are unchanged
    under flip. The coord variant's SAME stride-2 convs center at ODD
    columns (XLA SAME puts the extra pad at the END: pad_lo=0), so its
    parity is the opposite of wrap's."""
    par = 1 if flipped else 0
    if variant == "coord":
        par = 1 - par
    out = [_even_select(ww, dtype, par) for ww in (w, w // 2, w // 4)]
    for wh in (w // 8, w // 4, w // 2):
        out.append(_interleave_expand(wh, 0, dtype))
        out.append(_interleave_expand(wh, 1, dtype))
    return out


# ---------------------------------------------------------------------------
# The kernel builder (uniform streaming model).
# ---------------------------------------------------------------------------

_EPS = 1e-12


# VMEM ceiling handed to Mosaic: 1 MiB under the 128 MiB physical VMEM
# so the compiler keeps a little slack for its own spills. Any scratch
# growth (e.g. _ROW_BAND or channel changes) is caught EARLY by the
# explicit vmem_bytes assert in _forward rather than by an opaque
# Mosaic allocation failure.
VMEM_LIMIT_BYTES = 127 * 1024 * 1024

_ROW_BAND = 16   # 20/32 exceed the 128M VMEM cap with the window set


def _row_band(rows: int) -> int:
    """Output rows per band; tiny test shapes band by whatever
    divides."""
    for rb in (_ROW_BAND, 16, 8, 4, 2, 1):
        if rows % rb == 0:
            return rb
    return 1


# Vertical pad rows of the planar x operands ([P*C, H + 2*X_ROW_PAD, W]
# from pallas_sweep.ods_sweep_identity_planar): 8 keeps every window DMA
# a full rectangle (no edge memsets) and every offset sublane-aligned.
X_ROW_PAD = 8


# Double-buffer conv1_1's planar x window (2 slots instead of 1).
# Costs ~6 MB extra VMEM at production shapes; whether the recovered
# DMA overlap beats the tighter VMEM budget is a hardware question —
# armed via perf_flags.json ("net_x2"), measured by
# tools/r4_hw_session.py. The profile motivation: net_planar 4.73 ms vs
# net (row-major x, double-buffered window) 4.30 ms.
def _default_net_x2() -> bool:
    from matryodshka_tpu.ops.pallas_render import _PERF_FLAGS
    return bool(_PERF_FLAGS.get("net_x2", False))


def _build_kernel(h: int, w: int, ngf: int, cin0: int, num_outputs: int,
                  dtype, planar_x: bool = False, variant: str = "wrap",
                  x_slots: int = 1):
    """Returns (kernel_fn, scratch_shapes, total_ops, vmem_bytes).

    variant="coord" builds the CoordNet CNN (the released checkpoints'
    variant, nets.py:471-534): SAME zero padding horizontally (the
    wrap rolls become zero-fill shifts) and an |sin(latitude)|
    coordinate channel prepended to every conv — constant along W, so
    it lowers to a per-row bias (kcx operand + per-stage coord vectors
    in SMEM) instead of a GEMM column.

    planar_x: the network input arrives as TWO plane-major operands
    [cin0/2, H + 2*X_ROW_PAD, W] (the sweep kernel's padded planar
    volumes) instead of one row-major [H, cin0, W]; conv1_1's window
    keeps channels major ([cs, win_rows, swp]) so the band DMAs are
    plain strided rectangles and the GEMM rhs is packed with STATIC
    sublane reads (python-unrolled row groups) — zero XLA layout pass
    between sweep and net."""
    coord = variant == "coord"
    plan = unet_plan(ngf, cin0, num_outputs)
    by_name = {e[0]: e for e in plan}
    layer_idx = {e[0]: i for i, e in enumerate(plan)}

    if coord:
        def hshift(y, k, wlog, left, slotw=None):
            return _shift_zero(y, k, wlog, left, slotw)
    else:
        def hshift(y, k, wlog, left, slotw=None):
            return _wrap_roll(y, (wlog - k) % wlog if left else k,
                              wlog, slotw)

    def wpad(ww):
        """DMA lane dims must be 128-aligned (hard Mosaic rule observed
        on v5e): activations are stored/processed at the padded width,
        with pad lanes kept zero at store and wrap handled by masked
        rolls over the logical width."""
        return max(128, 128 * -(-ww // 128))

    # HBM activation buffers: [rows + 2*pad, C, Wp] bf16. pad = max rate
    # of any consumer (conv4_x are rate 2). Tuples: (pad, rows, c,
    # w_logical, w_padded).
    bufs_meta = {"x": (1, h, cin0, w, wpad(w))}
    for (name, kind, srcs, cins, cout, ind, outd, rate) in plan:
        if kind == "head":
            continue
        pad = 2 if name in ("conv3_3", "conv4_1", "conv4_2") else 1
        bufs_meta[name] = (pad, h // outd, cout, w // outd,
                           wpad(w // outd))
    buf_names = list(bufs_meta.keys())

    assert w == wpad(w), ("input/output width must be 128-aligned "
                          "(internal stages pad automatically)", w)

    # Mosaic rejects HBM *scratch* ("Scratch memref allocation only
    # supported for vmem, smem and semaphore_mem"), so the activation
    # buffers are EXTRA OUTPUTS in ANY space instead — same HBM
    # residency, just plumbed through out_shape and discarded.
    hbm_out_shapes = []
    for n in buf_names[1:]:                       # x is an operand
        pad, rows, c, ww, wp = bufs_meta[n]
        hbm_out_shapes.append(((rows + 2 * pad, c, wp), dtype))

    # Per-stage VMEM window/band scratch. Window = input rows needed for
    # one band of output rows (+1 spare slot for double buffering when
    # the stage has >1 band — except conv1_1's planar x window, which is
    # deliberately single-slot: its operands stream straight from the
    # input HBM ref, see the planar-x path below). Out band = one band
    # of output rows.
    # Stages run sequentially with all DMAs drained at stage end, so
    # buffers (and their semaphores) are POOLED by shape: each stage
    # claims the n-th instance of a shape for its n-th use, and two
    # stages never hold a buffer at once.
    vmem_scratch = []
    stage_scr = []   # per stage: dict of scratch indices
    _pool = {}       # (shape, dtype) -> [(buf_idx, sem_idx), ...]
    _claimed = {}    # per-stage reset: (shape, dtype) -> count
    nonlocal_sem = [0]

    def add_sems(n):
        i = nonlocal_sem[0]
        nonlocal_sem[0] += n
        return i

    def add_vmem(shape, dt, nsems: int = 0):
        """Pooled allocation: returns (buf_idx, sem_idx)."""
        key = (tuple(shape), np.dtype(dt).name)
        used = _claimed.get(key, 0)
        _claimed[key] = used + 1
        insts = _pool.setdefault(key, [])
        if used < len(insts):
            return insts[used]
        vmem_scratch.append(pltpu.VMEM(shape, dt))
        inst = (len(vmem_scratch) - 1, add_sems(max(nsems, 1)))
        insts.append(inst)
        return inst

    # Lane packing: R rows side by side push the GEMM N from the
    # padded width to ~1024-1280. Narrow stages (wp 128-384) sit on the
    # MXU N-rate wall; the WIDE stages (wp 640: conv1_1/conv1_2/
    # conv8_2/head — measured 2.3 + 0.8 ms of the 5.4 ms kernel) are
    # issue-bound at one small dot per row, so 2-row packing halves
    # their dot count. One shared arena sized to the largest packed
    # stage serves every stage's packed rhs (the row_fns slice
    # [0:rows, 0:lanes]) — per-shape singleton buffers blew the 120 MB
    # scoped-VMEM budget at ngf=64 by 1.5 MB.
    def _fit_pack(target_lanes, wp_in, group):
        r = max(1, min(target_lanes // wp_in, group))
        while group % r:
            r -= 1
        return r

    pack_meta = {}
    for (name, kind, srcs, cins, cout, ind, outd, rate) in plan:
        rbp = _row_band(h // outd)
        if kind in ("conv", "down"):
            wp_in = bufs_meta[srcs[0]][4]
            r_pack = _fit_pack(1280, wp_in, rbp)
            if r_pack > 1:
                pack_meta[name] = (r_pack, 3 * cins[0],
                                   r_pack * wp_in)
        elif kind == "deconv":
            wp_in = bufs_meta[srcs[0]][4]
            shared = (all(c == cins[0] for c in cins)
                      and all(bufs_meta[s][4] == wp_in for s in srcs))
            r_pack = _fit_pack(1280, wp_in, rbp // 2)
            if shared and r_pack > 1:
                pack_meta[name] = (r_pack, 2 * cins[0],
                                   r_pack * wp_in)
        elif kind == "head":
            wp_in = bufs_meta[srcs[0]][4]
            r_pack = _fit_pack(1280, wp_in, rbp)
            if r_pack > 1:
                pack_meta[name] = (r_pack, cins[0], r_pack * wp_in)
    pack_arena = None
    if pack_meta:
        pack_arena = (max(m[1] for m in pack_meta.values()),
                      max(m[2] for m in pack_meta.values()))

    for (name, kind, srcs, cins, cout, ind, outd, rate) in plan:
        _claimed.clear()
        rows_out = h // outd
        ww_out = w // outd
        rb = _row_band(rows_out)
        nb = rows_out // rb
        scr = {"rb": rb, "nb": nb, "wins": [], "win_sems": []}
        stride = 2 if kind == "down" else 1
        for s, cs in zip(srcs, cins):
            swp = bufs_meta[s][4]
            if kind == "deconv":
                win_rows = rb // 2 + 2
            else:
                win_rows = stride * rb + 2 * rate
            nslots = 2 if nb > 1 else 1
            if planar_x and s == "x":
                # channels-major window: rows are the sublane dim, so
                # the two planar operands DMA straight in (two copies
                # per band -> two sems per slot); row reads are static.
                # Mosaic requires HBM row slices 8-aligned in offset AND
                # extent; the natural window [g0, g0+win_rows) starts at
                # g0 = stride*b*rb - rate + X_ROW_PAD, a constant
                # off = (X_ROW_PAD - rate) % 8 past an 8 boundary when
                # stride*rb % 8 == 0 (always at production shapes), so
                # copy the aligned superset [g0-off, g0-off+cp) and
                # shift the static reads by off.
                x_off = (X_ROW_PAD - rate) % 8
                cp_rows = -(-(x_off + win_rows) // 8) * 8
                scr["x_off"] = x_off
                scr["x_cp"] = cp_rows
                # Default SINGLE slot: an earlier (larger-arena) build
                # measured the double-buffered window blowing the
                # 128 MB VMEM ceiling (131.36 M requested). The next
                # band's copy is started as soon as row_fn frees the
                # window, so only the band-top flush/pack time is
                # exposed. x_slots=2 (perf_flags "net_x2") re-enables
                # double buffering now that the shared pack arena
                # shrank the scratch set — a measured hardware choice.
                nslots = min(x_slots, 2) if nb > 1 else 1
                (bi, si) = add_vmem((nslots, cs, cp_rows, swp), dtype,
                                    nsems=2 * nslots)
            else:
                (bi, si) = add_vmem((nslots, win_rows, cs, swp), dtype,
                                    nsems=nslots)
            scr["wins"].append((bi, win_rows, nslots))
            scr["win_sems"].append(si)
        oslots = 2 if nb > 1 else 1
        odt = jnp.float32 if kind == "head" else dtype
        (obi, osi) = add_vmem((oslots, rb, cout, wpad(ww_out)), odt,
                              nsems=oslots)
        scr["oband"] = obi
        scr["oslots"] = oslots
        scr["ob_sems"] = osi
        scr["pack"] = 1
        if name in pack_meta:
            scr["pack"] = pack_meta[name][0]
            (pi, _) = add_vmem(pack_arena, dtype)
            scr["pack_rhs"] = pi
        stage_scr.append(scr)

    # Exact-shaped zero buffers per distinct (C, W): DMA lane slices
    # must be 128-aligned, so a shared max-size arena cannot be sliced
    # to odd widths like 320.
    _claimed.clear()
    zeros_idx = {}
    for n in buf_names[1:]:
        pad, rows, c, ww, wp = bufs_meta[n]
        key = (c, wp)
        if key not in zeros_idx:
            zeros_idx[key], _ = add_vmem((2, c, wp), dtype)
    zero_sems = add_sems(2 * len(buf_names))
    n_sems = nonlocal_sem[0]

    # operand layout
    def n_ops(kind, nsrc):
        if kind == "head":
            return 2
        if kind == "deconv":
            return nsrc * 2 + 3
        return 5 if coord else 4        # coord adds the kcx operand

    n_x_ops = 2 if planar_x else 1
    total_params = n_x_ops + sum(n_ops(k, len(s))
                                 for (_, k, s, *_r) in plan)
    sel_widths = [w, w // 2, w // 4]
    exp_widths = [w // 8, w // 4, w // 2]
    n_static = len(sel_widths) + 2 * len(exp_widths)
    # coord: one padded |sin(lat)| vector per conv/down stage (SMEM)
    conv_vec_idx = {}
    if coord:
        ci = 0
        for si, e in enumerate(plan):
            if e[1] in ("conv", "down"):
                conv_vec_idx[si] = total_params + n_static + ci
                ci += 1
    total_ops = total_params + n_static + len(conv_vec_idx)

    vmem_bytes = sum(int(np.prod(sp.shape))
                     * np.dtype(sp.dtype).itemsize
                     for sp in vmem_scratch)

    def kernel(*refs):
        ops = list(refs[:total_ops])
        out_ref = refs[total_ops]
        hbufs = {n: refs[total_ops + 1 + i]
                 for i, n in enumerate(buf_names[1:])}
        hbufs["x"] = (ops[0], ops[1]) if planar_x else ops[0]
        base = total_ops + 1 + (len(buf_names) - 1)
        vrefs = list(refs[base:base + len(vmem_scratch)])
        stats = refs[base + len(vmem_scratch)]
        sem = refs[base + len(vmem_scratch) + 1]

        def selector(ww):
            return ops[total_params + sel_widths.index(ww)]

        def expander(wh):
            i = total_params + len(sel_widths) + 2 * exp_widths.index(wh)
            return ops[i], ops[i + 1]

        # ---- zero the HBM pad rows (once) -------------------------------
        for (c, ww), zi_buf in zeros_idx.items():
            z = vrefs[zi_buf]
            z[:, :, :] = jnp.zeros(z.shape, dtype)
        zi = 0
        zero_dmas = []
        for n in buf_names[1:]:
            pad, rows, c, ww, wp = bufs_meta[n]
            zarena = vrefs[zeros_idx[(c, wp)]]
            for top in (True, False):
                dst = (hbufs[n].at[0:pad] if top
                       else hbufs[n].at[rows + pad:rows + 2 * pad])
                d = pltpu.make_async_copy(
                    zarena.at[0:pad], dst, sem.at[zero_sems + zi])
                d.start()
                zero_dmas.append(d)
                zi += 1
        for d in zero_dmas:
            d.wait()

        oi = [n_x_ops]

        def take(n):
            r = ops[oi[0]:oi[0] + n]
            oi[0] += n
            return r

        ln_params = {}

        def norm_vectors(src_name):
            """(a_vec, b_vec) [C, 1] for fused LN+relu of src's rows."""
            if src_name == "x":
                return None
            li = layer_idx[src_name]
            gamma, beta = ln_params[li]
            rows, c, ww, wp = bufs_meta[src_name][1:]
            n = float(rows * c * ww)
            mean = stats[li, 0] / n
            var = jnp.maximum(stats[li, 1] / n - mean * mean, 0.0)
            inv = jax.lax.rsqrt(var + _EPS)
            a_vec = gamma[:, :] * inv
            b_vec = beta[:, :] - mean * a_vec
            return a_vec, b_vec

        def coord_bias(kcx, cvec_ref, ro, stride, rate, sw, swp,
                       voff=0):
            """[cout, swp] bias of the |sin(lat)| coord channel for
            output row `ro` (traced): full-row term minus the edge
            columns' missing-tap corrections (SAME zero pad). kcx:
            [cout, 9] = [dy-sums | left col | right col]; cvec_ref:
            SMEM [1, his + 4], 2 zero pad entries each side."""
            terms = [None, None, None]
            for dy in range(3):
                ri = stride * ro + (dy - 1) * rate + voff
                cv = cvec_ref[0, ri + 2]
                for ti in range(3):
                    t = kcx[:, 3 * ti + dy:3 * ti + dy + 1] * cv
                    terms[ti] = t if terms[ti] is None else terms[ti] + t
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, swp), 1)
            mask_l = lane < rate
            mask_r = (lane >= sw - rate) & (lane < sw)
            return jnp.where(mask_l, terms[0] - terms[1],
                             jnp.where(mask_r, terms[0] - terms[2],
                                       terms[0]))

        def norm_row(row, av, pad_row):
            """Fused LN+relu of one window row [C, W] applied DURING the
            rhs-pack read (the packed row_fns' copies), replacing the
            separate normalize_win pass. pad_row (traced scalar bool)
            selects the identity affine so zero pad rows stay exactly
            zero (relu(0*1+0) == 0; the real affine's beta would leak)."""
            if av is None:
                return row
            a_vec, b_vec = av
            aa = jnp.where(pad_row, 1.0, a_vec)
            bb = jnp.where(pad_row, 0.0, b_vec)
            y = jnp.maximum(row.astype(jnp.float32) * aa + bb, 0.0)
            return y.astype(dtype)

        def stage(si, name, kind, srcs, cins, cout, outd, rate,
                  row_fn, fused_norm: bool = False):
            """Shared band loop: windows in, rows computed, band out.

            row_fn(rl, wins, oband, oslot[, norms]) computes output
            row(s) rl of the current band from the window refs (local
            coordinates) and writes into oband[oslot]. fused_norm:
            row_fn applies LN+relu itself during its rhs packing (via
            norm_row) and receives the per-source norm vectors; the
            window-pass normalize_win is skipped."""
            scr = stage_scr[si]
            rb, nb = scr["rb"], scr["nb"]
            stride = 2 if kind == "down" else 1
            dst = None if kind == "head" else hbufs[name]
            dpad = 0 if kind == "head" else bufs_meta[name][0]
            rows_out = (h if kind == "head" else bufs_meta[name][1])
            norms = [norm_vectors(s) for s in srcs]

            def on_win(wi, b, slot, action):
                """Start or wait the window DMA for band b — the same
                descriptor set in both phases (byte counts must match).
                """
                vref_i, win_rows, nslots = scr["wins"][wi]
                vref = vrefs[vref_i]
                src_name = srcs[wi]
                sbuf = hbufs[src_name]
                if src_name == "x" and planar_x:
                    # channels-major window <- two padded planar
                    # operands: full rectangles, no edge cases (the
                    # X_ROW_PAD pad bands absorb the rate-1 halo).
                    # Copy the 8-aligned superset (see the window
                    # allocation); reads add scr["x_off"].
                    x0, x1 = sbuf
                    pc = cin0 // 2
                    g0a = (stride * b * rb - rate + X_ROW_PAD
                           - scr["x_off"])
                    s0 = scr["win_sems"][wi]
                    for j, part in enumerate((x0, x1)):
                        getattr(pltpu.make_async_copy(
                            part.at[:, pl.ds(g0a, scr["x_cp"]), :],
                            vref.at[slot, pl.ds(j * pc, pc)],
                            sem.at[s0 + 2 * slot + j]), action)()
                    return
                semr = sem.at[scr["win_sems"][wi] + slot]
                if src_name == "x":
                    # The operand has no pad rows: edge bands copy one
                    # row fewer and memset the missing edge row.
                    # (rate == 1 for conv1_1.)
                    if nb == 1:
                        if action == "start":
                            vref[slot, 0, :, :] = jnp.zeros(
                                vref.shape[2:], dtype)
                            vref[slot, win_rows - 1, :, :] = jnp.zeros(
                                vref.shape[2:], dtype)
                        getattr(pltpu.make_async_copy(
                            sbuf.at[pl.ds(0, win_rows - 2)],
                            vref.at[slot, pl.ds(1, win_rows - 2)],
                            semr), action)()
                        return

                    @pl.when(b == 0)
                    def _():
                        if action == "start":
                            vref[slot, 0, :, :] = jnp.zeros(
                                vref.shape[2:], dtype)
                        getattr(pltpu.make_async_copy(
                            sbuf.at[pl.ds(0, win_rows - 1)],
                            vref.at[slot, pl.ds(1, win_rows - 1)],
                            semr), action)()

                    @pl.when(b == nb - 1)
                    def _():
                        if action == "start":
                            vref[slot, win_rows - 1, :, :] = jnp.zeros(
                                vref.shape[2:], dtype)
                        getattr(pltpu.make_async_copy(
                            sbuf.at[pl.ds(b * rb - 1, win_rows - 1)],
                            vref.at[slot, pl.ds(0, win_rows - 1)],
                            semr), action)()

                    if nb > 2:
                        @pl.when((b > 0) & (b < nb - 1))
                        def _():
                            getattr(pltpu.make_async_copy(
                                sbuf.at[pl.ds(b * rb - 1, win_rows)],
                                vref.at[slot], semr), action)()
                    return
                spad = bufs_meta[src_name][0]
                if kind == "deconv":
                    g0 = b * (rb // 2) - 1 + spad
                else:
                    g0 = stride * b * rb - rate + spad
                getattr(pltpu.make_async_copy(
                    sbuf.at[pl.ds(g0, win_rows)], vref.at[slot], semr),
                    action)()

            def normalize_win(wi, b, slot):
                av = norms[wi]
                if av is None:
                    return
                a_vec, b_vec = av
                vref_i, win_rows, _ = scr["wins"][wi]
                vref = vrefs[vref_i]
                src_name = srcs[wi]
                spad = bufs_meta[src_name][0]
                srows = bufs_meta[src_name][1]
                if kind == "deconv":
                    g0 = b * (rb // 2) - 1 + spad
                else:
                    g0 = stride * b * rb - rate + spad
                # window rows holding real (non-pad) source rows:
                # global [spad, spad + srows)
                lo = jnp.maximum(0, spad - g0)
                hi = jnp.minimum(win_rows, spad + srows - g0)

                def body(rl, _):
                    row = vref[slot, rl, :, :].astype(jnp.float32)
                    y = jnp.maximum(row * a_vec + b_vec, 0.0)
                    vref[slot, rl, :, :] = y.astype(dtype)
                    return 0
                jax.lax.fori_loop(lo, hi, body, 0)

            ob_i = scr["oband"]
            oslots = scr["oslots"]

            def flush(b, oslot):
                ob = vrefs[ob_i]
                if kind == "head":
                    pltpu.make_async_copy(
                        ob.at[oslot], out_ref.at[pl.ds(b * rb, rb)],
                        sem.at[scr["ob_sems"] + oslot]).start()
                else:
                    pltpu.make_async_copy(
                        ob.at[oslot],
                        dst.at[pl.ds(dpad + b * rb, rb)],
                        sem.at[scr["ob_sems"] + oslot]).start()

            def wait_flush(oslot):
                ob = vrefs[ob_i]
                pltpu.make_async_copy(
                    ob.at[oslot], ob.at[oslot],
                    sem.at[scr["ob_sems"] + oslot]).wait()

            for wi in range(len(srcs)):
                on_win(wi, 0, 0, "start")

            # A stage's windows are either all double-buffered or all
            # single-slot (only conv1_1's planar x window is single —
            # and "x" is that stage's sole source), so row_fn can keep
            # its (b, slot, oslot) signature: slot IS the window slot.
            win_nslots = {scr["wins"][wi][2] for wi in range(len(srcs))}
            assert len(win_nslots) == 1, (name, win_nslots)
            dbuf = win_nslots.pop() > 1

            def band(b, _):
                slot = jax.lax.rem(b, 2) if (nb > 1 and dbuf) else 0
                oslot = (jax.lax.rem(b, 2)
                         if (nb > 1 and oslots > 1) else 0)
                for wi in range(len(srcs)):
                    if nb > 1 and dbuf:
                        @pl.when(b + 1 < nb)
                        def _(wi=wi):
                            on_win(wi, b + 1, 1 - slot, "start")
                    on_win(wi, b, slot, "wait")
                    if not fused_norm:
                        normalize_win(wi, b, slot)
                @pl.when(b >= oslots)
                def _():
                    wait_flush(oslot)
                if fused_norm:
                    row_fn(b, slot, oslot, norms)
                else:
                    row_fn(b, slot, oslot)
                # single-slot windows are free once row_fn consumed
                # them: start the next band's copy before the flush.
                if nb > 1 and not dbuf:
                    for wi in range(len(srcs)):
                        @pl.when(b + 1 < nb)
                        def _(wi=wi):
                            on_win(wi, b + 1, 0, "start")
                flush(b, oslot)
                return 0

            jax.lax.fori_loop(0, nb, band, 0)
            for s in range(oslots):
                wait_flush(s)

        for si, (name, kind, srcs, cins, cout, ind, outd, rate) in \
                enumerate(plan):
            scr = stage_scr[si]
            rb = scr["rb"]
            stats[si, 0] = 0.0
            stats[si, 1] = 0.0

            if kind in ("conv", "down"):
                if coord:
                    Lst, kcx_op, bias, gamma, beta = take(5)
                    cvec_ref = ops[conv_vec_idx[si]]
                else:
                    Lst, bias, gamma, beta = take(4)
                    kcx_op = cvec_ref = None
                ln_params[si] = (gamma, beta)
                stride = 2 if kind == "down" else 1
                # coord SAME stride-2 centers at row 2r+1 (pad_lo=0
                # vertically too): shift the window taps down one row
                voff = rate if (coord and kind == "down") else 0
                sc = cins[0]
                sw = bufs_meta[srcs[0]][3]
                sel = selector(sw) if kind == "down" else None
                vref_i = scr["wins"][0][0]
                r_pack = scr["pack"]

                if planar_x and srcs[0] == "x":
                    # channels-major x window: rows live on the sublane
                    # dim, where only STATIC offsets are legal — the
                    # row-group loop is python-unrolled (rb/r_pack
                    # iterations). conv1_1 only: stride=1, rate=1,
                    # sel=None, sw == swp (input width 128-aligned).
                    def row_fn(b, slot, oslot, vref_i=vref_i, Lst=Lst,
                               bias=bias, sc=sc, sw=sw, cout=cout,
                               si=si, rb=rb, r_pack=r_pack,
                               kcx_op=kcx_op, cvec_ref=cvec_ref,
                               ob_i=scr["oband"],
                               x_off=scr["x_off"],
                               pack_i=scr.get("pack_rhs")):
                        win = vrefs[vref_i]
                        ob = vrefs[ob_i]
                        swp = win.shape[-1]
                        kcx = kcx_op[:, :] if coord else None
                        for rp in range(rb // r_pack):
                            base = rp * r_pack
                            if r_pack > 1:
                                rhsb = vrefs[pack_i]
                                for dy in range(3):
                                    for k in range(r_pack):
                                        rhsb[dy * sc:(dy + 1) * sc,
                                             k * swp:(k + 1) * swp] = \
                                            win[slot, :,
                                                x_off + base + k + dy,
                                                :]
                                rhs = rhsb[0:3 * sc, 0:r_pack * swp]
                                y = jnp.dot(
                                    Lst[:, :], rhs,
                                    preferred_element_type=jnp.float32)
                            else:
                                y = None
                                for dy in range(3):
                                    rr = win[slot, :,
                                             x_off + base + dy, :]
                                    t = jnp.dot(
                                        Lst[:, dy * sc:(dy + 1) * sc],
                                        rr,
                                        preferred_element_type=jnp.float32)
                                    y = t if y is None else y + t
                            dense = (hshift(y[0:cout], 1, sw, False,
                                            swp)
                                     + y[cout:2 * cout]
                                     + hshift(y[2 * cout:3 * cout], 1,
                                              sw, True, swp)
                                     + bias[:, :])
                            if coord:
                                dense = dense + jnp.concatenate(
                                    [coord_bias(kcx, cvec_ref,
                                                b * rb + base + kk,
                                                1, 1, sw, swp)
                                     for kk in range(r_pack)], axis=1)
                            rowq = dense.astype(dtype)
                            for k in range(r_pack):
                                ob[oslot, base + k, :, :] = \
                                    rowq[:, k * swp:(k + 1) * swp]
                            r32 = rowq.astype(jnp.float32)
                            stats[si, 0] = stats[si, 0] + jnp.sum(r32)
                            stats[si, 1] = (stats[si, 1]
                                            + jnp.sum(r32 * r32))

                    stage(si, name, kind, srcs, cins, cout, outd, rate,
                          row_fn)
                    continue

                if r_pack > 1:
                    srows0 = bufs_meta[srcs[0]][1]

                    def row_fn(b, slot, oslot, norms, vref_i=vref_i,
                               Lst=Lst, bias=bias, rate=rate,
                               stride=stride, sel=sel, cout=cout,
                               sc=sc, sw=sw, si=si, rb=rb,
                               r_pack=r_pack, srows=srows0,
                               kcx_op=kcx_op, cvec_ref=cvec_ref,
                               voff=voff,
                               ob_i=scr["oband"],
                               pack_i=scr["pack_rhs"]):
                        win = vrefs[vref_i]
                        ob = vrefs[ob_i]
                        rhsb = vrefs[pack_i]
                        swp = win.shape[-1]
                        av = norms[0]
                        kcx = kcx_op[:, :] if coord else None

                        def one(rp, _):
                            base = rp * r_pack
                            for dy in range(3):
                                for k in range(r_pack):
                                    # real source row of this slot:
                                    # pad rows take the identity affine
                                    sr = (stride * (b * rb + base + k)
                                          + (dy - 1) * rate + voff)
                                    pad_row = (sr < 0) | (sr >= srows)
                                    rhsb[dy * sc:(dy + 1) * sc,
                                         k * swp:(k + 1) * swp] = \
                                        norm_row(
                                            win[slot,
                                                stride * (base + k)
                                                + dy * rate + voff,
                                                :, :],
                                            av, pad_row)
                            rhs = rhsb[0:3 * sc, 0:r_pack * swp]
                            y = jnp.dot(
                                Lst[:, :], rhs,
                                preferred_element_type=jnp.float32)
                            dense = (hshift(y[0:cout], rate, sw, False,
                                            swp)
                                     + y[cout:2 * cout]
                                     + hshift(y[2 * cout:3 * cout],
                                              rate, sw, True, swp)
                                     + bias[:, :])
                            if coord:
                                dense = dense + jnp.concatenate(
                                    [coord_bias(kcx, cvec_ref,
                                                b * rb + base + kk,
                                                stride, rate, sw, swp,
                                                voff)
                                     for kk in range(r_pack)], axis=1)
                            if sel is not None:
                                # per-slot one-hot downsample (zero pad
                                # rows/cols => output pad lanes exact 0)
                                db = dense.astype(dtype)
                                for k in range(r_pack):
                                    outk = jnp.dot(
                                        db[:, k * swp:(k + 1) * swp],
                                        sel[:, :],
                                        preferred_element_type=jnp.float32)
                                    rowq = outk.astype(dtype)
                                    ob[oslot, base + k, :, :] = rowq
                                    r32 = rowq.astype(jnp.float32)
                                    stats[si, 0] = (stats[si, 0]
                                                    + jnp.sum(r32))
                                    stats[si, 1] = (stats[si, 1]
                                                    + jnp.sum(r32 * r32))
                                return 0
                            if swp != sw:
                                lane = jax.lax.broadcasted_iota(
                                    jnp.int32, dense.shape, 1) % swp
                                dense = jnp.where(lane < sw, dense, 0.0)
                            rowq = dense.astype(dtype)
                            for k in range(r_pack):
                                ob[oslot, base + k, :, :] = \
                                    rowq[:, k * swp:(k + 1) * swp]
                            r32 = rowq.astype(jnp.float32)
                            stats[si, 0] = stats[si, 0] + jnp.sum(r32)
                            stats[si, 1] = (stats[si, 1]
                                            + jnp.sum(r32 * r32))
                            return 0

                        jax.lax.fori_loop(0, rb // r_pack, one, 0)

                    stage(si, name, kind, srcs, cins, cout, outd, rate,
                          row_fn, fused_norm=True)
                    continue

                def row_fn(b, slot, oslot, vref_i=vref_i, Lst=Lst,
                           bias=bias, stride=stride, rate=rate,
                           sel=sel, sc=sc, sw=sw, si=si, cout=cout,
                           rb=rb, kcx_op=kcx_op, cvec_ref=cvec_ref,
                           voff=voff, ob_i=scr["oband"]):
                    win = vrefs[vref_i]
                    ob = vrefs[ob_i]

                    swp = win.shape[-1]
                    kcx = kcx_op[:, :] if coord else None

                    def one(rl, _):
                        base = stride * rl + voff
                        if rate == 1:
                            rhs = win[slot, pl.ds(base, 3),
                                      :, :].reshape(3 * sc, swp)
                            y = jnp.dot(Lst[:, :], rhs,
                                        preferred_element_type=jnp.float32)
                        else:
                            y = jnp.zeros((3 * cout, swp), jnp.float32)
                            for dy in range(3):
                                rr = win[slot, base + dy * rate, :, :]
                                y += jnp.dot(
                                    Lst[:, dy * sc:(dy + 1) * sc], rr,
                                    preferred_element_type=jnp.float32)
                        dense = (hshift(y[0:cout], rate, sw, False)
                                 + y[cout:2 * cout]
                                 + hshift(y[2 * cout:3 * cout], rate,
                                          sw, True)
                                 + bias[:, :])
                        if coord:
                            dense = dense + coord_bias(
                                kcx, cvec_ref, b * rb + rl, stride,
                                rate, sw, swp, voff)
                        if sel is not None:
                            # one-hot has zero pad rows/cols: output
                            # pad lanes come out exactly 0
                            dense = jnp.dot(
                                dense.astype(dtype), sel[:, :],
                                preferred_element_type=jnp.float32)
                        elif swp != sw:
                            # zero the pad lanes at store so stats and
                            # downstream reads stay clean
                            lane = jax.lax.broadcasted_iota(
                                jnp.int32, dense.shape, 1)
                            dense = jnp.where(lane < sw, dense, 0.0)
                        rowq = dense.astype(dtype)
                        ob[oslot, rl, :, :] = rowq
                        r32 = rowq.astype(jnp.float32)
                        stats[si, 0] = stats[si, 0] + jnp.sum(r32)
                        stats[si, 1] = stats[si, 1] + jnp.sum(r32 * r32)
                        return 0

                    jax.lax.fori_loop(0, rb, one, 0)

                stage(si, name, kind, srcs, cins, cout, outd, rate,
                      row_fn)

            elif kind == "deconv":
                nsrc = len(srcs)
                Ls = take(nsrc * 2)        # [4*cout, 2cs] per (src, da)
                bias, gamma, beta = take(3)
                ln_params[si] = (gamma, beta)
                dw = bufs_meta[name][3]
                e0, e1 = expander(dw // 2)
                src_dims = [(cins[i], bufs_meta[srcs[i]][3])
                            for i in range(nsrc)]
                r_pack = scr["pack"]

                if r_pack > 1:
                    src_rows = [bufs_meta[s][1] for s in srcs]

                    def row_fn(b, slot, oslot, norms, Ls=Ls, bias=bias,
                               e0=e0, e1=e1, si=si, rb=rb,
                               src_dims=src_dims, src_rows=src_rows,
                               scr=scr, r_pack=r_pack, cout=cout,
                               ob_i=scr["oband"],
                               pack_i=scr["pack_rhs"]):
                        ob = vrefs[ob_i]
                        rhsb = vrefs[pack_i]
                        swp = vrefs[scr["wins"][0][0]].shape[-1]

                        def one(rp, _):
                            base = rp * r_pack
                            for da in range(2):
                                acc = [None, None]
                                for wi, (cs, sws) in \
                                        enumerate(src_dims):
                                    win = vrefs[scr["wins"][wi][0]]
                                    srows = src_rows[wi]
                                    av = norms[wi]
                                    for dy in range(2):
                                        for k in range(r_pack):
                                            sr = (b * (rb // 2) - 1
                                                  + base + k + da + dy)
                                            pad_row = ((sr < 0)
                                                       | (sr >= srows))
                                            rhsb[dy * cs:(dy + 1) * cs,
                                                 k * swp:
                                                 (k + 1) * swp] = \
                                                norm_row(
                                                    win[slot,
                                                        base + k
                                                        + da + dy,
                                                        :, :],
                                                    av, pad_row)
                                    rhs = rhsb[0:2 * cs,
                                               0:r_pack * swp]
                                    y = jnp.dot(
                                        Ls[wi * 2 + da][:, :], rhs,
                                        preferred_element_type=jnp.float32)
                                    for db in range(2):
                                        for kb in range(2):
                                            co = (db * 2 + kb) * cout
                                            yk = y[co:co + cout]
                                            sh = db + kb - 1
                                            if sh == 1:
                                                yk = hshift(yk, 1, sws,
                                                            True, swp)
                                            elif sh == -1:
                                                yk = hshift(yk, 1, sws,
                                                            False, swp)
                                            acc[db] = (
                                                yk if acc[db] is None
                                                else acc[db] + yk)
                                p0 = (acc[0] + bias[:, :]).astype(dtype)
                                p1 = (acc[1] + bias[:, :]).astype(dtype)
                                for k in range(r_pack):
                                    sl = slice(k * swp, (k + 1) * swp)
                                    row = (jnp.dot(
                                        p0[:, sl], e0[:, :],
                                        preferred_element_type=jnp.float32)
                                        + jnp.dot(
                                        p1[:, sl], e1[:, :],
                                        preferred_element_type=jnp.float32))
                                    rowq = row.astype(dtype)
                                    ob[oslot, 2 * (base + k) + da,
                                       :, :] = rowq
                                    r32 = rowq.astype(jnp.float32)
                                    stats[si, 0] = (stats[si, 0]
                                                    + jnp.sum(r32))
                                    stats[si, 1] = (stats[si, 1]
                                                    + jnp.sum(r32 * r32))
                            return 0

                        jax.lax.fori_loop(0, rb // 2 // r_pack, one, 0)

                    stage(si, name, kind, srcs, cins, cout, outd, rate,
                          row_fn, fused_norm=True)
                    continue

                def row_fn(b, slot, oslot, Ls=Ls, bias=bias, e0=e0,
                           e1=e1, si=si, cout=cout, rb=rb,
                           src_dims=src_dims, scr=scr,
                           ob_i=scr["oband"]):
                    ob = vrefs[ob_i]

                    def one(il, _):
                        for da in range(2):
                            parts = [None, None]
                            for wi, (cs, sws) in enumerate(src_dims):
                                win = vrefs[scr["wins"][wi][0]]
                                swp_s = win.shape[-1]
                                rhs = win[slot, pl.ds(il + da, 2),
                                          :, :].reshape(2 * cs, swp_s)
                                y = jnp.dot(
                                    Ls[wi * 2 + da][:, :], rhs,
                                    preferred_element_type=jnp.float32)
                                for db in range(2):
                                    for kb in range(2):
                                        co = (db * 2 + kb) * cout
                                        yk = y[co:co + cout]
                                        sh = db + kb - 1
                                        if sh == 1:
                                            yk = hshift(yk, 1, sws, True)
                                        elif sh == -1:
                                            yk = hshift(yk, 1, sws,
                                                        False)
                                        parts[db] = (
                                            yk if parts[db] is None
                                            else parts[db] + yk)
                            parts = [pp + bias[:, :] for pp in parts]
                            row = (jnp.dot(
                                parts[0].astype(dtype), e0[:, :],
                                preferred_element_type=jnp.float32)
                                + jnp.dot(
                                parts[1].astype(dtype), e1[:, :],
                                preferred_element_type=jnp.float32))
                            rowq = row.astype(dtype)
                            ob[oslot, 2 * il + da, :, :] = rowq
                            r32 = rowq.astype(jnp.float32)
                            stats[si, 0] = stats[si, 0] + jnp.sum(r32)
                            stats[si, 1] = (stats[si, 1]
                                            + jnp.sum(r32 * r32))
                        return 0

                    jax.lax.fori_loop(0, rb // 2, one, 0)

                stage(si, name, kind, srcs, cins, cout, outd, rate,
                      row_fn)

            elif kind == "head":
                L, bias = take(2)
                r_pack = scr["pack"]

                if r_pack > 1:
                    def row_fn(b, slot, oslot, norms, L=L, bias=bias,
                               vref_i=scr["wins"][0][0], rb=rb,
                               sc=cins[0], r_pack=r_pack,
                               ob_i=scr["oband"],
                               pack_i=scr["pack_rhs"]):
                        win = vrefs[vref_i]
                        ob = vrefs[ob_i]
                        rhsb = vrefs[pack_i]
                        swp = win.shape[-1]
                        av = norms[0]
                        never_pad = jnp.bool_(False)  # 1x1: real rows only

                        def one(rp, _):
                            base = rp * r_pack
                            for k in range(r_pack):
                                rhsb[0:sc, k * swp:(k + 1) * swp] = \
                                    norm_row(win[slot, base + k + 1,
                                                 :, :], av, never_pad)
                            y = jnp.dot(
                                L[:, :], rhsb[0:sc, 0:r_pack * swp],
                                preferred_element_type=jnp.float32)
                            t = jnp.tanh(y + bias[:, :])
                            for k in range(r_pack):
                                ob[oslot, base + k, :, :] = \
                                    t[:, k * swp:(k + 1) * swp]
                            return 0

                        jax.lax.fori_loop(0, rb // r_pack, one, 0)

                    stage(si, name, kind, srcs, cins, cout, outd, rate,
                          row_fn, fused_norm=True)
                    continue
                else:
                    def row_fn(b, slot, oslot, L=L, bias=bias,
                               vref_i=scr["wins"][0][0], rb=rb,
                               ob_i=scr["oband"]):
                        win = vrefs[vref_i]
                        ob = vrefs[ob_i]

                        def one(rl, _):
                            y = jnp.dot(L[:, :], win[slot, rl + 1, :, :],
                                        preferred_element_type=jnp.float32)
                            ob[oslot, rl, :, :] = jnp.tanh(y + bias[:, :])
                            return 0

                        jax.lax.fori_loop(0, rb, one, 0)

                stage(si, name, kind, srcs, cins, cout, outd, rate,
                      row_fn)

    scratch = (vmem_scratch
               + [pltpu.SMEM((len(plan), 2), jnp.float32),
                  pltpu.SemaphoreType.DMA((n_sems,))])
    return kernel, scratch, total_ops, hbm_out_shapes, vmem_bytes


def coord_operands(h: int, ngf: int, cin0: int,
                   num_outputs: int) -> List[Array]:
    """Per-conv-stage |sin(lat)| column vectors (padded 2 rows each
    side with zeros — SAME vertical padding of the coord channel), in
    plan order, at each stage's INPUT resolution."""
    out = []
    for (name, kind, srcs, cins, cout, ind, outd, rate) in unet_plan(
            ngf, cin0, num_outputs):
        if kind not in ("conv", "down"):
            continue
        his = h // ind
        lat = np.linspace(-np.pi / 2, np.pi / 2, his)
        # ROW vector [1, his + 4]: SMEM windows are padded per ROW
        # (measured 512 B/row on v5e), so a column vector costs
        # rows*512 B — the 14 stage vectors at 640x320 totalled 1.02 MB
        # and blew the 1 MB SMEM budget at compile time. One row each
        # keeps the whole set ~7 KB.
        vec = np.zeros((1, his + 4), np.float32)
        vec[0, 2:2 + his] = np.abs(np.sin(lat)).astype(np.float32)
        out.append(jnp.asarray(vec))
    return out


@functools.partial(jax.jit, static_argnames=(
    "h", "w", "ngf", "cin0", "num_outputs", "interpret", "planar_x",
    "variant", "x_slots"))
def _forward(operands, h: int, w: int, ngf: int, cin0: int,
             num_outputs: int, interpret: bool = False,
             planar_x: bool = False, variant: str = "wrap",
             x_slots: int = 1) -> Array:
    dtype = operands[0].dtype
    kernel, scratch, total_ops, hbm_out_shapes, vmem_bytes = _build_kernel(
        h, w, ngf, cin0, num_outputs, dtype, planar_x=planar_x,
        variant=variant, x_slots=x_slots)
    # Build-time guard: the declared scratch must fit under the Mosaic
    # limit with headroom for the compiler's own temporaries. Failing
    # here names the overflow; failing inside Mosaic does not.
    assert vmem_bytes <= VMEM_LIMIT_BYTES - 8 * 1024 * 1024, (
        f"U-Net kernel scratch {vmem_bytes / 2**20:.1f} MiB leaves "
        f"<8 MiB headroom under VMEM_LIMIT_BYTES "
        f"({VMEM_LIMIT_BYTES / 2**20:.0f} MiB) — shrink _ROW_BAND or "
        f"the window set")
    n_x = 2 if planar_x else 1
    n_cvecs = (sum(1 for e in unet_plan(ngf, cin0, num_outputs)
                   if e[1] in ("conv", "down"))
               if variant == "coord" else 0)
    in_specs = ([pl.BlockSpec(memory_space=pl.ANY)] * n_x
                + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                * (total_ops - n_x - n_cvecs)
                + [pl.BlockSpec(memory_space=pltpu.SMEM)] * n_cvecs)
    out_shape = ([jax.ShapeDtypeStruct((h, num_outputs, w), jnp.float32)]
                 + [jax.ShapeDtypeStruct(shp, dt)
                    for shp, dt in hbm_out_shapes])
    outs = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(out_shape),
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(*operands)
    return outs[0]


def unet_forward(x_row_major: Array, params_ops: List[Array], ngf: int,
                 num_outputs: int, interpret: bool = False,
                 flipped: bool = False, variant: str = "wrap",
                 x_slots: int = None) -> Array:
    """x_row_major: [H, C0, W] (bf16 recommended). Returns the tanh'd
    prediction in ROW-MAJOR [H, num_outputs, W] float32 (the transposed
    layout the prepared-assemble path wants).

    flipped: params_ops came from prepare_params(flipped=True) and
    x_row_major is the W-FLIPPED input; the output is then the W-flipped
    prediction.

    PLANAR mode: pass x_row_major as a TUPLE of two plane-major
    operands [P*C, H + 2*X_ROW_PAD, W] (fg/bg volumes from
    pallas_sweep.ods_sweep_identity_planar, already W-flipped — use
    flipped=True params) — the kernel consumes them directly with no
    XLA layout pass."""
    if isinstance(x_row_major, (tuple, list)):
        if x_slots is None:
            # net_x2 was measured (and fits) on the WRAP variant; the
            # coord build's extra scratch puts the 2-slot window 752 KB
            # over Mosaic's 127 MiB scoped-VMEM budget at 640x320x32
            # (measured OOM, tools/r4_hw_session coordnet phase) — keep
            # coord single-slot regardless of the armed flag.
            x_slots = (2 if _default_net_x2() and variant != "coord"
                       else 1)
        x0, x1 = x_row_major
        pc, hp, w = x0.shape
        assert x1.shape == x0.shape, (x0.shape, x1.shape)
        h = hp - 2 * X_ROW_PAD
        ops = ([x0, x1] + list(params_ops)
               + static_operands(w, x0.dtype, flipped, variant))
        if variant == "coord":
            ops += coord_operands(h, ngf, 2 * pc, num_outputs)
        return _forward(tuple(ops), h=h, w=w, ngf=ngf, cin0=2 * pc,
                        num_outputs=num_outputs, interpret=interpret,
                        planar_x=True, variant=variant,
                        x_slots=x_slots)
    h, c0, w = x_row_major.shape
    ops = ([x_row_major] + list(params_ops)
           + static_operands(w, x_row_major.dtype, flipped,
                              variant))
    if variant == "coord":
        ops += coord_operands(h, ngf, c0, num_outputs)
    return _forward(tuple(ops), h=h, w=w, ngf=ngf, cin0=c0,
                    num_outputs=num_outputs, interpret=interpret,
                    variant=variant)
