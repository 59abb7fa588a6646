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
    normalize + relu are fused into every CONSUMER's rhs load, so LN
    costs one multiply-add per read instead of extra passes.
  * Vertical pad is zero-pad (nets.py wrap_pad pads H with zeros):
    row -1 and row H are zero rows kept in each buffer's allocation.

The kernel is inference-only (training keeps the XLA path; the jitted
XLA net is also the fallback wherever shapes/backends don't fit).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# ---------------------------------------------------------------------------
# Layer plan: the wrap-variant U-Net topology (nets.py:403-450), ngf=64.
# Each entry: (name, kind, cin(s), cout, scale) where scale is the
# output resolution divisor relative to full res.
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
#
# For a conv layer the kernel wants, per dx in {-1, 0, 1}, the lhs
# L_dx [cout, 3*cin] with K ordered (dy, c) so that the rhs
# rows[r-1:r+2].reshape(3C, W) lines up. For deconvs (2x2 subpixel
# decomposition) it wants L_{da,db}[4] each [cout4=4f slots...] — we
# emit [4f, cin] per 2x2 tap instead: out4 = sum_taps T_tap @ x_tap.
# ---------------------------------------------------------------------------


def _conv_lhs(kernel: np.ndarray | Array, dtype):
    """kernel [3, 3, cin, cout] -> three [cout, 3*cin] dx-grouped lhs.

    L_dx[o, dy * cin + c] = kernel[dy, dx + 1, c, o].
    """
    k = jnp.asarray(kernel)
    # [3dy, 3dx, cin, cout] -> dx list of [cout, 3dy*cin]
    out = []
    for dx in range(3):
        sub = k[:, dx]                           # [3, cin, cout]
        sub = jnp.transpose(sub, (2, 0, 1))      # [cout, 3, cin]
        out.append(sub.reshape(sub.shape[0], -1).astype(dtype))
    return out


def _deconv_lhs(kernel: np.ndarray | Array, dtype):
    """kernel [4, 4, cin, cout] (ConvTranspose layout) -> per 2x2 tap
    (ka, kb) the lhs [4*cout, cin] stacking the four output parities.

    Subpixel identity (models/unet.py:124-131): parity (da, db) of the
    output at (2r+da, 2c+db) is a dense conv with kernel[da::2, db::2]
    evaluated with taps offset (1+da, 1+db) on the wrap(2,2)-padded
    input; on the unpadded input grid the 2x2 tap (ka, kb) reads input
    row r + ka - ... — worked out in `deconv_rows` below.
    """
    k = jnp.asarray(kernel)
    cout = k.shape[-1]
    taps = {}
    for ka in range(2):
        for kb in range(2):
            parts = []
            for da in range(2):
                for db in range(2):
                    sub = k[da::2, db::2]        # [2, 2, cin, cout]
                    parts.append(jnp.transpose(sub[ka, kb], (1, 0)))
            taps[(ka, kb)] = jnp.concatenate(parts, axis=0).astype(dtype)
    return taps, cout


def _even_select(w: int, dtype):
    """One-hot [W, W/2] selecting even lanes: (x @ S)[c] = x[2c]."""
    s = np.zeros((w, w // 2), np.float32)
    s[np.arange(0, w, 2), np.arange(w // 2)] = 1.0
    return jnp.asarray(s, dtype=dtype)


def _interleave_expand(w_half: int, parity: int, dtype):
    """One-hot [W/2, W] scattering lanes to (2c + parity)."""
    s = np.zeros((w_half, 2 * w_half), np.float32)
    s[np.arange(w_half), 2 * np.arange(w_half) + parity] = 1.0
    return jnp.asarray(s, dtype=dtype)


def prepare_params(flax_params: Dict, ngf: int, cin0: int,
                   num_outputs: int, dtype=jnp.bfloat16) -> List[Array]:
    """Flax MSIUNet (variant='wrap') param tree -> flat kernel operands.

    Per layer: conv/down -> [L0, L1, L2 ([cout, 3cin] dx-grouped), bias,
    gamma, beta]; deconv -> per source s, per (da, db, kb) the lhs
    [cout, 2*cin_s] (ka merged into K), then bias, gamma, beta; head ->
    [L [cout, cin], bias]. Biases/ln params stay f32.
    """
    p = flax_params["params"] if "params" in flax_params else flax_params
    ops: List[Array] = []
    for (name, kind, srcs, cins, cout, ind, outd, rate) in unet_plan(
            ngf, cin0, num_outputs):
        lp = p[name]
        k = jnp.asarray(lp["kernel"])
        if kind in ("conv", "down"):
            ops += _conv_lhs(k, dtype)
        elif kind == "deconv":
            # k: [4, 4, cin_total, cout]; split K by source
            off = 0
            for cs in cins:
                ks = k[:, :, off:off + cs]
                off += cs
                for da in range(2):
                    for db in range(2):
                        for kb in range(2):
                            # L[(da,db,kb)][o, ka*cs + c] =
                            #   k[da + 2*ka, db + 2*kb, c, o]
                            sub = jnp.stack(
                                [jnp.transpose(ks[da + 2 * ka, db + 2 * kb],
                                               (1, 0)) for ka in range(2)],
                                axis=1)          # [cout, 2, cs]
                            ops.append(sub.reshape(cout, 2 * cs)
                                       .astype(dtype))
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


# ---------------------------------------------------------------------------
# The kernel builder.
# ---------------------------------------------------------------------------

_EPS = 1e-12


def _build_kernel(h: int, w: int, ngf: int, cin0: int, num_outputs: int,
                  dtype):
    """Returns (kernel_fn, scratch_shapes, n_operands). One grid step;
    all activations live in scratch buffers [rows + 2*pad, C, W]."""
    plan = unet_plan(ngf, cin0, num_outputs)

    # buffer pool: reuse buffers of identical shape when lifetimes allow
    # (see module docstring). name -> (buf_index, pad, rows, c, w)
    pools = {
        "x": (0, 1, h, cin0, w),
        "conv1_1": (1, 1, h, ngf, w),
        "conv1_2": (2, 1, h // 2, 2 * ngf, w // 2),
        "conv2_1": (3, 1, h // 2, 2 * ngf, w // 2),
        "conv2_2": (4, 1, h // 4, 4 * ngf, w // 4),
        "conv3_1": (5, 1, h // 4, 4 * ngf, w // 4),
        "conv3_2": (6, 1, h // 4, 4 * ngf, w // 4),
        "conv3_3": (7, 2, h // 8, 8 * ngf, w // 8),
        "conv4_1": (8, 2, h // 8, 8 * ngf, w // 8),
        "conv4_2": (9, 2, h // 8, 8 * ngf, w // 8),
        "conv4_3": (8, 2, h // 8, 8 * ngf, w // 8),   # reuse conv4_1
        "conv6_1": (10, 1, h // 4, 4 * ngf, w // 4),
        "conv6_2": (5, 1, h // 4, 4 * ngf, w // 4),   # reuse conv3_1
        "conv6_3": (6, 1, h // 4, 4 * ngf, w // 4),   # reuse conv3_2
        "conv7_1": (11, 1, h // 2, 2 * ngf, w // 2),
        "conv7_2": (3, 1, h // 2, 2 * ngf, w // 2),   # reuse conv2_1
        "conv8_1": (1, 1, h, ngf, w),                 # reuse conv1_1
        "conv8_2": (12, 1, h, ngf, w),
    }
    n_bufs = 13
    buf_shapes: List = [None] * n_bufs
    for name, (bi, pad, rows, c, ww) in pools.items():
        shp = (rows + 2 * pad, c, ww)
        if buf_shapes[bi] is None:
            buf_shapes[bi] = shp
        else:
            assert buf_shapes[bi] == shp, (name, shp, buf_shapes[bi])
    scratch = [pltpu.VMEM(s, dtype) for s in buf_shapes]
    scratch.append(pltpu.SMEM((len(plan), 2), jnp.float32))  # LN stats

    # operand count per layer kind
    def n_ops(kind, nsrc):
        if kind == "head":
            return 2
        if kind == "deconv":
            return nsrc * 8 + 3
        return 6

    total_params = 1 + sum(n_ops(k, len(s)) for (_, k, s, *_r) in plan)
    # static one-hot operands: even-select at each down layer's input
    # width, interleave-expanders at each deconv's half output width
    sel_widths = [w, w // 2, w // 4]
    exp_widths = [w // 8, w // 4, w // 2]
    total_ops = total_params + len(sel_widths) + 2 * len(exp_widths)

    def selector(ops, ww):
        return ops[total_params + sel_widths.index(ww)]

    def expander(ops, wh):
        i = total_params + len(sel_widths) + 2 * exp_widths.index(wh)
        return ops[i], ops[i + 1]

    def kernel(*refs):
        ops = list(refs[:total_ops])
        out_ref = refs[total_ops]
        bufs = list(refs[total_ops + 1: total_ops + 1 + n_bufs])
        stats = refs[total_ops + 1 + n_bufs]

        x_in = ops[0]
        oi = 1

        def buf_of(name):
            bi, pad, rows, c, ww = pools[name]
            return bufs[bi], pad, rows, c, ww

        # stage 0: copy the input into the padded x buffer (zero pad
        # rows). Replaced by banded HBM DMA in the streaming variant.
        xb, xpad, xrows, xc, xw = buf_of("x")
        xb[0, :, :] = jnp.zeros((xc, xw), dtype)
        xb[xrows + 1, :, :] = jnp.zeros((xc, xw), dtype)

        def cp(r, _):
            xb[r + 1, :, :] = x_in[r, :, :]
            return 0
        jax.lax.fori_loop(0, xrows, cp, 0)

        def zero_pads(name):
            b, pad, rows, c, ww = buf_of(name)
            for i in range(pad):
                b[i, :, :] = jnp.zeros((c, ww), dtype)
                b[pad + rows + i, :, :] = jnp.zeros((c, ww), dtype)

        def normalize(li, name, cout):
            """In-place LN + relu over the real rows of `name`."""
            b, pad, rows, c, ww = buf_of(name)
            n = float(rows * c * ww)
            s1 = stats[li, 0]
            s2 = stats[li, 1]
            mean = s1 / n
            var = jnp.maximum(s2 / n - mean * mean, 0.0)
            inv = jax.lax.rsqrt(var + _EPS)
            _, _, gamma, beta = lp_cache[li]
            a_vec = gamma[:, :] * inv                  # [C, 1]
            b_vec = beta[:, :] - mean * a_vec

            def body(r, _):
                row = b[r + pad, :, :].astype(jnp.float32)
                y = jnp.maximum(row * a_vec + b_vec, 0.0)
                b[r + pad, :, :] = y.astype(dtype)
                return 0
            jax.lax.fori_loop(0, rows, body, 0)

        def acc_stats(li, row_bf16):
            r32 = row_bf16.astype(jnp.float32)
            stats[li, 0] = stats[li, 0] + jnp.sum(r32)
            stats[li, 1] = stats[li, 1] + jnp.sum(r32 * r32)

        lp_cache = {}

        for li, (name, kind, srcs, cins, cout, ind, outd, rate) in \
                enumerate(plan):
            stats[li, 0] = 0.0
            stats[li, 1] = 0.0
            if kind in ("conv", "down"):
                L0, L1, L2, bias, gamma, beta = ops[oi:oi + 6]
                oi += 6
                lp_cache[li] = (None, bias, gamma, beta)
                src, spad, srows, sc, sw = buf_of(srcs[0])
                dst, dpad, drows, dc, dw = buf_of(name)
                zero_pads(name)
                stride = 2 if kind == "down" else 1
                sel = selector(ops, sw) if kind == "down" else None

                def conv_row(r, _, src=src, spad=spad, dst=dst,
                             dpad=dpad, L0=L0, L1=L1, L2=L2, bias=bias,
                             stride=stride, rate=rate, sel=sel, sc=sc,
                             sw=sw, li=li, cout=cout):
                    base = stride * r + spad - rate
                    if rate == 1:
                        rhs = src[pl.ds(base, 3), :, :].reshape(3 * sc, sw)
                        y0 = jnp.dot(L0[:, :], rhs,
                                     preferred_element_type=jnp.float32)
                        y1 = jnp.dot(L1[:, :], rhs,
                                     preferred_element_type=jnp.float32)
                        y2 = jnp.dot(L2[:, :], rhs,
                                     preferred_element_type=jnp.float32)
                    else:
                        # dilated: rows base, base+rate, base+2*rate are
                        # not contiguous; per-dy dots (K = C)
                        y0 = y1 = y2 = jnp.zeros((cout, sw), jnp.float32)
                        for dy in range(3):
                            rr = src[base + dy * rate, :, :]
                            y0 += jnp.dot(L0[:, dy * sc:(dy + 1) * sc], rr,
                                          preferred_element_type=jnp.float32)
                            y1 += jnp.dot(L1[:, dy * sc:(dy + 1) * sc], rr,
                                          preferred_element_type=jnp.float32)
                            y2 += jnp.dot(L2[:, dy * sc:(dy + 1) * sc], rr,
                                          preferred_element_type=jnp.float32)
                    dense = (pltpu.roll(y0, rate, axis=1) + y1
                             + pltpu.roll(y2, sw - rate, axis=1)
                             + bias[:, :])
                    if sel is not None:
                        dense = jnp.dot(dense.astype(dtype), sel[:, :],
                                        preferred_element_type=jnp.float32)
                    rowq = dense.astype(dtype)
                    dst[r + dpad, :, :] = rowq
                    acc_stats(li, rowq)
                    return 0

                jax.lax.fori_loop(0, drows, conv_row, 0)
                normalize(li, name, cout)

            elif kind == "deconv":
                nsrc = len(srcs)
                Ls = ops[oi:oi + nsrc * 8]
                bias, gamma, beta = ops[oi + nsrc * 8: oi + nsrc * 8 + 3]
                oi += nsrc * 8 + 3
                lp_cache[li] = (None, bias, gamma, beta)
                dst, dpad, drows, dc, dw = buf_of(name)
                zero_pads(name)
                e0, e1 = expander(ops, dw // 2)
                src_info = [buf_of(s) for s in srcs]

                def dec_row(i, _, Ls=Ls, bias=bias, dst=dst, dpad=dpad,
                            src_info=src_info, e0=e0, e1=e1, li=li,
                            cout=cout, dw=dw):
                    # output rows 2i (da=0) and 2i+1 (da=1)
                    for da in range(2):
                        parts = []
                        for db in range(2):
                            acc = None
                            for si, (sb, sp, srows_s, sc_s, sw_s) in \
                                    enumerate(src_info):
                                rhs = sb[pl.ds(i + da - 1 + sp, 2),
                                         :, :].reshape(2 * sc_s, sw_s)
                                for kb in range(2):
                                    Lk = Ls[si * 8 + da * 4 + db * 2 + kb]
                                    yk = jnp.dot(
                                        Lk[:, :], rhs,
                                        preferred_element_type=jnp.float32)
                                    sh = db + kb - 1
                                    if sh == 1:
                                        yk = pltpu.roll(yk, sw_s - 1,
                                                        axis=1)
                                    elif sh == -1:
                                        yk = pltpu.roll(yk, 1, axis=1)
                                    acc = yk if acc is None else acc + yk
                            parts.append(acc + bias[:, :])
                        row = (jnp.dot(parts[0].astype(dtype), e0[:, :],
                                       preferred_element_type=jnp.float32)
                               + jnp.dot(parts[1].astype(dtype), e1[:, :],
                                         preferred_element_type=jnp.float32))
                        rowq = row.astype(dtype)
                        dst[2 * i + da + dpad, :, :] = rowq
                        acc_stats(li, rowq)
                    return 0

                jax.lax.fori_loop(0, drows // 2, dec_row, 0)
                normalize(li, name, cout)

            elif kind == "head":
                L, bias = ops[oi:oi + 2]
                oi += 2
                src, spad, srows, sc, sw = buf_of(srcs[0])

                def head_row(r, _, L=L, bias=bias, src=src, spad=spad):
                    y = jnp.dot(L[:, :], src[r + spad, :, :],
                                preferred_element_type=jnp.float32)
                    out_ref[r, :, :] = jnp.tanh(y + bias[:, :])
                    return 0

                jax.lax.fori_loop(0, srows, head_row, 0)

    return kernel, scratch, total_ops


@functools.partial(jax.jit, static_argnames=(
    "h", "w", "ngf", "cin0", "num_outputs", "interpret"))
def _forward(operands, h: int, w: int, ngf: int, cin0: int,
             num_outputs: int, interpret: bool = False) -> Array:
    dtype = operands[0].dtype
    kernel, scratch, total_ops = _build_kernel(h, w, ngf, cin0,
                                               num_outputs, dtype)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * total_ops,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, num_outputs, w), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(*operands)


def static_operands(w: int, dtype=jnp.bfloat16) -> List[Array]:
    """The one-hot stride-select / interleave-expand constants (appended
    after the params in the operand list; see _build_kernel)."""
    out = [_even_select(ww, dtype) for ww in (w, w // 2, w // 4)]
    for wh in (w // 8, w // 4, w // 2):
        out.append(_interleave_expand(wh, 0, dtype))
        out.append(_interleave_expand(wh, 1, dtype))
    return out


def unet_forward(x_row_major: Array, params_ops: List[Array], ngf: int,
                 num_outputs: int, interpret: bool = False) -> Array:
    """x_row_major: [H, C0, W] (bf16 recommended). Returns the tanh'd
    prediction in ROW-MAJOR [H, num_outputs, W] float32 (the transposed
    layout the prepared-assemble path wants)."""
    h, c0, w = x_row_major.shape
    ops = ([x_row_major] + list(params_ops)
           + static_operands(w, x_row_major.dtype))
    return _forward(tuple(ops), h=h, w=w, ngf=ngf, cin0=c0,
                    num_outputs=num_outputs, interpret=interpret)

