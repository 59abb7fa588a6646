"""Pallas 3x3 wrap-convolution (EXPERIMENT — default OFF, see below).

Motivation: on the bench chip, GEMM throughput is set almost entirely
by the output width N (measured in-kernel, chained: N=64 -> 21 TFLOP/s,
N=256 -> 67, N=512 -> 140 of the 197 bf16 peak), so the net's N=64..256
convs run at 5-10%% MXU under XLA. This kernel folds all 9 taps of a
3x3 wrap conv into ONE wide GEMM [M, Cin] @ [Cin, 9*Cout] (high-N rate)
and shift-reduces the tap groups: group (dy, dx) lands at row offset dy
with a circular column roll of 1-dx — the roll IS the ERP wrap padding
(nets.py:288-295); rolls act on the f32 GEMM result because Mosaic's
rotate is 32-bit-only.

MEASURED RESULTS (2026-08, v5e via axon), both variants:
- pre-tiled variant (conv3x3_wrap): full net 11.5 ms vs 7.3 ms XLA —
  the XLA-side halo pre-tiling (BlockSpecs cannot overlap, ~1.25x
  activation copies) plus f32 outputs dominate on a chip measured at
  ~250-370 GB/s practical HBM bandwidth.
- manual-DMA variant (conv3x3_wrap_dma): double-buffered HBM->VMEM halo
  windows, bf16 outputs, lane-padded channels. ISOLATED it beats the
  XLA conv clearly (conv1_1-shape chained: 1.74 ms vs 2.53 ms incl.
  identical harness overhead — ~2.5x on the conv itself). IN THE NET it
  still loses (10.96 ms vs 7.35): eight pallas_call boundaries break
  XLA's conv+layernorm+relu+pad fusion pipelines, and the zero-pad /
  channel-pad copies recur per layer.
- fused conv + LN-statistics (conv3x3_ln_stats): the epilogue fusion
  was built and is exact (the kernel accumulates the layer-norm sums,
  XLA runs only the normalize+relu pass), and STILL loses in-net —
  even gating it to conv1_1 ALONE costs the whole net +3.4 ms (10.8 vs
  7.3) while winning 0.8 ms isolated. The penalty is program-level:
  a single tpu_custom_call boundary breaks XLA's cross-layer software
  pipelining/async scheduling for the surrounding program (compiled
  HLO shows no extra copies/transposes; the loss is scheduling).
CONCLUSION: on this toolchain, Pallas wins inside this net only at
whole-subgraph granularity (e.g. the entire encoder in one kernel) —
per-layer kernels cannot pay back the custom-call scheduling penalty.
All three variants stay correct + tested; `MSIUNet(use_pallas_conv=
True)` opts in (gated to fat-input layers) for future toolchains.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

ROW_BLOCK = 8


def _conv_kernel(x_ref, w_ref, out_ref, g_ref, *, row_block: int,
                 width: int, cin: int, cout: int):
    """Grid (H/RB,). x_ref block: [1, RB+2, W, Cin] (1-row halo each
    side, pre-tiled from the zero-padded input); w_ref: [Cin, 9*Cout]
    (tap-major groups); out block: [RB, W, Cout] f32; g scratch:
    [RB+2, W, 9*Cout] f32.

    ONE wide GEMM computes every tap's contribution at every position —
    measured MXU rates on this chip are set by the GEMM's N (N=64 runs
    at 11%, N>=512 at 70%+), so folding the 9 taps into N is a ~7x
    arithmetic-rate win over 9 narrow GEMMs. The tap groups are then
    shift-reduced: group (dy, dx) contributes its value at row offset
    dy, column-rolled by 1-dx (circular roll == ERP wrap padding,
    nets.py:288-295; rolls are on the f32 GEMM result because Mosaic's
    rotate is 32-bit-only)."""
    a = x_ref[0].reshape((row_block + 2) * width, cin)
    g_ref[:, :, :] = jnp.dot(a, w_ref[:, :],
                             preferred_element_type=jnp.float32
                             ).reshape(row_block + 2, width, 9 * cout)
    acc = None
    for dy in range(3):
        for dx in range(3):
            gslot = dy * 3 + dx
            gi = g_ref[dy:dy + row_block, :,
                       gslot * cout:(gslot + 1) * cout]
            if dx == 0:
                gi = pltpu.roll(gi, 1, axis=1)
            elif dx == 2:
                gi = pltpu.roll(gi, width - 1, axis=1)
            acc = gi if acc is None else acc + gi
    out_ref[:, :, :] = acc


@functools.partial(jax.jit, static_argnames=("row_block", "interpret"))
def _conv3x3_wrap(x: Array, kernel: Array, row_block: int,
                  interpret: bool = False) -> Array:
    """x: [H, W, Cin] (any dtype); kernel: [3, 3, Cin, Cout] ->
    [H, W, Cout] f32 raw conv with horizontal wrap + vertical zero pad."""
    h, w, cin = x.shape
    cout = kernel.shape[-1]
    xp = jnp.pad(x, ((1, 1), (0, 0), (0, 0)))
    nb = h // row_block
    # overlapping halo windows pre-tiled in XLA (BlockSpecs cannot
    # overlap); ~(RB+2)/RB extra input traffic, revisit with manual HBM
    # DMA if it shows up in profiles
    xt = jnp.stack([
        jax.lax.dynamic_slice_in_dim(xp, i * row_block, row_block + 2, 0)
        for i in range(nb)])
    # [3, 3, Cin, Cout] -> [Cin, 9*Cout], tap-major groups
    kmat = jnp.transpose(kernel.reshape(9, cin, cout),
                         (1, 0, 2)).reshape(cin, 9 * cout).astype(x.dtype)

    out = pl.pallas_call(
        functools.partial(_conv_kernel, row_block=row_block, width=w,
                          cin=cin, cout=cout),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, row_block + 2, w, cin),
                         lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, 9 * cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_block, w, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((row_block + 2, w, 9 * cout),
                                   jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xt, kmat)
    return out


def conv3x3_wrap(x: Array, kernel: Array, bias: Optional[Array] = None,
                 row_block: int = ROW_BLOCK,
                 interpret: bool = False) -> Optional[Array]:
    """Batched wrap conv: x [B, H, W, Cin], kernel [3, 3, Cin, Cout].

    Returns [B, H, W, Cout] f32, or None when the shape doesn't fit
    (caller falls back to the XLA conv).
    """
    b, h, w, cin = x.shape
    if h % row_block or w % 8:
        # lanes carry the CHANNEL dim; W only needs sublane alignment
        return None
    if not interpret and jax.default_backend() != "tpu":
        return None
    outs = [_conv3x3_wrap(x[i], kernel, row_block, interpret=interpret)
            for i in range(b)]
    out = jnp.stack(outs)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out


# ---------------------------------------------------------------------------
# Manual-DMA halo variant: input stays in HBM, each grid step DMAs its
# (overlapping) halo window into a double-buffered VMEM slot — no XLA
# pre-tiling copy — and writes bf16.
# ---------------------------------------------------------------------------

def _conv_kernel_dma(x_hbm, w_ref, out_ref, win_ref, g_ref, sem, *,
                     row_block: int, width: int, cin: int, cout: int,
                     nb: int):
    """Grid (NB,). x_hbm: [H+2, W, Cin] (zero row-padded) left in HBM;
    win scratch: [2, RB+2, W, Cin] double buffer; g: [RB+2, W, 9*Cout]
    f32; sem: DMA((2,)). The wide GEMM + shift-reduce as in
    _conv_kernel."""
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)
    nslot = 1 - slot

    def window_copy(step, s):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(step * row_block, row_block + 2)],
            win_ref.at[s], sem.at[s])

    @pl.when(i == 0)
    def _():
        window_copy(0, 0).start()

    @pl.when(i + 1 < nb)
    def _():
        window_copy(i + 1, nslot).start()

    window_copy(i, slot).wait()

    a = win_ref[slot].reshape((row_block + 2) * width, cin)
    g_ref[:, :, :] = jnp.dot(a, w_ref[:, :],
                             preferred_element_type=jnp.float32
                             ).reshape(row_block + 2, width, 9 * cout)
    acc = None
    for dy in range(3):
        for dx in range(3):
            gslot = dy * 3 + dx
            gi = g_ref[dy:dy + row_block, :,
                       gslot * cout:(gslot + 1) * cout]
            if dx == 0:
                gi = pltpu.roll(gi, 1, axis=1)
            elif dx == 2:
                gi = pltpu.roll(gi, width - 1, axis=1)
            acc = gi if acc is None else acc + gi
    out_ref[:, :, :] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("row_block", "interpret"))
def _conv3x3_wrap_dma(x: Array, kernel: Array, row_block: int,
                      interpret: bool = False) -> Array:
    """x: [H, W, Cin] -> [H, W, Cout] in x.dtype (bf16 halves the output
    write); horizontal wrap + vertical zero pad."""
    h, w, cin = x.shape
    cout = kernel.shape[-1]
    # HBM slices must be lane-aligned: pad Cin to a multiple of 128
    # (zero channels; matching zero GEMM rows keep the result exact)
    cpad = 128 * -(-cin // 128)
    xp = jnp.pad(x, ((1, 1), (0, 0), (0, cpad - cin)))
    nb = h // row_block
    kmat = jnp.transpose(kernel.reshape(9, cin, cout),
                         (1, 0, 2)).reshape(cin, 9 * cout).astype(x.dtype)
    kmat = jnp.pad(kmat, ((0, cpad - cin), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_conv_kernel_dma, row_block=row_block, width=w,
                          cin=cpad, cout=cout, nb=nb),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((cpad, 9 * cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_block, w, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, row_block + 2, w, cpad), x.dtype),
            pltpu.VMEM((row_block + 2, w, 9 * cout), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xp, kmat)
    return out


def conv3x3_wrap_dma(x: Array, kernel: Array,
                     bias: Optional[Array] = None,
                     row_block: int = ROW_BLOCK,
                     interpret: bool = False) -> Optional[Array]:
    """Batched manual-DMA wrap conv: [B, H, W, Cin] -> [B, H, W, Cout]
    in the input dtype. Returns None when the shape doesn't fit."""
    b, h, w, cin = x.shape
    if h % row_block or w % 8:
        return None
    if not interpret and jax.default_backend() != "tpu":
        return None
    outs = [_conv3x3_wrap_dma(x[i], kernel, row_block,
                              interpret=interpret) for i in range(b)]
    out = jnp.stack(outs)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# Fused conv + layer-norm-statistics layer: the building block that can
# beat XLA IN-NET (see module docstring). The kernel consumes an
# UNPADDED (possibly lane-padded) activation straight from HBM, zeroes
# its own vertical halo rows, emits bf16 activations in a lane-padded
# layout the NEXT layer can DMA directly, and accumulates the layer-norm
# sums over the true channels so the XLA side only runs the single
# normalize+relu elementwise pass.
# ---------------------------------------------------------------------------

def _conv_ln_kernel(x_hbm, w_ref, b_ref, out_ref, stats_ref, win_ref,
                    g_ref, sem, *, row_block: int, width: int, cin: int,
                    cout: int, cout_pad: int, nb: int):
    """Grid (NB,). x_hbm: [H, W, cin] (lane-padded cin) in HBM; out
    block: [RB, W, cout_pad] bf16 (pad lanes zero); stats: [NB, 2] f32
    SMEM output (sum, sumsq over the REAL channels of the block)."""
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)
    nslot = 1 - slot

    # Window DMA variants: rows [step*RB - 1, step*RB + RB + 1) with
    # zero rows memset outside the image, deposited at the matching
    # window offset. Branches with out-of-range STATIC sizes must not
    # even be constructed (sizes are static), so the set of branches is
    # chosen at trace time from the static nb.
    def _descr(kind, step, s):
        if kind == "only":       # nb == 1: the whole image
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, row_block)],
                win_ref.at[s, pl.ds(1, row_block)], sem.at[s])
        if kind == "first":
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, row_block + 1)],
                win_ref.at[s, pl.ds(1, row_block + 1)], sem.at[s])
        if kind == "last":
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(step * row_block - 1, row_block + 1)],
                win_ref.at[s, pl.ds(0, row_block + 1)], sem.at[s])
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(step * row_block - 1, row_block + 2)],
            win_ref.at[s], sem.at[s])

    def _on_window(step, s, action):
        if nb == 1:
            win_ref[s, 0:1, :, :] = jnp.zeros((1, width, cin),
                                              win_ref.dtype)
            win_ref[s, row_block + 1:row_block + 2, :, :] = jnp.zeros(
                (1, width, cin), win_ref.dtype)
            getattr(_descr("only", step, s), action)()
            return

        @pl.when(step == 0)
        def _():
            if action == "start":
                win_ref[s, 0:1, :, :] = jnp.zeros((1, width, cin),
                                                  win_ref.dtype)
            getattr(_descr("first", step, s), action)()

        @pl.when(step == nb - 1)
        def _():
            if action == "start":
                win_ref[s, row_block + 1:row_block + 2, :, :] = jnp.zeros(
                    (1, width, cin), win_ref.dtype)
            getattr(_descr("last", step, s), action)()

        if nb > 2:
            @pl.when((step > 0) & (step < nb - 1))
            def _():
                getattr(_descr("mid", step, s), action)()

    def start_window(step, s):
        _on_window(step, s, "start")

    def wait_window(step, s):
        _on_window(step, s, "wait")

    @pl.when(i == 0)
    def _():
        start_window(0, 0)

    @pl.when(i + 1 < nb)
    def _():
        start_window(i + 1, nslot)

    wait_window(i, slot)

    a = win_ref[slot].reshape((row_block + 2) * width, cin)
    g_ref[:, :, :] = jnp.dot(a, w_ref[:, :],
                             preferred_element_type=jnp.float32
                             ).reshape(row_block + 2, width, 9 * cout)
    acc = None
    for dy in range(3):
        for dx in range(3):
            gslot = dy * 3 + dx
            gi = g_ref[dy:dy + row_block, :,
                       gslot * cout:(gslot + 1) * cout]
            if dx == 0:
                gi = pltpu.roll(gi, 1, axis=1)
            elif dx == 2:
                gi = pltpu.roll(gi, width - 1, axis=1)
            acc = gi if acc is None else acc + gi
    acc = acc + b_ref[0:1, 0:cout][None]   # [1, 1, cout], kept >=2D
    # Stats over the OUTPUT-dtype-rounded activations: the layer norm
    # normalizes the emitted (possibly bf16) tensor, and the XLA
    # fallback computes its sums from that same rounded tensor — both
    # paths must define the statistics over identical values.
    accq = acc.astype(out_ref.dtype).astype(jnp.float32)
    stats_ref[i, 0] = jnp.sum(accq)
    stats_ref[i, 1] = jnp.sum(accq * accq)
    out_ref[:, :, 0:cout] = acc.astype(out_ref.dtype)
    if cout_pad > cout:
        out_ref[:, :, cout:] = jnp.zeros(
            (row_block, width, cout_pad - cout), out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("cin_true", "row_block",
                                             "interpret"))
def conv3x3_ln_stats(x: Array, kernel: Array, bias: Array,
                     cin_true: int, row_block: int = ROW_BLOCK,
                     interpret: bool = False):
    """x: [H, W, cin_pad] (bf16, lane-padded; pad channels arbitrary);
    kernel: [3, 3, cin_true, cout]; bias: [cout] (applied BEFORE the
    statistics — the layer norm must see the biased activations to
    match nn.Conv + SpatialLayerNorm). Returns (y [H, W, cout_pad] bf16
    with zero pad lanes, sum, sumsq) where the sums run over the REAL
    cout channels — layer-norm statistics for the XLA-side
    normalize+relu pass."""
    h, w, cin_pad = x.shape
    cout = kernel.shape[-1]
    cout_pad = 128 * -(-cout // 128)
    nb = h // row_block
    kmat = jnp.transpose(kernel.reshape(9, cin_true, cout),
                         (1, 0, 2)).reshape(cin_true, 9 * cout)
    kmat = jnp.pad(kmat.astype(x.dtype),
                   ((0, cin_pad - cin_true), (0, 0)))
    bpad = jnp.pad(bias.astype(jnp.float32),
                   (0, cout_pad - cout))[None]

    y, stats = pl.pallas_call(
        functools.partial(_conv_ln_kernel, row_block=row_block, width=w,
                          cin=cin_pad, cout=cout, cout_pad=cout_pad,
                          nb=nb),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((cin_pad, 9 * cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((row_block, w, cout_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((h, w, cout_pad), x.dtype),
            jax.ShapeDtypeStruct((nb, 2), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, row_block + 2, w, cin_pad), x.dtype),
            pltpu.VMEM((row_block + 2, w, 9 * cout), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x, kmat, bpad)
    return y, jnp.sum(stats[:, 0]), jnp.sum(stats[:, 1])
