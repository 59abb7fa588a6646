"""MSI model: inference (PSV -> RGBA shells) and rendering, as pure functions.

Functional replacement for the reference's `class MSI` graph builder
(matryodshka/msi.py:33-1217). Every pose/inverse is an explicit argument
(the reference smuggles ref_pose_inv / jitter_pose_inv / intrinsics_inv
through the default graph by tensor name, msi.py:1113-1120).

Layer assembly is vectorized over the plane axis: the reference's
32-iteration concat loops (msi.py:136-147 etc.) become one reshape + one
fused elementwise blend.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from matryodshka_tpu.config import MatryConfig
from matryodshka_tpu.geometry import intersect
from matryodshka_tpu.geometry import render as render_lib
from matryodshka_tpu.geometry import sweep as sweep_lib
from matryodshka_tpu.geometry.homography import mpi_render_view

Array = jax.Array


# ---------------------------------------------------------------------------
# Pre/de-processing (msi.py:1163-1194).
# ---------------------------------------------------------------------------

def preprocess_image(image: Array) -> Array:
    """[0, 1] float -> [-1, 1]."""
    return image * 2.0 - 1.0


def deprocess_image(image: Array) -> Array:
    """[-1, 1] -> [0, 1] float (clipping deferred to image IO)."""
    return (image + 1.0) / 2.0


# ---------------------------------------------------------------------------
# Bilinear upsampling with align_corners (for hres blend-weight reuse,
# msi.py:151-152 uses tf.image.resize(..., align_corners=True)).
# ---------------------------------------------------------------------------

def _resize_matrix_align_corners(out_n: int, in_n: int) -> Array:
    """[out_n, in_n] separable align-corners bilinear resize matrix:
    each row holds the two tap weights (1-f at floor, f at floor+1)."""
    if in_n == 1:
        return jnp.ones((out_n, 1), jnp.float32)
    pos = jnp.linspace(0.0, in_n - 1.0, out_n)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_n - 2)
    f = (pos - i0.astype(jnp.float32)).astype(jnp.float32)
    rows = jnp.arange(out_n)
    m = jnp.zeros((out_n, in_n), jnp.float32)
    return m.at[rows, i0].set(1.0 - f).at[rows, i0 + 1].add(f)


def upsample_align_corners(img: Array, out_h: int, out_w: int) -> Array:
    """Bilinear resize of [B, H, W, C] with align_corners=True semantics
    (msi.py:151-152 tf.image.resize align_corners=True).

    Align-corners bilinear is exactly separable and its sample grid never
    leaves [0, n-1] (the endpoint's second tap has weight exactly 0), so
    it is computed as two dense [out, in] matmuls on the MXU instead of a
    2x2-footprint gather: at 4096x2048x64ch the gather formulation
    materialized ~12 GB of f32 corner temps and OOM'd HBM, while the
    matmul peak is just the (x-first) intermediate + output."""
    b, h, w, c = img.shape
    rx = _resize_matrix_align_corners(out_w, w)
    ry = _resize_matrix_align_corners(out_h, h)
    t = jnp.einsum("bhwc,Ww->bhWc", img.astype(jnp.float32), rx,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("bhWc,Hh->bHWc", t, ry,
                      precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# RGBA layer assembly — the four color-prediction schemes (msi.py:108-273).
# ---------------------------------------------------------------------------

def assemble_rgba(which_color_pred: str, msi_pred: Array, net_input: Array,
                  num_planes: int) -> Dict[str, Array]:
    """CNN output + PSV -> RGBA shells.

    Args:
      msi_pred: [B, H, W, K] tanh outputs in (-1, 1).
      net_input: [B, H, W, 2*P*3] double PSV (rgb in [-1, 1]) for the
        blend_psv/blend_bg_psv schemes; [B, H, W, >=P*3] otherwise.
    Returns dict with 'rgba_layers' [B, H, W, P, 4] plus the scheme's
    intermediates ('blend_weights', 'alphas', 'bg_blend_weights').
    """
    b, h, w, _ = net_input.shape
    p = num_planes
    fg = net_input[..., :p * 3].reshape(b, h, w, p, 3)

    out: Dict[str, Array] = {}
    if which_color_pred == "blend_psv":
        blend = (msi_pred[..., :p] + 1.0) / 2.0
        alphas = (msi_pred[..., p:2 * p] + 1.0) / 2.0
        bg = net_input[..., p * 3:2 * p * 3].reshape(b, h, w, p, 3)
        wgt = blend[..., None]
        rgb = wgt * fg + (1.0 - wgt) * bg
        out["blend_weights"] = blend
        out["alphas"] = alphas
    elif which_color_pred == "blend_bg":
        blend = (msi_pred[..., :p] + 1.0) / 2.0
        alphas = (msi_pred[..., p:2 * p] + 1.0) / 2.0
        bg_rgb = msi_pred[..., -3:]  # [B,H,W,3], raw tanh (msi.py:183)
        wgt = blend[..., None]
        rgb = wgt * fg + (1.0 - wgt) * bg_rgb[..., None, :]
        out["blend_weights"] = blend
        out["alphas"] = alphas
        out["bg_rgb"] = bg_rgb
    elif which_color_pred == "blend_bg_psv":
        blend = (msi_pred[..., :p] + 1.0) / 2.0
        alphas = (msi_pred[..., p:2 * p] + 1.0) / 2.0
        bg_blend = (msi_pred[..., 2 * p:3 * p] + 1.0) / 2.0
        pred_bg = msi_pred[..., -3:][..., None, :]
        bg = net_input[..., p * 3:2 * p * 3].reshape(b, h, w, p, 3)
        wgt = blend[..., None]
        rgb = wgt * fg + (1.0 - wgt) * bg
        bgw = bg_blend[..., None]
        rgb = bgw * rgb + (1.0 - bgw) * pred_bg
        out["blend_weights"] = blend
        out["alphas"] = alphas
        out["bg_blend_weights"] = bg_blend
    elif which_color_pred == "alpha_only":
        alphas = (msi_pred[..., :p] + 1.0) / 2.0
        rgb = fg
        out["alphas"] = alphas
    else:
        raise ValueError(which_color_pred)

    # storage dtype follows the PSV (bf16 under compute_dtype=bfloat16 —
    # the TPU analogue of the reference's auto-mixed-precision option,
    # msi.py:730-731): blends are computed in f32 above via promotion,
    # renders re-promote to f32 at the resample/composite.
    out["rgba_layers"] = jnp.concatenate(
        [rgb, out["alphas"][..., None]], axis=-1).astype(net_input.dtype)
    return out


def assemble_rgba_prepared(which_color_pred: str, msi_pred: Array,
                           fgF: Array, bgF: Array, num_planes: int,
                           cap: int = None, row_block: int = None,
                           cap_pad: int = 16, dtype=None,
                           pred_layout: str = "hwk"):
    """CNN output + FLIPPED plane-major PSV volumes -> render-native
    layers, in one fused XLA pass (no [H,W,P,4] intermediate).

    The standard pipeline pays ~3 ms/frame of pure layout tax at 640x320:
    assemble_rgba materializes channel-minor [H,W,P,4], which
    prepare_layers immediately transposes/flips/pads into the ladder
    kernel's [P,4,H+2*pad,W]. Here the blend happens directly in the
    kernel-native layout: fgF/bgF come from the sweep kernel already
    flipped W-minor (pallas_sweep.ods_sweep_identity_prepared — the flip
    is a free shift-constant change), and only msi_pred pays one
    [H,W,K]->[K,H,W] transpose.

    Args:
      msi_pred: [H, W, K] tanh outputs (UNflipped, channel-minor;
        pred_layout="hwk"), or [H, K, W] row-major (the whole-net
        Pallas kernel's native output; pred_layout="hkw" — only a
        cheap leading-dim swap away from the [K, H, W] this needs),
        or [H, K, W] already W-FLIPPED (the flipped-operand net
        kernel, pallas_net.prepare_params(flipped=True);
        pred_layout="hkwF" — zero flip cost, pure transpose).
      fgF, bgF: [P, 3, H, W] flipped plane-major sweeps (ref, src eye).
    Returns dict:
      prepared: [P, 4, H+2*pad, W] flipped + row-wrap-padded (dtype or
        fgF.dtype) — feed to pallas_render.render_mid_prepared.
      cap_top, cap_bot: [cap(+2*cap_pad), W, P, 4] UNflipped
        channel-minor pole bands (same dtype as `prepared`) for the
        gather-path cap render.
    Same color math as assemble_rgba (msi.py:108-273), f32 blends.
    """
    from matryodshka_tpu.ops import pallas_render
    p = num_planes
    _, _, h, w = fgF.shape
    geom = pallas_render.prepared_geometry(
        h, w, cap if cap is not None else pallas_render.CAP_ROWS,
        row_block if row_block is not None else pallas_render.ROW_BLOCK)
    pad = geom["pad"]
    dtype = fgF.dtype if dtype is None else dtype

    if pred_layout == "hkwF":
        predF = jnp.transpose(msi_pred, (1, 0, 2))        # already flipped
    elif pred_layout == "hkw":
        predF = jnp.flip(jnp.transpose(msi_pred, (1, 0, 2)), axis=2)
    else:
        predF = jnp.flip(jnp.transpose(msi_pred, (2, 0, 1)),
                         axis=2)                              # [K,H,W]
    fg32 = fgF.astype(jnp.float32)
    if which_color_pred == "alpha_only":
        alphaF = (predF[:p] + 1.0) / 2.0
        rgbF = fg32
    else:
        blendF = ((predF[:p] + 1.0) / 2.0)[:, None]    # [P, 1, H, W]
        alphaF = (predF[p:2 * p] + 1.0) / 2.0
        if which_color_pred == "blend_psv":
            rgbF = blendF * fg32 + (1.0 - blendF) * bgF.astype(jnp.float32)
        elif which_color_pred == "blend_bg":
            rgbF = blendF * fg32 + (1.0 - blendF) * predF[None, -3:]
        elif which_color_pred == "blend_bg_psv":
            rgbF = blendF * fg32 + (1.0 - blendF) * bgF.astype(jnp.float32)
            bgw = ((predF[2 * p:3 * p] + 1.0) / 2.0)[:, None]
            rgbF = bgw * rgbF + (1.0 - bgw) * predF[None, -3:]
        else:
            raise ValueError(which_color_pred)
    return _finish_prepared(rgbF, alphaF, h, pad, geom["cap"], cap_pad,
                            dtype)


def _finish_prepared(rgbF: Array, alphaF: Array, h: int, pad: int,
                     cap: int, cap_pad: int, dtype) -> Dict[str, Array]:
    """Shared tail of the prepared assembles: wrap-pad rows into the
    ladder layout and cut the two pole-cap gather bands.

    The storage-dtype cast happens BEFORE the row-pad/band concats (the
    per-element cast commutes with concatenation, so outputs are
    bit-identical) — concatenating in f32 and casting after would move
    every byte twice at double width."""
    layersF = jnp.concatenate([rgbF, alphaF[:, None]],
                              axis=1).astype(dtype)         # [P,4,H,W]
    prepared = jnp.concatenate([layersF[:, :, h - pad:], layersF,
                                layersF[:, :, :pad]], axis=2)
    bp = cap_pad

    def _cap_band(lo_wrap, hi):
        bandF = jnp.concatenate([layersF[:, :, lo_wrap:],
                                 layersF[:, :, :hi]], axis=2)
        # Same storage dtype as `prepared`: the cap gather packs/gathers
        # in the band dtype, so bf16 bands halve the cap table traffic
        # (blending stays f32 either way).
        return jnp.transpose(jnp.flip(bandF, axis=3), (2, 3, 0, 1))

    cap_top = _cap_band(h - bp, cap + bp)
    cap_bot = _cap_band(h - cap - bp, bp)
    return {"prepared": prepared, "cap_top": cap_top, "cap_bot": cap_bot}


def assemble_caps_blend_psv(msi_pred_hkwF: Array, fgF: Array, bgF: Array,
                            num_planes: int, cap: int = None,
                            cap_pad: int = 16,
                            dtype=None) -> Dict[str, Array]:
    """Pole-cap gather bands ONLY (blend_psv), for the blend-fused FTB
    render path (pallas_render.render_mid_fused_blend) — the mid rows
    blend inside the kernel, so only the two cap strips (~20% of rows)
    are blended here. Band layouts identical to assemble_rgba_prepared's
    cap_top/cap_bot.

    msi_pred_hkwF: [H, K, W] flipped row-major net output;
    fgF, bgF: [P, 3, H, W] flipped plane-major sweeps."""
    from matryodshka_tpu.ops import pallas_render
    p = num_planes
    _, _, h, w = fgF.shape
    cap = pallas_render.CAP_ROWS if cap is None else cap
    bp = cap_pad
    dtype = fgF.dtype if dtype is None else dtype
    predF = jnp.transpose(msi_pred_hkwF, (1, 0, 2))       # [K, H, W]

    def strip(lo, hi):
        blw = ((predF[:p, lo:hi] + 1.0) / 2.0)[:, None]   # [P,1,rows,W]
        alw = (predF[p:2 * p, lo:hi] + 1.0) / 2.0
        rgb = (blw * fgF[:, :, lo:hi].astype(jnp.float32)
               + (1.0 - blw) * bgF[:, :, lo:hi].astype(jnp.float32))
        return jnp.concatenate([rgb, alw[:, None]],
                               axis=1).astype(dtype)      # [P,4,rows,W]

    top = strip(0, cap + bp)                              # rows [0, cap+bp)
    bot = strip(h - cap - bp, h)                          # rows [h-cap-bp, h)

    def band(rows):
        return jnp.transpose(jnp.flip(rows, axis=3), (2, 3, 0, 1))

    cap_top = band(jnp.concatenate([bot[:, :, cap:], top], axis=2))
    cap_bot = band(jnp.concatenate([bot, top[:, :, :bp]], axis=2))
    return {"cap_top": cap_top, "cap_bot": cap_bot}


def assemble_hres_prepared(which_color_pred: str, u_blend: Array,
                           u_alphas: Array, fgF: Array, bgF: Array,
                           u_bg_rgb: Optional[Array], cap: int,
                           row_block: int, cap_pad: int,
                           kv_max: int, dtype=None) -> Dict[str, Array]:
    """High-res analogue of assemble_rgba_prepared: UPSAMPLED blend
    weights/alphas (already in [0, 1], channel-minor [H, W, P] — the
    msi.py:149-165 semantics) applied to the flipped high-res sweep
    volumes. Returns the same prepared/cap-band dict."""
    from matryodshka_tpu.ops.pallas_render import _band_geometry
    p_, _, h, w = fgF.shape
    _, _, pad = _band_geometry(cap, row_block, kv_max)
    dtype = fgF.dtype if dtype is None else dtype
    blendF = jnp.flip(jnp.transpose(u_blend, (2, 0, 1)), axis=2)
    alphaF = jnp.flip(jnp.transpose(u_alphas, (2, 0, 1)), axis=2)
    fg32 = fgF.astype(jnp.float32)
    if which_color_pred == "alpha_only":
        rgbF = fg32
    elif which_color_pred == "blend_bg":
        bgrF = jnp.flip(jnp.transpose(u_bg_rgb, (2, 0, 1)), axis=2)
        rgbF = (blendF[:, None] * fg32
                + (1.0 - blendF[:, None]) * bgrF[None])
    else:
        rgbF = (blendF[:, None] * fg32
                + (1.0 - blendF[:, None]) * bgF.astype(jnp.float32))
    return _finish_prepared(rgbF, alphaF, h, pad, cap, cap_pad, dtype)


def assemble_hres_rgba(which_color_pred: str, outputs: Dict[str, Array],
                       hres_net_input: Array, num_planes: int,
                       hres_h: int, hres_w: int) -> Array:
    """Upsampled-weight high-res assembly (msi.py:149-165, 196-212):
    blend weights/alphas predicted at low res are bilinearly upsampled
    (align_corners) and applied to the high-res PSV."""
    b = hres_net_input.shape[0]
    p = num_planes
    fg = hres_net_input[..., :p * 3].reshape(b, hres_h, hres_w, p, 3)
    u_alphas = upsample_align_corners(outputs["alphas"], hres_h, hres_w)
    if which_color_pred == "blend_psv":
        u_blend = upsample_align_corners(outputs["blend_weights"],
                                         hres_h, hres_w)
        bg = hres_net_input[..., p * 3:2 * p * 3].reshape(
            b, hres_h, hres_w, p, 3)
        wgt = u_blend[..., None]
        rgb = wgt * fg + (1.0 - wgt) * bg
    elif which_color_pred == "blend_bg":
        # msi.py:196-212: upsample the predicted background RGB alongside
        # the blend weights and blend it against the hres foreground PSV.
        u_blend = upsample_align_corners(outputs["blend_weights"],
                                         hres_h, hres_w)
        u_bg = upsample_align_corners(outputs["bg_rgb"], hres_h, hres_w)
        wgt = u_blend[..., None]
        rgb = wgt * fg + (1.0 - wgt) * u_bg[..., None, :]
    else:
        rgb = fg
    return jnp.concatenate([rgb, u_alphas[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Full inference: images -> PSV -> CNN -> RGBA shells (msi.py:40-289).
# ---------------------------------------------------------------------------

def infer_msi(apply_fn, params, cfg: MatryConfig, batch: Dict[str, Array],
              psv_depths: Array,
              jitter_pose_inv: Optional[Array] = None,
              with_hres: bool = False) -> Dict[str, Array]:
    """Run PSV formatting + CNN + layer assembly.

    Args:
      apply_fn: the U-Net apply function (params, net_input) -> msi_pred.
      batch: dict with ref_image/src_image [B,H,W,3] in [0,1],
        ref_pose/src_pose/ref_pose_inv [B,4,4], intrinsics [B,3,3]
        (+ hres_ref_image/hres_src_image when with_hres).
      jitter_pose_inv: [B,4,4] inverse jitter pose for the
        transform-inverse branch (None = unjittered).
    Returns dict with rgba_layers, psv (net_input), blend_weights/alphas
    (+ hres_rgba_layers when with_hres).
    """
    ref = preprocess_image(batch["ref_image"])
    src = preprocess_image(batch["src_image"])

    if cfg.input_type == "REALESTATE_PP":
        net_input = sweep_lib.format_realestate_network_input(
            ref, src, batch["ref_pose"], batch["src_pose"], psv_depths,
            batch["intrinsics"], jitter_pose_inv=jitter_pose_inv)
    else:
        # bf16 PSV storage when the net computes in bf16: the [B,H,W,192]
        # volume is pure HBM traffic (the net casts anyway; assembly
        # blends promote back to f32)
        net_input = sweep_lib.format_network_input(
            ref, src, batch["ref_pose"], batch["src_pose"],
            batch["ref_pose_inv"], psv_depths, batch["intrinsics"],
            input_type=cfg.input_type, jitter_pose_inv=jitter_pose_inv,
            use_pallas=cfg.use_pallas, out_dtype=cfg.jnp_compute_dtype)

    msi_pred = apply_fn(params, net_input)
    outputs = assemble_rgba(cfg.which_color_pred, msi_pred, net_input,
                            cfg.num_msi_planes)
    outputs["psv"] = net_input

    if with_hres:
        hres_ref = preprocess_image(batch["hres_ref_image"])
        hres_src = preprocess_image(batch["hres_src_image"])
        hres_net_input = sweep_lib.format_network_input(
            hres_ref, hres_src, batch["ref_pose"], batch["src_pose"],
            batch["ref_pose_inv"], psv_depths, batch["intrinsics"],
            input_type=cfg.input_type, jitter_pose_inv=jitter_pose_inv,
            use_pallas=cfg.use_pallas)
        outputs["hres_rgba_layers"] = assemble_hres_rgba(
            cfg.which_color_pred, outputs, hres_net_input,
            cfg.num_msi_planes, cfg.hres_height, cfg.hres_width)
    return outputs


def fused_net_ops(model, params, cfg: MatryConfig, flipped: bool = True):
    """Kernel operands for the whole-net Pallas kernel, or None when
    the fused net does not apply (GCN keeps the XLA
    net). Cache the result — it's pure weight repacking.

    flipped=True (default) prepares the HORIZONTALLY-FLIPPED net
    (pallas_net.prepare_params docstring): the sweep kernel's natively
    W-flipped volumes feed the kernel with zero XLA flip passes and the
    prediction comes out pre-flipped for assemble_rgba_prepared
    (pred_layout="hkwF"). CoordNet configs (the released checkpoints'
    variant) get the coord kernel: SAME zero padding + the |sin(lat)|
    channel lowered to a per-row bias. Returns
    (ops, ngf, k, flipped, variant)."""
    from matryodshka_tpu.ops import pallas_net
    if cfg.gcn:
        return None
    variant = "coord" if cfg.coord_net else "wrap"
    k = cfg.num_net_outputs()
    cin0 = 2 * cfg.num_psv_planes * 3
    ops = pallas_net.prepare_params(params, cfg.ngf, cin0, k,
                                    dtype=cfg.jnp_compute_dtype,
                                    flipped=flipped, variant=variant)
    return (ops, cfg.ngf, k, flipped, variant)


def infer_msi_prepared(apply_fn, params, cfg: MatryConfig,
                       batch: Dict[str, Array], psv_depths: Array,
                       interpret: bool = False,
                       fused_net=None,
                       blend_fused=None) -> Optional[Dict[str, Array]]:
    """The zero-layout-tax inference hot path: sweep kernel emits the
    render-native flipped volumes, the assemble blends directly into the
    ladder kernel's layout. Returns dict(prepared [B,P,4,H+2p,W],
    cap_top/cap_bot [B,...], msi_pred, net_input) — or None when the
    fused path doesn't apply (non-ODS input, unsupported backend/shape);
    callers fall back to infer_msi + render_equirect_view.
    """
    from matryodshka_tpu.geometry import render as render_geo
    from matryodshka_tpu.ops import pallas_render, pallas_sweep
    h, w = cfg.height, cfg.width
    if cfg.input_type != "ODS" or not cfg.use_pallas:
        return None
    if not pallas_render.shape_supported(h, w, 4, interpret=interpret):
        return None
    ref = preprocess_image(batch["ref_image"])
    src = preprocess_image(batch["src_image"])
    cap_pad = render_geo._cap_band_pad(h, w, pallas_render.CAP_ROWS)
    if fused_net is not None and fused_net[3]:
        # Whole-net Pallas kernel, PLANAR input: the sweep kernel emits
        # row-padded plane-major volumes that reshape straight into the
        # net kernel's planar x operands — ZERO XLA layout pass between
        # sweep and net (replaces the measured 0.75 ms rm-transpose).
        from matryodshka_tpu.ops import pallas_net
        net_ops, ngf, k, flipped, net_variant = fused_net
        pad = pallas_sweep.NET_ROW_PAD
        assert pallas_net.X_ROW_PAD == pad
        if pallas_sweep.DEFAULT_XRM and not interpret:
            # perf_flags "xrm": the sweep kernel also emits the net's
            # ROW-MAJOR x — the net's row-major window path (plain
            # leading-dim rhs packing, double-buffered windows) without
            # the XLA flip/transpose pass the unflipped route pays.
            fgP, bgP, x_rm = pallas_sweep.ods_sweep_identity_planar_rm(
                ref, src, psv_depths, batch["intrinsics"],
                out_dtype=cfg.jnp_compute_dtype, interpret=interpret)
            b = fgP.shape[0]
            preds = [pallas_net.unet_forward(
                x_rm[i], net_ops, ngf, k, interpret=interpret,
                flipped=flipped, variant=net_variant)
                for i in range(b)]
        else:
            fgP, bgP = pallas_sweep.ods_sweep_identity_planar(
                ref, src, psv_depths, batch["intrinsics"],
                out_dtype=cfg.jnp_compute_dtype, interpret=interpret)
            b = fgP.shape[0]
            preds = [pallas_net.unet_forward(
                (fgP[i].reshape(-1, h + 2 * pad, w),
                 bgP[i].reshape(-1, h + 2 * pad, w)),
                net_ops, ngf, k, interpret=interpret, flipped=flipped,
                variant=net_variant)
                for i in range(b)]
        fgF = fgP[:, :, :, pad:pad + h]
        bgF = bgP[:, :, :, pad:pad + h]
        p_, c_ = fgP.shape[1], fgP.shape[2]
        msi_pred = jnp.stack(preds)          # [B, H, K, W]

        def _nl(vol):                        # [P,C,H,W] -> [H,W,P*C]
            un = jnp.flip(vol, axis=3)
            return jnp.transpose(un, (2, 3, 0, 1)).reshape(h, w,
                                                           p_ * c_)
        net_input = jnp.stack([
            jnp.concatenate([_nl(fgF[i]), _nl(bgF[i])], axis=-1)
            for i in range(b)])              # tests only; DCE'd in prod

        out = assemble_outputs_planar(cfg, msi_pred, fgP, bgP,
                                      blend_fused=blend_fused)
        out["net_input"] = net_input
        return out
    net_input, fgF, bgF = pallas_sweep.ods_sweep_identity_prepared(
        ref, src, psv_depths, batch["intrinsics"],
        out_dtype=cfg.jnp_compute_dtype, interpret=interpret)
    b = fgF.shape[0]
    if fused_net is not None:
        # Whole-net Pallas kernel (unflipped operands): consumes the
        # sweep volumes in row-major [H, 2*P*3, W] (one flip+transpose
        # XLA pass), emits pred in [H, K, W].
        from matryodshka_tpu.ops import pallas_net
        net_ops, ngf, k, flipped, net_variant = fused_net

        def _rm(v):
            p_, c_, h_, w_ = v.shape
            u = v if flipped else jnp.flip(v, axis=3)
            u = u.reshape(p_ * c_, h_, w_)
            return jnp.transpose(u, (1, 0, 2))

        preds = []
        for i in range(b):
            x_rm = jnp.concatenate([_rm(fgF[i]), _rm(bgF[i])], axis=1)
            preds.append(pallas_net.unet_forward(
                x_rm.astype(cfg.jnp_compute_dtype), net_ops, ngf, k,
                interpret=interpret, flipped=flipped,
                variant=net_variant))
        msi_pred = jnp.stack(preds)          # [B, H, K, W]
        pred_layout = "hkwF" if flipped else "hkw"
    else:
        msi_pred = apply_fn(params, net_input)
        pred_layout = "hwk"
    per = [assemble_rgba_prepared(cfg.which_color_pred, msi_pred[i],
                                  fgF[i], bgF[i], cfg.num_msi_planes,
                                  cap_pad=cap_pad,
                                  dtype=cfg.jnp_compute_dtype,
                                  pred_layout=pred_layout)
           for i in range(b)]
    out = {k: jnp.stack([d[k] for d in per])
           for k in ("prepared", "cap_top", "cap_bot")}
    out["msi_pred"] = msi_pred
    out["net_input"] = net_input
    return out


def assemble_outputs_planar(cfg: MatryConfig, msi_pred: Array,
                            fgP: Array, bgP: Array,
                            blend_fused=None) -> Dict[str, Array]:
    """The post-net tail of the PLANAR fused pipeline: msi_pred
    [B,H,K,W] (hkwF layout) + the sweep's padded planar volumes
    [B,P,C,H+2pad,W] -> the render-native outputs dict that
    render_equirect_view_from_prepared consumes. Shared by
    infer_msi_prepared and bench.py's stage breakdown so the timed
    stages compose to exactly the e2e pipeline.

    blend_fused=True (requires blend_psv + equal plane counts +
    kernel-supported shape) assembles ONLY the pole-cap strips here and
    hands fgP/bgP/msi_pred through for the in-kernel blend; otherwise
    the full render-native `prepared` stack is assembled.
    """
    from matryodshka_tpu.geometry import render as render_geo
    from matryodshka_tpu.ops import pallas_render, pallas_sweep
    h, w = cfg.height, cfg.width
    pad = pallas_sweep.NET_ROW_PAD
    cap_pad = render_geo._cap_band_pad(h, w, pallas_render.CAP_ROWS)
    fgF = fgP[:, :, :, pad:pad + h]
    bgF = bgP[:, :, :, pad:pad + h]
    b = fgP.shape[0]
    blend_fused = (pallas_render.DEFAULT_FTBB if blend_fused is None
                   else blend_fused)
    if (blend_fused and cfg.which_color_pred == "blend_psv"
            and cfg.num_msi_planes == cfg.num_psv_planes
            and pallas_render.blend_fused_supported(h, w)):
        # blend-fused FTB path: only the pole-cap strips are
        # assembled here; the mid rows blend inside the render
        # kernel from fgP/bgP/msi_pred directly.
        per = [assemble_caps_blend_psv(
            msi_pred[i], fgF[i], bgF[i], cfg.num_msi_planes,
            cap_pad=cap_pad, dtype=cfg.jnp_compute_dtype)
            for i in range(b)]
        out = {k2: jnp.stack([d[k2] for d in per])
               for k2 in ("cap_top", "cap_bot")}
        out["fgP"] = fgP
        out["bgP"] = bgP
        out["msi_pred"] = msi_pred
        return out
    per = [assemble_rgba_prepared(cfg.which_color_pred, msi_pred[i],
                                  fgF[i], bgF[i], cfg.num_msi_planes,
                                  cap_pad=cap_pad,
                                  dtype=cfg.jnp_compute_dtype,
                                  pred_layout="hkwF")
           for i in range(b)]
    out = {k2: jnp.stack([d[k2] for d in per])
           for k2 in ("prepared", "cap_top", "cap_bot")}
    out["msi_pred"] = msi_pred
    return out


def render_equirect_view_from_prepared(outputs: Dict[str, Array],
                                       tgt_pose_rt: Array, tgt_pos: Array,
                                       radii: Array, height: int,
                                       cap: int = None,
                                       chunk_rows: int = None,
                                       interpret: bool = False) -> Array:
    """Batched companion to infer_msi_prepared: [B,...] -> [B, H, W, 3].
    cap/chunk_rows override the defaults for high-res calls (larger
    pole caps, row-chunked mid kernel). Outputs carrying "fgP" (the
    blend-fused path) route to render_equirect_view_fused_blend."""
    from matryodshka_tpu.geometry import render as render_geo
    from matryodshka_tpu.ops import pallas_render
    if "fgP" in outputs:
        return _render_fused_blend_batched(outputs, tgt_pose_rt, tgt_pos,
                                           radii, height, cap,
                                           depth=False,
                                           interpret=interpret)
    b = outputs["prepared"].shape[0]
    w = outputs["prepared"].shape[-1]
    cap = pallas_render.CAP_ROWS if cap is None else cap
    cap_pad = render_geo._cap_band_pad(height, w, cap)
    return jnp.stack([
        render_lib.render_equirect_view_prepared(
            outputs["prepared"][i], outputs["cap_top"][i],
            outputs["cap_bot"][i], tgt_pose_rt[i], tgt_pos[i], radii,
            height, cap, pallas_render.ROW_BLOCK, cap_pad,
            chunk_rows=chunk_rows, interpret=interpret)
        for i in range(b)])


def _render_fused_blend_batched(outputs, tgt_pose_rt, tgt_pos, radii,
                                height, cap, depth, interpret):
    from matryodshka_tpu.geometry import render as render_geo
    from matryodshka_tpu.ops import pallas_render, pallas_sweep
    b = outputs["fgP"].shape[0]
    w = outputs["fgP"].shape[-1]
    cap = pallas_render.CAP_ROWS if cap is None else cap
    cap_pad = render_geo._cap_band_pad(height, w, cap)
    return jnp.stack([
        render_lib.render_equirect_view_fused_blend(
            outputs["fgP"][i], outputs["bgP"][i],
            outputs["msi_pred"][i], outputs["cap_top"][i],
            outputs["cap_bot"][i], tgt_pose_rt[i], tgt_pos[i], radii,
            height, cap, pallas_render.ROW_BLOCK, cap_pad,
            vpad=pallas_sweep.NET_ROW_PAD, depth=depth,
            interpret=interpret)
        for i in range(b)])


def render_equirect_depth_from_prepared(outputs: Dict[str, Array],
                                        tgt_pose_rt: Array,
                                        tgt_pos: Array, radii: Array,
                                        height: int,
                                        cap: int = None,
                                        chunk_rows: int = None,
                                        interpret: bool = False) -> Array:
    """Depth-proxy render through the SAME fused ladder path.

    over_composite of layers whose rgb is the constant i/P equals
    over_composite_depth exactly (layer 0's value is 0 and its alpha is
    force-1 in both; projector.py:225-244) — so depth costs one cheap
    constant-rgb rewrite of the prepared stack instead of a full
    gather reprojection. Blend-fused outputs ("fgP") use the FTB
    kernel's depth mode (only the alpha prediction is read).
    """
    if "fgP" in outputs:
        return _render_fused_blend_batched(outputs, tgt_pose_rt, tgt_pos,
                                           radii, height, cap,
                                           depth=True,
                                           interpret=interpret)

    def depthify_prepared(pr):                   # [P, 4, hpad, W]
        p = pr.shape[0]
        vals = (jnp.arange(p, dtype=jnp.float32) / p)[:, None, None, None]
        rgb = jnp.broadcast_to(vals, (p, 3) + pr.shape[2:]).astype(
            pr.dtype)
        return jnp.concatenate([rgb, pr[:, 3:4]], axis=1)

    def depthify_band(band):                     # [rows, W, P, 4]
        p = band.shape[2]
        vals = (jnp.arange(p, dtype=jnp.float32) / p)[None, None, :, None]
        rgb = jnp.broadcast_to(vals, band.shape[:3] + (3,)).astype(
            band.dtype)
        return jnp.concatenate([rgb, band[..., 3:4]], axis=-1)

    douts = {
        "prepared": jax.vmap(depthify_prepared)(outputs["prepared"]),
        "cap_top": jax.vmap(depthify_band)(outputs["cap_top"]),
        "cap_bot": jax.vmap(depthify_band)(outputs["cap_bot"]),
    }
    return render_equirect_view_from_prepared(douts, tgt_pose_rt,
                                              tgt_pos, radii, height,
                                              cap=cap,
                                              chunk_rows=chunk_rows,
                                              interpret=interpret)


def infer_gcn_msi(gcn_apply, gcn_params, cfg: MatryConfig,
                  batch: Dict[str, Array], psv_depths: Array,
                  mesh_coords: Array, p2v: Array) -> Dict[str, Array]:
    """GCN-variant inference (msi.py:291-382, batch size 1).

    Per-vertex double sweep -> 14-layer graph CNN -> barycentric scatter
    to ERP -> blend_psv assembly against the pixel-grid PSV.

    Note the GCN sweep's eye orders are -1 for ref / +1 for src — the
    REVERSE of the pixel path — mirroring format_gcn_network_input
    (msi.py:1087).
    """
    from matryodshka_tpu.geometry.sweep import gcn_sphere_sweep
    from matryodshka_tpu.models.gcn import mesh_to_equirect

    ref = preprocess_image(batch["ref_image"])
    src = preprocess_image(batch["src_image"])
    ref_pose_inv = batch["ref_pose_inv"]

    vols = []
    for i, (img, pose) in enumerate(((ref, batch["ref_pose"]),
                                     (src, batch["src_pose"]))):
        order = -1 if i % 2 == 0 else 1
        cur_pose = jnp.einsum("bij,bjk->bik", pose, ref_pose_inv)
        vols.append(gcn_sphere_sweep(img, order, psv_depths, mesh_coords,
                                     cur_pose, batch["intrinsics"]))
    vert_input = jnp.concatenate(vols, axis=-1)[0]   # [V, 2*P*3]

    mesh_pred = gcn_apply(gcn_params, vert_input)    # [V, K]
    msi_pred = mesh_to_equirect(mesh_pred, p2v)      # [1, H, W, K]

    net_input = sweep_lib.format_network_input(
        ref, src, batch["ref_pose"], batch["src_pose"], ref_pose_inv,
        psv_depths, batch["intrinsics"], input_type=cfg.input_type)
    outputs = assemble_rgba(cfg.which_color_pred, msi_pred, net_input,
                            cfg.num_msi_planes)
    outputs["psv"] = net_input
    return outputs


# ---------------------------------------------------------------------------
# Batched rendering wrappers.
#
# Lookup coordinates are vmapped over batch (cheap elementwise math); the
# gather itself runs UNBATCHED by folding (batch, plane) into one slice
# axis — a vmapped gather falls off XLA's fast row-copy path on TPU.
# ---------------------------------------------------------------------------

def _batched_reproject(rgba_layers: Array, uv: Array) -> Array:
    """rgba_layers [B, H, W, P, 4] + uv [B, P, h, w, 2] ->
    reprojected layers [B, h, w, P, 4]."""
    from matryodshka_tpu.ops.resample import resample_layers
    b, h, w, p, c = rgba_layers.shape
    _, _, ho, wo, _ = uv.shape
    layers = jnp.moveaxis(rgba_layers, 3, 1).reshape(b * p, h, w, c)
    proj = resample_layers(layers, uv.reshape(b * p, ho, wo, 2))
    return jnp.moveaxis(proj.reshape(b, p, ho, wo, c), 1, 3)


def render_equirect_view(rgba_layers: Array, tgt_pose_rt: Array,
                         tgt_pos: Array, radii: Array,
                         use_pallas: bool = False,
                         pallas_opts: dict | None = None) -> Array:
    """[B, H, W, P, 4] + [B, 4, 4] + [B, 3] -> [B, H, W, 3].

    use_pallas routes each example through the fused ladder render
    (ops/pallas_render.py; the batch unrolls — inference batches are 1).
    pallas_opts tunes the kernel (e.g. dtype=jnp.bfloat16 halves the
    roll/FMA traffic; error stays under PNG quantization)."""
    if use_pallas:
        b = rgba_layers.shape[0]
        return jnp.stack([
            render_lib.render_equirect_view(rgba_layers[i], tgt_pose_rt[i],
                                            tgt_pos[i], radii,
                                            use_pallas=True,
                                            pallas_opts=pallas_opts)
            for i in range(b)])
    h, w = rgba_layers.shape[1], rgba_layers.shape[2]
    uv = jax.vmap(lambda po, c: intersect.intersect_sphere(
        po, c, radii, w, h))(tgt_pose_rt, tgt_pos)
    return render_lib.over_composite(_batched_reproject(rgba_layers, uv))


def render_equirect_depth(rgba_layers: Array, tgt_pose_rt: Array,
                          tgt_pos: Array, radii: Array) -> Array:
    h, w = rgba_layers.shape[1], rgba_layers.shape[2]
    uv = jax.vmap(lambda po, c: intersect.intersect_sphere(
        po, c, radii, w, h))(tgt_pose_rt, tgt_pos)
    return render_lib.over_composite_depth(
        _batched_reproject(rgba_layers, uv))


def render_ods_view(rgba_layers: Array, order: int, pose: Array,
                    tgt_pos: Array, radii: Array, intrinsics: Array
                    ) -> Array:
    h, w = rgba_layers.shape[1], rgba_layers.shape[2]
    uv = jax.vmap(lambda po, K: intersect.intersect_ods(
        po, None, order, K, radii, w, h))(pose, intrinsics)
    return render_lib.over_composite(_batched_reproject(rgba_layers, uv))


def render_perspective_view(rgba_layers: Array, tgt_pos: Array,
                            radii: Array, viewing_window: int = 3,
                            psp_height: int = 270,
                            psp_width: int = 480) -> Array:
    import math as _math
    from matryodshka_tpu.geometry import cameras as _cameras
    h, w = rgba_layers.shape[1], rgba_layers.shape[2]
    angle = jnp.array([0.0, viewing_window * _math.pi / 2.0, 0.0])
    R = _cameras.rotation_from_euler(angle)
    pose = jnp.eye(4).at[:3, :3].set(R)
    uv = jax.vmap(lambda c: intersect.intersect_perspective(
        pose, c, radii, w, h, psp_width, psp_height))(tgt_pos)
    return render_lib.over_composite(_batched_reproject(rgba_layers, uv))


def render_mpi_view(rgba_layers: Array, tgt_pose: Array, radii: Array,
                    intrinsics: Array) -> Array:
    """Perspective MPI render for PP/RealEstate inputs (msi.py:527-548)."""
    return jax.vmap(
        lambda L, po, K: mpi_render_view(L, po, radii, K)
    )(rgba_layers, tgt_pose, intrinsics)
