"""MSI novel-view rendering: per-shell reprojection + over-compositing.

Replaces the reference's layer-by-layer Python loops
(geometry/projector.py:34-127, over_composite :246-265) with:

  * one [P, H, W, 2] intersection coordinate stack per view,
  * one batched gather over all shells,
  * a closed-form over-composite via reversed cumulative products —
    out = rgb_0*T_0 + sum_{i>=1} rgb_i * a_i * T_i with transmittance
    T_i = prod_{j>i} (1 - a_j) — instead of a 32-step sequential loop.
    (Layer 0 is the farthest shell; its alpha is treated as 1, matching
    projector.py:246-265.)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from matryodshka_tpu.geometry import cameras, intersect
from matryodshka_tpu.ops.resample import (bilinear_wrap_resample,
                                          resample_layers)

Array = jax.Array


# ---------------------------------------------------------------------------
# Over-compositing (closed form).
# ---------------------------------------------------------------------------

def over_composite(rgba: Array) -> Array:
    """Back-to-front over-composite of [..., P, 4] layers -> [..., 3].

    Layer index 0 is the farthest; its alpha is ignored (treated as 1.0),
    per projector.py:246-265.
    """
    rgb = rgba[..., :3]
    alpha = rgba[..., 3:]
    # transmittance T_i = prod_{j > i} (1 - a_j): reversed exclusive cumprod.
    trans = _transmittance(alpha)
    # effective alpha: layer 0 contributes fully.
    eff_alpha = alpha.at[..., 0, :].set(1.0)
    return jnp.sum(rgb * eff_alpha * trans, axis=-2)


def _transmittance(alpha: Array) -> Array:
    """T_i = prod_{j > i} (1 - a_j) along axis -2 (T_{P-1} = 1).

    Implemented with lax.cumprod(reverse=True) rather than
    flip/cumprod/flip: on TPU, XLA (this version) MISCOMPILES the fused
    transpose+flip+cumprod+reduce graph that the flip formulation
    produces inside jitted render paths — outputs were silently wrong
    by O(1) (caught by the Pallas ladder kernel, which disagreed with
    the jitted gather path while matching the eager one; see
    tests/test_pallas_render.py). The reverse-form is also one fewer
    relayout.
    """
    axis = alpha.ndim - 2
    rcp = jax.lax.cumprod(1.0 - alpha, axis=axis, reverse=True)
    return jnp.concatenate([rcp[..., 1:, :], jnp.ones_like(rcp[..., :1, :])],
                           axis=-2)


def over_composite_depth(rgba: Array) -> Array:
    """Depth-proxy composite: value i/P per layer, layer 0 contributes 0
    (projector.py:225-244). Input [..., P, 4] -> [..., 3]."""
    p = rgba.shape[-2]
    alpha = rgba[..., 3:]
    vals = (jnp.arange(p, dtype=rgba.dtype) / p)[:, None]
    trans = _transmittance(alpha)
    # Layer 0's value is 0 and its alpha is ignored (output starts at 0),
    # so only layers >= 1 contribute, each with alpha * transmittance.
    contrib = vals * alpha * trans
    contrib = contrib.at[..., 0, :].set(0.0)
    out = jnp.sum(contrib, axis=-2)
    return jnp.broadcast_to(out, out.shape[:-1] + (3,))


# ---------------------------------------------------------------------------
# Forward reprojection of all shells for a target view.
# ---------------------------------------------------------------------------

def _gather_layers(rgba_layers: Array, uv: Array) -> Array:
    """Sample each shell at its own coordinate field.

    rgba_layers: [H, W, P, C]; uv: [P, Ht, Wt, 2] -> [P, Ht, Wt, C].
    All planes collapse into one flat gather (resample_layers).
    """
    layers = jnp.moveaxis(rgba_layers, 2, 0)  # [P, H, W, C]
    return resample_layers(layers, uv)


def reproject_equirect(rgba_layers: Array, tgt_pose: Array, tgt_pos: Array,
                       radii: Array) -> Array:
    """All shells reprojected into an ERP target view.

    rgba_layers: [H, W, P, 4]; tgt_pose: [4, 4]; tgt_pos: [3].
    Returns [P, H, W, 4] (back-to-front), cf. projective_forward_sphere
    (projector.py:34-62)."""
    h, w = rgba_layers.shape[0], rgba_layers.shape[1]
    uv = intersect.intersect_sphere(tgt_pose, tgt_pos, radii, w, h)
    return _gather_layers(rgba_layers, uv)


def _cap_band_pad(h: int, w: int, cap: int) -> int:
    """Source rows kept beyond the cap. Tracks the ladder kernel's
    resolution-scaled vertical bound (pallas_render.default_bounds gives
    kv > 16 at high widths for MAX_T), so the cap contract covers the
    same |t| envelope the kernel itself advertises."""
    from matryodshka_tpu.ops import pallas_render
    _, kv = pallas_render.default_bounds(h, w, cap)
    return max(16, kv + 2)


def _cap_over(rgba_layers: Array, uv_rows: Array, top: bool,
              cap: int) -> Array:
    """Gather-path render of a pole cap: uv_rows [P, cap, W, 2].

    Gathers from a SMALL source band around the pole instead of the full
    layer stack — the quad-pack table build otherwise costs more than
    the gathers themselves. Band indexing reproduces the gather path's
    mod-H vertical wrap exactly for |dv| < _cap_band_pad (the same
    translation-bound contract as the ladder kernel).
    """
    h, w = rgba_layers.shape[0], rgba_layers.shape[1]
    bp = _cap_band_pad(h, w, cap)
    if top:
        band = jnp.concatenate([rgba_layers[h - bp:], rgba_layers[:cap + bp]],
                               axis=0)
        vshift = float(bp)
    else:
        band = jnp.concatenate([rgba_layers[h - cap - bp:],
                                rgba_layers[:bp]], axis=0)
        vshift = float(bp + cap - h)
    return _cap_over_band(band, uv_rows, vshift)


def _cap_over_band(band: Array, uv_rows: Array, vshift: float) -> Array:
    """Gather-render a pole cap from a prebuilt source band
    [bandH, W, P, 4]; uv_rows [P, cap, W, 2] in full-image coordinates,
    vshift maps them into the band."""
    return _cap_over_band_uv(band, uv_rows[..., 0], uv_rows[..., 1],
                             vshift)


def _cap_over_band_uv(band: Array, u_rows: Array, v_rows: Array,
                      vshift: float) -> Array:
    """Channel-first _cap_over_band: u_rows/v_rows each [P, cap, W].

    Composites plane-major/channel-first: the naive
    over_composite(moveaxis(proj, 0, 2)) form puts the 4-wide channel
    axis on lanes (4/128 = 3% lane utilization) for the cumprod and the
    weighted reduce; transposing the small gathered stack once and
    reducing over the leading plane axis keeps W on lanes throughout.
    Same math as over_composite (layer 0 farthest, alpha treated as 1).
    """
    from matryodshka_tpu.ops.resample import resample_layers_uv
    layers = jnp.moveaxis(band, 2, 0)  # [P, bandH, W, C]
    proj = resample_layers_uv(layers, u_rows, v_rows + vshift)
    proj_pf = jnp.transpose(proj, (0, 3, 1, 2))   # [P, 4, cap, W]
    out_pf = over_composite_pf(proj_pf[:, :3], proj_pf[:, 3])
    return jnp.transpose(out_pf, (1, 2, 0))       # [cap, W, 3]


def over_composite_pf(rgb: Array, alpha: Array) -> Array:
    """Plane-major channel-first over-composite: rgb [P, 3, ...],
    alpha [P, ...] -> [3, ...]. Identical math to over_composite with
    the reduction on the LEADING axis (lane-friendly layout)."""
    rcp = jax.lax.cumprod(1.0 - alpha, axis=0, reverse=True)
    trans = jnp.concatenate([rcp[1:], jnp.ones_like(rcp[:1])], axis=0)
    eff_alpha = alpha.at[0].set(1.0)
    return jnp.sum(rgb * (eff_alpha * trans)[:, None], axis=0)


def render_equirect_view(rgba_layers: Array, tgt_pose: Array, tgt_pos: Array,
                         radii: Array, use_pallas: bool = False,
                         pallas_opts: dict | None = None) -> Array:
    """Novel ERP view: reproject + over-composite. [H, W, P, 4] -> [H, W, 3].
    Batch with vmap. (msi.py:407-429)

    use_pallas dispatches the mid rows to the fused ladder kernel
    (ops/pallas_render.py; translation-dominant poses) and renders only
    the two pole caps with gathers; falls back wholesale when the kernel
    declines the shape/backend (static) — or, via lax.cond, when the
    POSE's residuals exceed the kernel's clamp contract at runtime
    (rotation-dominant / |t| > MAX_T poses would otherwise get silent
    nearest-edge-clamped output).
    """
    h, w = rgba_layers.shape[0], rgba_layers.shape[1]
    if use_pallas:
        from matryodshka_tpu.ops import pallas_render
        opts = pallas_opts or {}
        cap = opts.get("cap", pallas_render.CAP_ROWS)
        if pallas_render.shape_supported(
                h, w, rgba_layers.shape[3], cap,
                opts.get("row_block", pallas_render.ROW_BLOCK),
                opts.get("interpret", False)):
            uv = intersect.intersect_sphere(tgt_pose, tgt_pos, radii, w, h)
            ok = pallas_render.residual_ok(
                uv, cap, opts.get("kh_max"), opts.get("kv_max"),
                cap_pad=_cap_band_pad(h, w, cap))

            def fused_path(layers, uv):
                mid = pallas_render.render_equirect_mid_pallas(layers, uv,
                                                               **opts)
                top = _cap_over(layers, uv[:, :cap], True, cap)
                bot = _cap_over(layers, uv[:, h - cap:], False, cap)
                return jnp.concatenate([top, mid, bot], axis=0)

            def gather_path(layers, uv):
                proj = _gather_layers(layers, uv)
                return over_composite(jnp.moveaxis(proj, 0, 2))

            return jax.lax.cond(ok, fused_path, gather_path,
                                rgba_layers, uv)
    proj = reproject_equirect(rgba_layers, tgt_pose, tgt_pos, radii)
    return over_composite(jnp.moveaxis(proj, 0, 2))


def render_equirect_view_prepared(prepared: Array, cap_top: Array,
                                  cap_bot: Array, tgt_pose: Array,
                                  tgt_pos: Array, radii: Array,
                                  height: int, cap: int, row_block: int,
                                  cap_pad: int,
                                  chunk_rows: int = None,
                                  interpret: bool = False) -> Array:
    """Novel ERP view from render-native layers (the zero-layout-tax hot
    path): prepared [P, 4, H+2*pad, W] + pole bands from
    msi.assemble_rgba_prepared -> [H, W, 3].

    Same runtime safety contract as render_equirect_view(use_pallas=True):
    poses whose residuals exceed the ladder/cap bounds take a gather-path
    branch reconstructed from `prepared` (lax.cond — only the taken
    branch executes).
    """
    from matryodshka_tpu.ops import pallas_render
    p, c4, hpad, w = prepared.shape
    h = height
    if chunk_rows is not None:
        # high-res flow keeps the channel-minor uv field
        uv = intersect.intersect_sphere(tgt_pose, tgt_pos, radii, w, h)
        ok = pallas_render.residual_ok(uv, cap, cap_pad=cap_pad)

        def fused_hres(prepared, cap_top, cap_bot, uv):
            mid = pallas_render.render_mid_chunked(
                prepared, uv, h, cap, chunk_rows, row_block,
                interpret=interpret)
            top = _cap_over_band(cap_top, uv[:, :cap], float(cap_pad))
            bot = _cap_over_band(cap_bot, uv[:, h - cap:],
                                 float(cap_pad + cap - h))
            return jnp.concatenate([top, mid, bot], axis=0)

        def gather_hres(prepared, cap_top, cap_bot, uv):
            # Sequential per-plane composite: the all-planes-at-once
            # gather held 32 full-res f32 [H, W, 4] temps live and
            # OOM'd HBM at 4096x2048 (measured r4: XLA allocates the
            # UNTAKEN cond branch's temps too, so this bounded the
            # whole hres render). lax.scan keeps one plane live:
            # out += rgb_i * a_i * T, T *= (1 - a_i), nearest-first;
            # plane 0 (farthest) composites with alpha treated as 1,
            # matching over_composite (projector.py:246-265).
            pad = (hpad - h) // 2

            def sample_one(lay_p, uv_p):
                interior = lay_p[:, pad:pad + h, :].astype(jnp.float32)
                img = jnp.transpose(jnp.flip(interior, axis=2),
                                    (1, 2, 0))          # [h, w, 4]
                return resample_layers(img[None], uv_p[None])[0]

            def body(carry, xs):
                out, trans = carry
                lay_p, uv_p = xs
                img = sample_one(lay_p, uv_p)
                a = img[..., 3:]
                out = out + img[..., :3] * a * trans
                return (out, trans * (1.0 - a)), None

            out0 = jnp.zeros((h, w, 3), jnp.float32)
            t0 = jnp.ones((h, w, 1), jnp.float32)
            (out, trans), _ = jax.lax.scan(
                body, (out0, t0), (prepared[1:], uv[1:]), reverse=True)
            img0 = sample_one(prepared[0], uv[0])
            return out + img0[..., :3] * trans

        return jax.lax.cond(ok, fused_hres, gather_hres,
                            prepared, cap_top, cap_bot, uv)

    # channel-first uv: no [..., 2] stack in the hot path (its 2-wide
    # lane tiling forces layout shuffles before the ladder kernel)
    u, v = intersect.intersect_sphere_uv(tgt_pose, tgt_pos, radii, w, h)
    ok = pallas_render.residual_ok_uv(u, v, cap, cap_pad=cap_pad)

    def fused_path(prepared, cap_top, cap_bot, u, v):
        mid = pallas_render.render_mid_prepared_cf(prepared, u, v, cap,
                                                   row_block,
                                                   interpret=interpret)
        top = _cap_over_band_uv(cap_top, u[:, :cap], v[:, :cap],
                                float(cap_pad))
        bot = _cap_over_band_uv(cap_bot, u[:, h - cap:], v[:, h - cap:],
                                float(cap_pad + cap - h))
        return jnp.concatenate([top, mid, bot], axis=0)

    def gather_path(prepared, cap_top, cap_bot, u, v):
        pad = (hpad - h) // 2
        interior = prepared[:, :, pad:pad + h, :].astype(jnp.float32)
        layers = jnp.transpose(jnp.flip(interior, axis=3), (2, 3, 0, 1))
        proj = _gather_layers(layers, jnp.stack([u, v], axis=-1))
        return over_composite(jnp.moveaxis(proj, 0, 2))

    return jax.lax.cond(ok, fused_path, gather_path,
                        prepared, cap_top, cap_bot, u, v)


def render_equirect_view_fused_blend(fgP: Array, bgP: Array, pred: Array,
                                     cap_top: Array, cap_bot: Array,
                                     tgt_pose: Array, tgt_pos: Array,
                                     radii: Array, height: int, cap: int,
                                     row_block: int, cap_pad: int,
                                     vpad: int, depth: bool = False,
                                     interpret: bool = False) -> Array:
    """Novel ERP view straight from the sweep volumes + net prediction
    (blend_psv): the assemble blend happens INSIDE the FTB ladder
    kernel, so no [P, 4, H+2*pad, W] stack is ever written to HBM.
    Same pose-contract safety as render_equirect_view_prepared: poses
    whose residuals exceed the ladder/cap bounds take an XLA gather
    branch reconstructed from the raw volumes (lax.cond).

    The ladder tier is POSE-ADAPTIVE: poses whose residuals fit
    narrow_bounds (kv=7 — a 48-row rolled band vs default_bounds'
    58-64, measured 4.09 -> 3.55 ms at 640x320) ride the narrow
    kernel; wider in-contract poses the default kernel; the rest the
    gather branch. Both fused tiers read the SAME volumes (vpad is the
    sweep layout's, independent of kv), and each tier is bit-exact for
    the poses it accepts."""
    from matryodshka_tpu.ops import pallas_render
    p = fgP.shape[0]
    h = height
    w = fgP.shape[3]
    u, v = intersect.intersect_sphere_uv(tgt_pose, tgt_pos, radii, w, h)
    ok = pallas_render.residual_ok_uv(u, v, cap, cap_pad=cap_pad)
    nb = pallas_render.narrow_bounds(h, w, cap)
    if nb is not None and not interpret:
        ok_n = pallas_render.residual_ok_uv(u, v, cap, nb[0], nb[1],
                                            cap_pad)
    else:
        nb = None

    def _fused(fgP, bgP, pred, cap_top, cap_bot, u, v, kh_max=None,
               kv_max=None):
        mid = pallas_render.render_mid_fused_blend(
            fgP, bgP, pred, u, v, vpad, cap, row_block,
            kh_max=kh_max, kv_max=kv_max, depth=depth,
            interpret=interpret)
        ct = _depthify_band(cap_top) if depth else cap_top
        cb = _depthify_band(cap_bot) if depth else cap_bot
        top = _cap_over_band_uv(ct, u[:, :cap], v[:, :cap],
                                float(cap_pad))
        bot = _cap_over_band_uv(cb, u[:, h - cap:], v[:, h - cap:],
                                float(cap_pad + cap - h))
        return jnp.concatenate([top, mid, bot], axis=0)

    def fused_path(fgP, bgP, pred, cap_top, cap_bot, u, v):
        return _fused(fgP, bgP, pred, cap_top, cap_bot, u, v)

    def fused_narrow(fgP, bgP, pred, cap_top, cap_bot, u, v):
        return _fused(fgP, bgP, pred, cap_top, cap_bot, u, v,
                      kh_max=nb[0], kv_max=nb[1])

    def gather_path(fgP, bgP, pred, cap_top, cap_bot, u, v):
        # cold branch: full XLA assemble from the raw volumes
        predF = jnp.transpose(pred, (1, 0, 2))            # [K, H, W]
        blw = ((predF[:p] + 1.0) / 2.0)[:, None]
        alw = (predF[p:2 * p] + 1.0) / 2.0
        fgF = fgP[:, :, vpad:vpad + h].astype(jnp.float32)
        bgF = bgP[:, :, vpad:vpad + h].astype(jnp.float32)
        rgbF = blw * fgF + (1.0 - blw) * bgF
        layersF = jnp.concatenate([rgbF, alw[:, None]], axis=1)
        layers = jnp.transpose(jnp.flip(layersF, axis=3), (2, 3, 0, 1))
        proj = _gather_layers(layers, jnp.stack([u, v], axis=-1))
        rgba = jnp.moveaxis(proj, 0, 2)
        return (over_composite_depth(rgba) if depth
                else over_composite(rgba))

    args = (fgP, bgP, pred, cap_top, cap_bot, u, v)
    if nb is None:
        return jax.lax.cond(ok, fused_path, gather_path, *args)

    def wide_or_gather(*a):
        return jax.lax.cond(ok, fused_path, gather_path, *a)

    return jax.lax.cond(ok_n, fused_narrow, wide_or_gather, *args)


def _depthify_band(band: Array) -> Array:
    """[rows, W, P, 4] -> same with rgb = plane/P (depth identity)."""
    p = band.shape[2]
    vals = (jnp.arange(p, dtype=jnp.float32) / p)[None, None, :, None]
    rgb = jnp.broadcast_to(vals, band.shape[:3] + (3,)).astype(band.dtype)
    return jnp.concatenate([rgb, band[..., 3:4]], axis=-1)


def render_equirect_depth(rgba_layers: Array, tgt_pose: Array,
                          tgt_pos: Array, radii: Array) -> Array:
    """Depth-proxy ERP render (msi.py:384-405)."""
    proj = reproject_equirect(rgba_layers, tgt_pose, tgt_pos, radii)
    return over_composite_depth(jnp.moveaxis(proj, 0, 2))


def render_ods_view(rgba_layers: Array, order: int, pose: Array,
                    tgt_pos: Array, radii: Array,
                    intrinsics: Array) -> Array:
    """Re-render an ODS eye from the MSI (msi.py:502-525).

    pose is the jitter pose (identity when not jittering)."""
    h, w = rgba_layers.shape[0], rgba_layers.shape[1]
    uv = intersect.intersect_ods(pose, tgt_pos, order, intrinsics, radii,
                                 w, h)
    proj = _gather_layers(rgba_layers, uv)
    return over_composite(jnp.moveaxis(proj, 0, 2))


def render_perspective_view(rgba_layers: Array, tgt_pos: Array, radii: Array,
                            viewing_window: int = 3,
                            psp_height: int = 320,
                            psp_width: int = 640) -> Array:
    """Perspective crop render (msi.py:475-500).

    The crop direction is a yaw of viewing_window * 90 degrees
    (projector.py:79-85); window 3 is the central view.
    """
    h, w = rgba_layers.shape[0], rgba_layers.shape[1]
    angle = jnp.array([0.0, viewing_window * math.pi / 2.0, 0.0])
    R = cameras.rotation_from_euler(angle)
    pose = jnp.eye(4).at[:3, :3].set(R)
    uv = intersect.intersect_perspective(pose, tgt_pos, radii, w, h,
                                         psp_width, psp_height)
    proj = _gather_layers(rgba_layers, uv)
    return over_composite(jnp.moveaxis(proj, 0, 2))
