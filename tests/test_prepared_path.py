"""Zero-layout-tax inference path (sweep->assemble->render in the render-
native layout) vs the standard assemble_rgba + gather render.

Exactness expectation: the fused path's net_input is bit-identical to
the flip+transpose of its own volumes, so feeding THAT net_input into
the standard assemble isolates pure layout/blend differences — the two
pipelines must agree to ladder-kernel exactness (~1e-5 f32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matryodshka_tpu.config import MatryConfig
from matryodshka_tpu.geometry import sweep as sweep_lib
from matryodshka_tpu.models import msi as msi_lib

H, W, P = 96, 128, 4


def _cfg(**kw):
    base = dict(height=H, width=W, num_psv_planes=P, num_msi_planes=P,
                batch_size=1, compute_dtype="float32", use_pallas=True)
    base.update(kw)
    return MatryConfig(**base).validate()


def _batch(rng):
    eye = jnp.eye(4)[None]
    intr = np.eye(3, dtype=np.float32)[None].copy()
    intr[:, 0, 0] = 0.032
    return {
        "ref_image": jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32)),
        "src_image": jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32)),
        "ref_pose": eye, "src_pose": eye, "ref_pose_inv": eye,
        "intrinsics": jnp.asarray(intr),
    }


def _fake_net(cfg):
    rng = np.random.RandomState(7)
    k = cfg.num_net_outputs()
    m = jnp.asarray(rng.randn(2 * P * 3, k).astype(np.float32) * 0.3)

    def apply_fn(params, x):
        del params
        return jnp.tanh(x @ m)
    return apply_fn


@pytest.mark.parametrize("scheme", ["blend_psv", "alpha_only", "blend_bg"])
def test_prepared_pipeline_matches_standard(scheme):
    cfg = _cfg(which_color_pred=scheme)
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    depths = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, P))
    apply_fn = _fake_net(cfg)

    outs = msi_lib.infer_msi_prepared(apply_fn, None, cfg, batch, depths,
                                      interpret=True)
    assert outs is not None
    tgt_pos = jnp.asarray([[0.02, 0.01, -0.015]])
    eye = jnp.eye(4)[None]
    img = msi_lib.render_equirect_view_from_prepared(
        outs, eye, tgt_pos, depths, cfg.height, interpret=True)

    # standard path on the SAME net_input (isolates layout differences)
    std = msi_lib.assemble_rgba(scheme, outs["msi_pred"],
                                outs["net_input"], P)
    ref = msi_lib.render_equirect_view(std["rgba_layers"], eye, tgt_pos,
                                       depths)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_prepared_pipeline_rotation_fallback():
    cfg = _cfg()
    rng = np.random.RandomState(1)
    batch = _batch(rng)
    depths = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, P))
    apply_fn = _fake_net(cfg)
    outs = msi_lib.infer_msi_prepared(apply_fn, None, cfg, batch, depths,
                                      interpret=True)
    ang = 0.5
    rot = jnp.asarray([[1, 0, 0, 0],
                       [0, np.cos(ang), -np.sin(ang), 0],
                       [0, np.sin(ang), np.cos(ang), 0],
                       [0, 0, 0, 1]], dtype=jnp.float32)[None]
    tgt_pos = jnp.asarray([[0.01, 0.0, 0.0]])
    img = msi_lib.render_equirect_view_from_prepared(
        outs, rot, tgt_pos, depths, cfg.height, interpret=True)
    std = msi_lib.assemble_rgba("blend_psv", outs["msi_pred"],
                                outs["net_input"], P)
    ref = msi_lib.render_equirect_view(std["rgba_layers"], rot, tgt_pos,
                                       depths)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_chunked_rotation_fallback_matches_gather():
    """The high-res (chunk_rows) flow's out-of-contract branch: now a
    constant-memory per-plane lax.scan (the all-planes gather OOM'd
    HBM at 4096x2048 on hardware, r4) — must still match the batch
    gather render."""
    cfg = _cfg()
    rng = np.random.RandomState(11)
    batch = _batch(rng)
    depths = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, P))
    apply_fn = _fake_net(cfg)
    outs = msi_lib.infer_msi_prepared(apply_fn, None, cfg, batch, depths,
                                      interpret=True)
    ang = 0.5
    rot = jnp.asarray([[1, 0, 0, 0],
                       [0, np.cos(ang), -np.sin(ang), 0],
                       [0, np.sin(ang), np.cos(ang), 0],
                       [0, 0, 0, 1]], dtype=jnp.float32)[None]
    tgt_pos = jnp.asarray([[0.01, 0.0, 0.0]])
    img = msi_lib.render_equirect_view_from_prepared(
        outs, rot, tgt_pos, depths, cfg.height, chunk_rows=32,
        interpret=True)
    std = msi_lib.assemble_rgba("blend_psv", outs["msi_pred"],
                                outs["net_input"], P)
    ref = msi_lib.render_equirect_view(std["rgba_layers"], rot, tgt_pos,
                                       depths)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_prepared_pipeline_with_fused_net():
    """Full fused inference: sweep kernel -> whole-net Pallas kernel ->
    prepared assemble -> ladder render, vs the flax net + standard
    assemble + gather render."""
    from matryodshka_tpu.training import state as state_lib

    cfg = _cfg(ngf=8)
    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    batch = _batch(rng)
    depths = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, P))
    fused = msi_lib.fused_net_ops(model, state.params, cfg)
    assert fused is not None

    outs = msi_lib.infer_msi_prepared(
        lambda p, x: model.apply(p, x), state.params, cfg, batch,
        depths, interpret=True, fused_net=fused)
    assert outs["msi_pred"].shape == (1, H, cfg.num_net_outputs(), W)
    eye = jnp.eye(4)[None]
    tgt_pos = jnp.asarray([[0.02, -0.01, 0.015]])
    img = msi_lib.render_equirect_view_from_prepared(
        outs, eye, tgt_pos, depths, cfg.height, interpret=True)

    pred_ref = model.apply(state.params, outs["net_input"])
    std = msi_lib.assemble_rgba(cfg.which_color_pred, pred_ref,
                                outs["net_input"], P)
    ref = msi_lib.render_equirect_view(std["rgba_layers"], eye, tgt_pos,
                                       depths)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=0, atol=2e-4)


def test_prepared_depth_matches_standard():
    cfg = _cfg()
    rng = np.random.RandomState(4)
    batch = _batch(rng)
    depths = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, P))
    apply_fn = _fake_net(cfg)
    outs = msi_lib.infer_msi_prepared(apply_fn, None, cfg, batch, depths,
                                      interpret=True)
    eye = jnp.eye(4)[None]
    tgt_pos = jnp.asarray([[0.02, 0.0, -0.01]])
    d = msi_lib.render_equirect_depth_from_prepared(
        outs, eye, tgt_pos, depths, cfg.height, interpret=True)
    std = msi_lib.assemble_rgba("blend_psv", outs["msi_pred"],
                                outs["net_input"], P)
    ref = msi_lib.render_equirect_depth(std["rgba_layers"], eye, tgt_pos,
                                        depths)
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_hres_fused_matches_scan():
    """The fused high-res path (chunked sweep + hres prepared assembly
    + chunked ladder) vs the per-plane gather scan, small shapes."""
    from matryodshka_tpu.cli.test import (build_hres_render_fn,
                                          build_hres_render_fn_fused)

    # min_depth 2..20 keeps far shells away from project_ods' f32 disc
    # cancellation zone: the scan's PER-PIXEL gather sweep park-flips
    # isolated far-shell pixels there (r~100) that the kernel's
    # park-proof row params correctly sample — an O(1) divergence on
    # ~1% of pixels that is a gather-path artifact, not a fused bug
    # (depth, which ignores rgb, matches to 1e-6 either way).
    cfg = _cfg(height=64, width=128, hres_height=128, hres_width=256,
               min_depth=2.0, max_depth=20.0)
    fused = build_hres_render_fn_fused(cfg, interpret=True)
    assert fused is not None
    scan = build_hres_render_fn(cfg)

    rng = np.random.RandomState(6)
    b, hh, hw, p = 1, 128, 256, P
    eye = jnp.eye(4)[None]
    intr = np.eye(3, dtype=np.float32)[None].copy()
    intr[:, 0, 0] = 0.032
    args = (
        jnp.asarray(rng.rand(b, hh, hw, 3).astype(np.float32)),
        jnp.asarray(rng.rand(b, hh, hw, 3).astype(np.float32)),
        jnp.asarray(rng.rand(b, 64, 128, p).astype(np.float32)),
        jnp.asarray(rng.rand(b, 64, 128, p).astype(np.float32)),
        eye, eye, eye, jnp.asarray(intr),
        jnp.asarray([[0.02, 0.01, -0.015]]),
    )
    rgb_f, depth_f = fused(*args)
    rgb_s, depth_s = scan(*args)
    # Agreement up to (a) the two sweep paths' f32 projection noise and
    # (b) park-flip pixels: the scan's per-pixel gather sweep parks
    # isolated far-shell pixels that the park-proof kernel params don't
    # (PARITY.md's bounded park-flip divergence) — O(1) differences on
    # a fraction of a percent of pixels.
    for got, ref in ((rgb_f, rgb_s), (depth_f, depth_s)):
        err = np.abs(np.asarray(got) - np.asarray(ref))
        assert np.percentile(err, 99) < 3e-3, np.percentile(err, 99)
        assert (err > 1e-2).mean() < 0.005, (err > 1e-2).mean()
        assert err.mean() < 1e-3, err.mean()


def test_blend_fused_pipeline_matches_prepared():
    """Blend-fused FTB inference (assemble folded into the render
    kernel) vs the prepared-stack pipeline: color, depth, and the
    out-of-contract gather fallback."""
    from matryodshka_tpu.training import state as state_lib

    cfg = _cfg(ngf=8, height=96)
    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(8)
    batch = _batch(rng)
    depths = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, P))
    fused = msi_lib.fused_net_ops(model, state.params, cfg)
    args = (lambda p, x: model.apply(p, x), state.params, cfg, batch,
            depths)
    o_ref = msi_lib.infer_msi_prepared(*args, interpret=True,
                                       fused_net=fused,
                                       blend_fused=False)
    o_fb = msi_lib.infer_msi_prepared(*args, interpret=True,
                                      fused_net=fused, blend_fused=True)
    assert "fgP" in o_fb and "prepared" not in o_fb
    eye = jnp.eye(4)[None]
    for tgt in (jnp.asarray([[0.02, 0.01, -0.015]]),
                jnp.asarray([[0.5, 0.5, 0.5]])):      # 2nd: fallback
        a = msi_lib.render_equirect_view_from_prepared(
            o_ref, eye, tgt, depths, cfg.height, interpret=True)
        b = msi_lib.render_equirect_view_from_prepared(
            o_fb, eye, tgt, depths, cfg.height, interpret=True)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=2e-5)
    da = msi_lib.render_equirect_depth_from_prepared(
        o_ref, eye, jnp.asarray([[0.02, 0.01, -0.015]]), depths,
        cfg.height, interpret=True)
    db = msi_lib.render_equirect_depth_from_prepared(
        o_fb, eye, jnp.asarray([[0.02, 0.01, -0.015]]), depths,
        cfg.height, interpret=True)
    np.testing.assert_allclose(np.asarray(db), np.asarray(da),
                               rtol=0, atol=2e-5)

    # vtap rung form of the blend-fused kernel (perf_flags "vtap"):
    # same pipeline with the flag forced on must match too. roll16
    # (bf16 rolled band) likewise — with f32 test volumes it keeps the
    # band f32, so it must match at the same tolerance.
    from matryodshka_tpu.ops import pallas_render as pr
    a0 = msi_lib.render_equirect_view_from_prepared(
        o_ref, eye, jnp.asarray([[0.02, 0.01, -0.015]]), depths,
        cfg.height, interpret=True)
    for flag in ("DEFAULT_VTAP", "DEFAULT_ROLL16"):
        old = getattr(pr, flag)
        setattr(pr, flag, True)
        try:
            bv = msi_lib.render_equirect_view_from_prepared(
                o_fb, eye, jnp.asarray([[0.02, 0.01, -0.015]]), depths,
                cfg.height, interpret=True)
        finally:
            setattr(pr, flag, old)
        np.testing.assert_allclose(np.asarray(bv), np.asarray(a0),
                                   rtol=0, atol=2e-5, err_msg=flag)


def test_coord_fused_pipeline_matches_flax():
    """CoordNet config rides the fused planar pipeline (sweep kernel ->
    coord net kernel -> prepared assemble -> ladder render) and matches
    the flax coord net + standard assemble + gather render."""
    from matryodshka_tpu.training import state as state_lib

    cfg = _cfg(ngf=8, coord_net=True)
    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(9)
    batch = _batch(rng)
    depths = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, P))
    fused = msi_lib.fused_net_ops(model, state.params, cfg)
    assert fused is not None and fused[4] == "coord"
    outs = msi_lib.infer_msi_prepared(
        lambda p, x: model.apply(p, x), state.params, cfg, batch,
        depths, interpret=True, fused_net=fused)
    eye = jnp.eye(4)[None]
    tgt = jnp.asarray([[0.02, -0.01, 0.015]])
    img = msi_lib.render_equirect_view_from_prepared(
        outs, eye, tgt, depths, cfg.height, interpret=True)
    pred_ref = model.apply(state.params, outs["net_input"])
    std = msi_lib.assemble_rgba(cfg.which_color_pred, pred_ref,
                                outs["net_input"], P)
    ref = msi_lib.render_equirect_view(std["rgba_layers"], eye, tgt,
                                       depths)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=0, atol=2e-4)
