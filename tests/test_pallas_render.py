"""Ladder render kernel vs the gather path (interpret mode, CPU).

The kernel is EXACT (same taps, same weights) wherever the per-pixel
residuals fit the static rung maxima -- tools/proto_render_ladder.py is
the numpy derivation. These tests run the real Pallas kernel in
interpreter mode on a small ERP and demand float32-level agreement with
geometry/render.py's gather path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matryodshka_tpu.geometry import intersect, render
from matryodshka_tpu.ops import pallas_render

H, W, P = 64, 256, 4
OPTS = dict(cap=8, row_block=8, kh_max=14, kv_max=5, interpret=True)


def _layers(rng):
    return jnp.asarray(rng.rand(H, W, P, 4).astype(np.float32))


def _radii():
    # near shells exercise multi-rung parallax at this resolution
    return jnp.asarray([8.0, 2.0, 1.2, 1.0])


@pytest.mark.parametrize("pos", [[0.05, 0.0, 0.0], [0.04, 0.03, -0.05],
                                 [0.0, 0.06, 0.0]])
def test_mid_rows_bit_close(pos):
    rng = np.random.RandomState(0)
    layers = _layers(rng)
    radii = _radii()
    pose = jnp.eye(4)
    tgt = jnp.asarray(pos)
    uv = intersect.intersect_sphere(pose, tgt, radii, W, H)

    mid = pallas_render.render_equirect_mid_pallas(layers, uv, **OPTS)
    assert mid is not None and mid.shape == (H - 16, W, 3)

    ref = render.render_equirect_view(layers, pose, tgt, radii)
    np.testing.assert_allclose(np.asarray(mid), np.asarray(ref)[8:-8],
                               rtol=0, atol=1e-5)


def test_full_view_dispatch_matches_gather():
    rng = np.random.RandomState(1)
    layers = _layers(rng)
    radii = _radii()
    pose = jnp.eye(4)
    tgt = jnp.asarray([0.03, -0.02, 0.04])
    out = render.render_equirect_view(layers, pose, tgt, radii,
                                      use_pallas=True, pallas_opts=OPTS)
    ref = render.render_equirect_view(layers, pose, tgt, radii)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_residual_tables_cover_field():
    # tables are exact bounds of the clamped residual fields
    radii = _radii()
    uv = intersect.intersect_sphere(jnp.eye(4), jnp.asarray([0.05, 0, 0]),
                                    radii, W, H)
    uvm = jnp.transpose(uv[:, 8:H - 8], (0, 3, 1, 2))
    klo, khi, mlo, mhi = pallas_render._residual_tables(
        uvm[:, 0], uvm[:, 1], 8, 8, 14, 5)
    assert klo.shape == (P, (H - 16) // 8)
    assert int(jnp.max(khi)) <= 14 and int(jnp.min(klo)) >= -14
    # far shell barely moves; near shell needs several rungs
    assert int(khi[0].max()) <= 1
    assert int(khi[-1].max()) >= 2


def test_rotation_pose_falls_back_to_gather():
    # A rotation-dominant pose blows the ladder's residual clamps; the
    # dispatcher must detect it (residual_ok) and route the WHOLE view
    # through the gather path instead of emitting clamped garbage.
    rng = np.random.RandomState(2)
    layers = _layers(rng)
    radii = _radii()
    # pitch: a yaw would be a pure horizontal ERP shift (the ladder
    # handles those); pitch bends rows vertically past kv_max
    ang = 0.5
    rot = jnp.asarray([[1, 0, 0, 0],
                       [0, np.cos(ang), -np.sin(ang), 0],
                       [0, np.sin(ang), np.cos(ang), 0],
                       [0, 0, 0, 1]], dtype=jnp.float32)
    tgt = jnp.asarray([0.01, 0.0, 0.0])
    uv = intersect.intersect_sphere(rot, tgt, radii, W, H)
    assert not bool(pallas_render.residual_ok(uv, cap=8, kh_max=14,
                                              kv_max=5))
    out = render.render_equirect_view(layers, rot, tgt, radii,
                                      use_pallas=True, pallas_opts=OPTS)
    ref = render.render_equirect_view(layers, rot, tgt, radii)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_residual_ok_true_for_small_translation():
    radii = _radii()
    uv = intersect.intersect_sphere(jnp.eye(4), jnp.asarray([0.03, 0, 0]),
                                    radii, W, H)
    assert bool(pallas_render.residual_ok(uv, cap=8, kh_max=14, kv_max=5))


def test_declines_bad_shapes():
    layers = jnp.zeros((H, 100, P, 4))  # width not lane-aligned
    uv = jnp.zeros((P, H, 100, 2))
    assert pallas_render.render_equirect_mid_pallas(layers, uv,
                                                    **OPTS) is None


@pytest.mark.parametrize("cache_cvs", [True, False])
def test_chunked_render_matches_mid(cache_cvs):
    """The high-res chunked entry (layer row bands, bounded VMEM) must
    reproduce the full-mid kernel exactly, with and without the
    vertical-coefficient cache."""
    rng = np.random.RandomState(5)
    layers = _layers(rng)
    radii = _radii()
    tgt = jnp.asarray([0.04, 0.01, -0.03])
    uv = intersect.intersect_sphere(jnp.eye(4), tgt, radii, W, H)

    mid = pallas_render.render_equirect_mid_pallas(layers, uv, **OPTS)
    prepared = pallas_render.prepare_layers(layers, cap=8, row_block=8,
                                            kv_max=5)
    chunked = pallas_render.render_mid_chunked(
        prepared, uv, H, cap=8, chunk_rows=16, row_block=8,
        kh_max=14, kv_max=5, cache_cvs=cache_cvs, interpret=True)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(mid),
                               rtol=0, atol=1e-6)


@pytest.mark.parametrize("pos", [[0.05, 0.0, 0.0], [0.0, 0.06, 0.0]])
def test_column_tiled_mid_matches_fullwidth(pos):
    """wb-column-tiled kernel (per-tile tables, halo buffer, dynamic
    seed rotate) against the full-width kernel, f32-exact."""
    rng = np.random.RandomState(2)
    layers = _layers(rng)
    radii = _radii()
    uv = intersect.intersect_sphere(jnp.eye(4), jnp.asarray(pos), radii,
                                    W, H)
    cap, rb, kh, kv = 8, 8, 14, 5
    lay = pallas_render.prepare_layers(layers, cap, rb, kv)
    uvm = jnp.transpose(uv[:, cap:H - cap], (0, 3, 1, 2)).astype(
        jnp.float32)
    ref = pallas_render._ladder_render_mid(lay, uvm, cap, rb, kh, kv,
                                           interpret=True)
    got = pallas_render._ladder_render_mid(lay, uvm, cap, rb, kh, kv,
                                           wb=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)
    # vtap rung form (perf_flags "vtap"): vertical pre-blend per rung;
    # FP association differs, gather-parity tolerance holds.
    got_v = pallas_render._ladder_render_mid_uv(
        lay, uvm[:, 0], uvm[:, 1], cap, rb, kh, kv, wb=128,
        interpret=True, vtap=True)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("pos", [[0.05, 0.0, 0.0], [0.0, 0.06, 0.0]])
def test_roll16_band_is_bit_exact_on_bf16_layers(pos):
    """roll16 (perf_flags): the rolled band stays bf16 instead of being
    upcast to f32 at band load. On a bf16 layer stack the tap values are
    identical (bf16->f32 is exact), so the output must be BIT-equal to
    the f32-band kernel; on an f32 stack roll16 is a no-op by
    construction (band dtype = layer dtype)."""
    rng = np.random.RandomState(6)
    layers = _layers(rng)
    radii = _radii()
    uv = intersect.intersect_sphere(jnp.eye(4), jnp.asarray(pos), radii,
                                    W, H)
    cap, rb, kh, kv = 8, 8, 14, 5
    lay16 = pallas_render.prepare_layers(layers, cap, rb, kv,
                                         dtype=jnp.bfloat16)
    uvm = jnp.transpose(uv[:, cap:H - cap], (0, 3, 1, 2)).astype(
        jnp.float32)
    ref = pallas_render._ladder_render_mid_uv(
        lay16, uvm[:, 0], uvm[:, 1], cap, rb, kh, kv, wb=128,
        interpret=True)
    got = pallas_render._ladder_render_mid_uv(
        lay16, uvm[:, 0], uvm[:, 1], cap, rb, kh, kv, wb=128,
        interpret=True, roll16=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("wb", [None, 128])
def test_ftb_matches_plane_major(wb):
    """Front-to-back early-termination kernel vs the plane-major ladder:
    same rungs/taps, compositing differs only by f32 association plus an
    eps-bounded truncation of saturated rays."""
    Hc, Wc, Pc, CAP, RB = 96, 256, 8, 16, 32
    rng = np.random.RandomState(3)
    rgba = np.asarray(rng.rand(Hc, Wc, Pc, 4), np.float32)
    rgba[..., 3] = np.clip(rgba[..., 3] * 1.5, 0, 1)  # saturating alphas
    rgba = jnp.asarray(rgba)
    kh, kv = pallas_render.default_bounds(Hc, Wc, CAP)
    lay = pallas_render.prepare_layers(rgba, CAP, RB, kv)
    hm = Hc - 2 * CAP
    j = np.arange(Wc)[None, None, :]
    i = np.arange(hm)[None, :, None] + CAP
    du = (rng.rand(Pc, hm, Wc) - 0.5) * 6
    dv = (rng.rand(Pc, hm, Wc) - 0.5) * 6
    u = jnp.asarray(((Wc - 1) - j - du).astype(np.float32))
    v = jnp.asarray((i + dv).astype(np.float32))
    ref = pallas_render._ladder_render_mid_uv(lay, u, v, CAP, RB, kh, kv,
                                              wb=wb, interpret=True)
    for eps in (0.0, 1e-6):
        got = pallas_render._ladder_render_mid_ftb(
            lay, u, v, CAP, RB, kh, kv, wb=wb, eps=eps, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=2e-5)


def test_ftb_dispatch_via_prepared_cf():
    """render_mid_prepared_cf(ftb=True) == (ftb=False) on a real pose."""
    rng = np.random.RandomState(4)
    layers = _layers(rng)
    radii = _radii()
    pose = jnp.eye(4)
    tgt = jnp.asarray([0.03, -0.02, 0.04])
    u, v = intersect.intersect_sphere_uv(pose, tgt, radii, W, H)
    geom = pallas_render.prepared_geometry(H, W)
    prep = pallas_render.prepare_layers(layers, geom["cap"],
                                        geom["row_block"],
                                        geom["kv_max"])
    a = pallas_render.render_mid_prepared_cf(prep, u, v, ftb=False,
                                             interpret=True)
    b = pallas_render.render_mid_prepared_cf(prep, u, v, ftb=True,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=0, atol=2e-5)


def test_blend_fused_supported_production_geometry():
    """The production ERP (640x320, cap 16) must satisfy the blend-fused
    band containment (cap >= band_lead, kv+1 <= cap) — a geometry
    regression here would silently drop the fused path to the
    prepared-stack pipeline."""
    assert pallas_render.blend_fused_supported(320, 640)
    assert pallas_render.blend_fused_supported(512, 1024)
    # too-short mid section: must decline, not crash
    assert not pallas_render.blend_fused_supported(32, 640)


def test_dyn_m_rung_form_is_bit_exact():
    """dyn_m (perf_flags): the runtime-sized vertical-tap fori with a
    dynamic sublane band slice must be BIT-equal to the static @pl.when
    cascade — identical taps, identical ascending-m add order."""
    Hc, Wc, Pc, CAP, RB = 96, 256, 8, 16, 32
    rng = np.random.RandomState(9)
    rgba = jnp.asarray(np.asarray(rng.rand(Hc, Wc, Pc, 4), np.float32))
    kh, kv = pallas_render.default_bounds(Hc, Wc, CAP)
    lay = pallas_render.prepare_layers(rgba, CAP, RB, kv)
    hm = Hc - 2 * CAP
    j = np.arange(Wc)[None, None, :]
    i = np.arange(hm)[None, :, None] + CAP
    du = (rng.rand(Pc, hm, Wc) - 0.5) * 6
    dv = (rng.rand(Pc, hm, Wc) - 0.5) * 6
    u = jnp.asarray(((Wc - 1) - j - du).astype(np.float32))
    v = jnp.asarray((i + dv).astype(np.float32))
    ref = pallas_render._ladder_render_mid_uv(lay, u, v, CAP, RB, kh,
                                              kv, wb=128,
                                              interpret=True,
                                              mpair=False)
    got = pallas_render._ladder_render_mid_uv(lay, u, v, CAP, RB, kh,
                                              kv, wb=128,
                                              interpret=True,
                                              dyn_m=True, mpair=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_dyn_m_ftbb_is_bit_exact():
    """dyn_m in the production blend-fused FTB kernel: bit-equal to the
    cascade form on the same volumes/prediction."""
    Hc, Wc, Pc, CAP, RB = 96, 256, 8, 16, 32
    rng = np.random.RandomState(10)
    kh, kv = pallas_render.default_bounds(Hc, Wc, CAP)
    _, _, pad = pallas_render._band_geometry(CAP, RB, kv)
    fgP = jnp.asarray(np.asarray(
        rng.rand(Pc, 3, Hc + 2 * pad, Wc), np.float32))
    bgP = jnp.asarray(np.asarray(
        rng.rand(Pc, 3, Hc + 2 * pad, Wc), np.float32))
    pred = jnp.asarray(np.asarray(
        rng.rand(Hc, 2 * Pc, Wc) * 2 - 1, np.float32))
    hm = Hc - 2 * CAP
    j = np.arange(Wc)[None, None, :]
    i = np.arange(hm)[None, :, None] + CAP
    du = (rng.rand(Pc, hm, Wc) - 0.5) * 6
    dv = (rng.rand(Pc, hm, Wc) - 0.5) * 6
    u = np.broadcast_to(((Wc - 1) - j - du), (Pc, hm, Wc))
    v = np.broadcast_to((i + dv), (Pc, hm, Wc))
    # full-height uv as render_mid_fused_blend slices the mid rows
    uf = np.zeros((Pc, Hc, Wc), np.float32)
    vf = np.zeros((Pc, Hc, Wc), np.float32)
    uf[:, CAP:Hc - CAP] = u
    vf[:, CAP:Hc - CAP] = v
    uf[:, :CAP] = u[:, :1]
    uf[:, Hc - CAP:] = u[:, -1:]
    vf[:, :CAP] = v[:, :1]
    vf[:, Hc - CAP:] = v[:, -1:]
    args = (fgP, bgP, pred, jnp.asarray(uf), jnp.asarray(vf), pad)
    ref = pallas_render.render_mid_fused_blend(
        *args, cap=CAP, row_block=RB, kh_max=kh, kv_max=kv,
        interpret=True, dyn_m=False, mpair=False, kpair=False)
    got = pallas_render.render_mid_fused_blend(
        *args, cap=CAP, row_block=RB, kh_max=kh, kv_max=kv,
        interpret=True, dyn_m=True, mpair=False, kpair=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_mpair_rung_form_matches_cascade():
    """mpair (perf_flags): two tap levels per predicated region. The
    pair's extra level carries an exactly-zero coefficient, but the two
    in-pair products add before the accumulator (f32 association), so
    the gate is allclose at ladder exactness, both kernels."""
    Hc, Wc, Pc, CAP, RB = 96, 256, 8, 16, 32
    rng = np.random.RandomState(11)
    rgba = jnp.asarray(np.asarray(rng.rand(Hc, Wc, Pc, 4), np.float32))
    kh, kv = pallas_render.default_bounds(Hc, Wc, CAP)
    lay = pallas_render.prepare_layers(rgba, CAP, RB, kv)
    hm = Hc - 2 * CAP
    j = np.arange(Wc)[None, None, :]
    i = np.arange(hm)[None, :, None] + CAP
    du = (rng.rand(Pc, hm, Wc) - 0.5) * 6
    dv = (rng.rand(Pc, hm, Wc) - 0.5) * 6
    u = jnp.asarray(((Wc - 1) - j - du).astype(np.float32))
    v = jnp.asarray((i + dv).astype(np.float32))
    ref = pallas_render._ladder_render_mid_uv(lay, u, v, CAP, RB, kh,
                                              kv, wb=128,
                                              interpret=True)
    got = pallas_render._ladder_render_mid_uv(lay, u, v, CAP, RB, kh,
                                              kv, wb=128,
                                              interpret=True,
                                              mpair=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)

    # ftbb form
    _, _, pad = pallas_render._band_geometry(CAP, RB, kv)
    fgP = jnp.asarray(np.asarray(
        rng.rand(Pc, 3, Hc + 2 * pad, Wc), np.float32))
    bgP = jnp.asarray(np.asarray(
        rng.rand(Pc, 3, Hc + 2 * pad, Wc), np.float32))
    pred = jnp.asarray(np.asarray(
        rng.rand(Hc, 2 * Pc, Wc) * 2 - 1, np.float32))
    uf = jnp.asarray(np.repeat(
        np.pad(np.asarray(u), ((0, 0), (CAP, CAP), (0, 0)),
               mode="edge"), 1, axis=0))
    vf = jnp.asarray(np.pad(np.asarray(v), ((0, 0), (CAP, CAP), (0, 0)),
                            mode="edge"))
    a = pallas_render.render_mid_fused_blend(
        fgP, bgP, pred, uf, vf, pad, cap=CAP, row_block=RB, kh_max=kh,
        kv_max=kv, interpret=True, mpair=False)
    b = pallas_render.render_mid_fused_blend(
        fgP, bgP, pred, uf, vf, pad, cap=CAP, row_block=RB, kh_max=kh,
        kv_max=kv, interpret=True, mpair=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=0, atol=1e-5)


def test_kpair_rung_form_matches_cascade():
    """kpair (perf_flags): two horizontal rungs per k-loop iteration
    from two rolled bands offset by one rung. A pair rung outside
    [klo-1, khi] carries an exactly-zero mask; the in-pair (and, with
    mpair, in-quad) products add before the accumulator (f32
    association), so the gate is allclose at ladder exactness."""
    Hc, Wc, Pc, CAP, RB = 96, 256, 8, 16, 32
    rng = np.random.RandomState(12)
    rgba = jnp.asarray(np.asarray(rng.rand(Hc, Wc, Pc, 4), np.float32))
    kh, kv = pallas_render.default_bounds(Hc, Wc, CAP)
    lay = pallas_render.prepare_layers(rgba, CAP, RB, kv)
    hm = Hc - 2 * CAP
    j = np.arange(Wc)[None, None, :]
    i = np.arange(hm)[None, :, None] + CAP
    du = (rng.rand(Pc, hm, Wc) - 0.5) * 6
    dv = (rng.rand(Pc, hm, Wc) - 0.5) * 6
    u = jnp.asarray(((Wc - 1) - j - du).astype(np.float32))
    v = jnp.asarray((i + dv).astype(np.float32))
    ref = pallas_render._ladder_render_mid_uv(lay, u, v, CAP, RB, kh,
                                              kv, wb=128,
                                              interpret=True,
                                              mpair=False, kpair=False)
    for mp in (False, True):
        got = pallas_render._ladder_render_mid_uv(
            lay, u, v, CAP, RB, kh, kv, wb=128, interpret=True,
            mpair=mp, kpair=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-5)

    # ftbb form
    _, _, pad = pallas_render._band_geometry(CAP, RB, kv)
    fgP = jnp.asarray(np.asarray(
        rng.rand(Pc, 3, Hc + 2 * pad, Wc), np.float32))
    bgP = jnp.asarray(np.asarray(
        rng.rand(Pc, 3, Hc + 2 * pad, Wc), np.float32))
    pred = jnp.asarray(np.asarray(
        rng.rand(Hc, 2 * Pc, Wc) * 2 - 1, np.float32))
    uf = jnp.asarray(np.pad(np.asarray(u), ((0, 0), (CAP, CAP), (0, 0)),
                            mode="edge"))
    vf = jnp.asarray(np.pad(np.asarray(v), ((0, 0), (CAP, CAP), (0, 0)),
                            mode="edge"))
    a = pallas_render.render_mid_fused_blend(
        fgP, bgP, pred, uf, vf, pad, cap=CAP, row_block=RB, kh_max=kh,
        kv_max=kv, interpret=True, mpair=False, kpair=False)
    for mp in (False, True):
        b = pallas_render.render_mid_fused_blend(
            fgP, bgP, pred, uf, vf, pad, cap=CAP, row_block=RB,
            kh_max=kh, kv_max=kv, interpret=True, mpair=mp, kpair=True)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=1e-5)
