"""Fused Pallas ODS sweep vs the general gather path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matryodshka_tpu.geometry import sweep as sweep_lib
from matryodshka_tpu.ops import pallas_sweep


@pytest.mark.parametrize("order", [1, -1])
def test_fused_sweep_matches_gather_path(order):
    h, w, p = 32, 64, 6
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    depths = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, p))
    eye = jnp.eye(4)[None]
    intr = jnp.asarray([[0.064, 0, 0], [0, 1, 0], [0, 0, 1.0]],
                       dtype=jnp.float32)[None]

    ref = np.asarray(sweep_lib.ods_sphere_sweep(img, order, depths, eye,
                                                intr))
    got = np.asarray(pallas_sweep.ods_sweep_identity(
        img, order, depths, intr, interpret=True))
    assert got.shape == ref.shape
    # identical up to f32 noise of the two coordinate evaluations
    err = np.abs(got - ref)
    assert np.percentile(err, 99) < 2e-3, np.percentile(err, 99)
    assert err.mean() < 2e-4, err.mean()


def test_fused_sweep_invalid_rows_match():
    """Near shells have invalid (inside-viewing-circle) pole rows; both
    paths must park them at pixel (1,1)."""
    h, w = 32, 64
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    depths = jnp.asarray([0.09])  # close to the 0.064 circle: many
    eye = jnp.eye(4)[None]        # rows invalid
    intr = jnp.asarray([[0.064, 0, 0], [0, 1, 0], [0, 0, 1.0]],
                       dtype=jnp.float32)[None]
    ref = np.asarray(sweep_lib.ods_sphere_sweep(img, 1, depths, eye, intr))
    got = np.asarray(pallas_sweep.ods_sweep_identity(
        img, 1, depths, intr, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_fused_sweep_wide_image_aligned_path():
    """Exercise the 128-aligned-slice + short-barrel path (W > 128)."""
    h, w, p = 16, 256, 3
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    depths = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, p))
    eye = jnp.eye(4)[None]
    intr = jnp.asarray([[0.05, 0, 0], [0, 1, 0], [0, 0, 1.0]],
                       dtype=jnp.float32)[None]
    ref = np.asarray(sweep_lib.ods_sphere_sweep(img, -1, depths, eye,
                                                intr))
    got = np.asarray(pallas_sweep.ods_sweep_identity(
        img, -1, depths, intr, interpret=True))
    err = np.abs(got - ref)
    # the shift path is bit-exact (see test_aligned_shift_bit_exact);
    # residual error is the f32 coordinate noise of both paths, which is
    # pole-concentrated and this config is 16 rows tall (12.5% pole rows)
    assert err.mean() < 5e-4
    assert np.percentile(err, 95) < 2e-3


def test_aligned_shift_bit_exact():
    """The 128-aligned slice + short barrel equals a plain circular
    shift for every amount (pure data movement, no arithmetic)."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from matryodshka_tpu.ops.pallas_sweep import _circ_shift_left

    C, W = 3, 256
    window = W + 128
    rng = np.random.RandomState(0)
    row = jnp.asarray(rng.rand(C, 1, W).astype(np.float32))

    def kern(s_ref, row_ref, out_ref, scratch_ref):
        s = s_ref[0]
        scratch_ref[:, :, 0:W] = row_ref[:, :, :]
        scratch_ref[:, :, W:2 * W] = row_ref[:, :, :]
        s_hi = pl.multiple_of((s // 128) * 128, 128)
        win = scratch_ref[:, :, pl.ds(s_hi, window)]
        out_ref[:, :, :] = _circ_shift_left(win, s - s_hi, window,
                                            nbits=7)[:, :, 0:W]

    for s in range(0, W, 13):
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, 1, W), jnp.float32),
            scratch_shapes=[pltpu.VMEM((C, 1, 2 * W), jnp.float32)],
            interpret=True,
        )(jnp.asarray([s], jnp.int32), row)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.roll(np.asarray(row), -s, axis=2))


def test_flipped_dual_output_exact():
    """The flip_out kernel variant must emit EXACTLY the lane-flip of
    the standard output (same taps, different shift constant), and the
    dual helper's net_input must match the concat of the two standard
    sweeps bit-for-bit."""
    h, w, p = 32, 128, 4
    rng = np.random.RandomState(3)
    ref_img = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    src_img = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    depths = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, p))
    intr = jnp.asarray([[0.05, 0, 0], [0, 1, 0], [0, 0, 1.0]],
                       dtype=jnp.float32)[None]

    net, fgF, bgF = pallas_sweep.ods_sweep_identity_prepared(
        ref_img, src_img, depths, intr, interpret=True)
    assert net.shape == (1, h, w, 2 * p * 3)
    assert fgF.shape == (1, p, 3, h, w)

    net_ref = pallas_sweep.ods_sweep_identity(ref_img, 1, depths, intr,
                                              interpret=True)
    net_src = pallas_sweep.ods_sweep_identity(src_img, -1, depths, intr,
                                              interpret=True)
    np.testing.assert_array_equal(
        np.asarray(net), np.concatenate([net_ref, net_src], axis=-1))

    # fgF[p, c, i, j] == standard sweep at (i, W-1-j)
    std = np.asarray(net_ref).reshape(1, h, w, p, 3)
    flipped = np.transpose(std[0, :, ::-1], (2, 3, 0, 1))
    np.testing.assert_array_equal(np.asarray(fgF[0]), flipped)


def test_chunked_sweep_matches_dual():
    """Row-chunked dual sweep (the high-res path) vs the whole-image
    dual call; includes a shell near the viewing circle so at least one
    chunk takes the exact gather branch."""
    h, w, p = 64, 128, 4
    rng = np.random.RandomState(4)
    ref = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    src = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    depths = jnp.asarray([100.0, 2.0, 1.0, 0.09])  # 0.09 ~ circle 0.064
    intr = jnp.asarray([[0.064, 0, 0], [0, 1, 0], [0, 0, 1.0]],
                       dtype=jnp.float32)[None]

    _, fgF, bgF = pallas_sweep.ods_sweep_identity_prepared(
        ref, src, depths, intr, interpret=True)
    fgC, bgC = pallas_sweep.ods_sweep_identity_chunked(
        ref, src, depths, intr, chunk_rows=16, interpret=True)
    assert fgC.shape == fgF.shape
    # kernel chunks are bit-equal; gather chunks agree to the two
    # paths' float32 projection noise (same envelope as
    # test_fused_sweep_matches_gather_path). The 0.09 shell forces its
    # chunks onto the gather branch (whole-chunk granularity), so only
    # the noise envelope holds here.
    for got, ref_v in ((fgC, fgF), (bgC, bgF)):
        err = np.abs(np.asarray(got) - np.asarray(ref_v))
        assert err.max() < 2e-2, err.max()
        assert np.percentile(err, 99) < 2e-3, np.percentile(err, 99)


def test_chunked_sweep_production_depths_all_kernel():
    """With shells well clear of the viewing circle every chunk rides
    the kernel; chunked vs whole-image agree to the ulp-level noise of
    two separately-compiled trig evaluations (the eager chunked wrapper
    vs the jitted dual call evaluate _row_params independently, and a
    floor/park boundary can flip on an ulp — bounded, tiny)."""
    h, w, p = 64, 128, 4
    rng = np.random.RandomState(5)
    ref = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    src = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    depths = jnp.asarray(sweep_lib.inv_depths(5.0, 50.0, p))
    intr = jnp.asarray([[0.032, 0, 0], [0, 1, 0], [0, 0, 1.0]],
                       dtype=jnp.float32)[None]
    _, fgF, bgF = pallas_sweep.ods_sweep_identity_prepared(
        ref, src, depths, intr, interpret=True)
    fgC, bgC = pallas_sweep.ods_sweep_identity_chunked(
        ref, src, depths, intr, chunk_rows=16, interpret=True)
    for got, ref_v in ((fgC, fgF), (bgC, bgF)):
        err = np.abs(np.asarray(got) - np.asarray(ref_v))
        assert err.max() < 5e-3, err.max()
        assert np.percentile(err, 99) < 1e-3, np.percentile(err, 99)


def test_chunked_sweep_hres_height_rides_kernel():
    """Resolution-scaled ladder bound (_kvs_for): at hres heights the
    vertical displacement exceeds the 320-row _KVS=3, which used to
    flunk every chunk's fast gate and silently route the WHOLE hres
    sweep through the gather fallback (94 ms of the 215 ms 1024x512
    frame). With kvs scaled, production-depth chunks must (a) pass the
    fast gate and (b) match the gather path."""
    h, w, p = 512, 256, 4
    rng = np.random.RandomState(6)
    ref = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    src = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    depths = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, p))
    intr = jnp.asarray([[0.032, 0, 0], [0, 1, 0], [0, 0, 1.0]],
                       dtype=jnp.float32)[None]

    # (a) the fast gate passes for EVERY chunk at production depths:
    # the scaled ladder covers the true vertical displacement
    # (2.23 * h/320 > 3 above 430 rows) and the 16-column probe kills
    # the all-columns-parked noise rows whose bogus dy_relevant (a
    # park at v=1 hundreds of rows away) used to flunk whole chunks.
    kvs = pallas_sweep._kvs_for(h)
    assert kvs > pallas_sweep._KVS
    pr = pallas_sweep._row_params(1, depths, intr[0], h, w,
                                  flip_out=True, kvs=kvs)
    ps = pallas_sweep._row_params(-1, depths, intr[0], h, w,
                                  flip_out=True, kvs=kvs)
    dyr = np.concatenate([np.asarray(pr["dy_relevant"]),
                          np.asarray(ps["dy_relevant"])])
    assert dyr.max() <= kvs, (dyr.max(), kvs)

    # (b) chunked == whole-image dual kernel (identical parameter
    # computation at the scaled kvs; kernel chunks are bit-equal —
    # comparing against the per-pixel gather path instead would only
    # re-measure the far-shell equator disc-cancellation noise of THAT
    # path, see test_fused_sweep_matches_gather_path's envelope)
    _, fgF, bgF = pallas_sweep.ods_sweep_identity_prepared(
        ref, src, depths, intr, interpret=True)
    fgC, bgC = pallas_sweep.ods_sweep_identity_chunked(
        ref, src, depths, intr, chunk_rows=128, interpret=True)
    for got, ref_v in ((fgC, fgF), (bgC, bgF)):
        err = np.abs(np.asarray(got, np.float32)
                     - np.asarray(ref_v, np.float32))
        # plane 0 is the farthest shell: its equatorial rows sit in the
        # projection's f32 disc-cancellation zone, where eager vs
        # jitted trig legitimately disagree (u0 noise ~1e-2 px) — only
        # a mean envelope is pinnable there. Nearer shells are tight.
        assert err[0, 1:].max() < 5e-3, err[0, 1:].max()
        assert err[0, 0].mean() < 1e-3, err[0, 0].mean()


def test_sdyn_dynamic_base_barrel_bit_exact():
    """sdyn (perf_flags): per-block dynamic-base shift decomposition.
    The barrel applies the identical total rotation (base + residual),
    so the output must be BIT-equal to the full static barrel — both
    the dual-eye planar path and a shape whose shifts wrap inside a
    block."""
    h, w, p = 32, 64, 6
    rng = np.random.RandomState(7)
    ref = jnp.asarray(rng.rand(h, w, 3).astype(np.float32))
    src = jnp.asarray(rng.rand(h, w, 3).astype(np.float32))
    depths = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, p))
    intr = jnp.asarray([[0.064, 0, 0], [0, 1, 0], [0, 0, 1.0]],
                       dtype=jnp.float32)
    a = pallas_sweep._ods_sweep_dual_stack(
        ref, src, depths, intr, h, w, interpret=True, dynshift=False,
        out_row_pad=pallas_sweep.NET_ROW_PAD)
    b = pallas_sweep._ods_sweep_dual_stack(
        ref, src, depths, intr, h, w, interpret=True, dynshift=True,
        out_row_pad=pallas_sweep.NET_ROW_PAD)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    # near-circle shell: invalid rows + validity-boundary rows exercise
    # the invalid-ds-zeroing and the slow path
    depths2 = jnp.asarray([0.09, 1.0, 5.0])
    a2 = pallas_sweep._ods_sweep_dual_stack(
        ref, src, depths2, intr, h, w, interpret=True, dynshift=False)
    b2 = pallas_sweep._ods_sweep_dual_stack(
        ref, src, depths2, intr, h, w, interpret=True, dynshift=True)
    for x, y in zip(a2, b2):
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_rowmajor_out_matches_planar_layout():
    """xrm (perf_flags): the sweep kernel's second output must equal the
    row-major layout transform of the planar volumes (flip-free: both
    are already flipped): x_rm == transpose(concat(fg, bg).reshape
    (2P*C, H, W), (1, 0, 2))."""
    h, w, p = 32, 64, 6
    rng = np.random.RandomState(8)
    ref = jnp.asarray(rng.rand(h, w, 3).astype(np.float32))
    src = jnp.asarray(rng.rand(h, w, 3).astype(np.float32))
    depths = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, p))
    intr = jnp.asarray([[0.064, 0, 0], [0, 1, 0], [0, 0, 1.0]],
                       dtype=jnp.float32)
    pad = pallas_sweep.NET_ROW_PAD
    fg, bg, xrm = pallas_sweep._ods_sweep_dual_stack(
        ref, src, depths, intr, h, w, interpret=True,
        out_row_pad=pad, rowmajor_out=True)
    vol = jnp.concatenate([fg, bg], axis=0)[:, :, pad:pad + h]
    want = jnp.transpose(vol.reshape(-1, h, w), (1, 0, 2))
    np.testing.assert_array_equal(np.asarray(xrm), np.asarray(want))
