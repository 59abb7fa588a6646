#!/usr/bin/env python3
"""Stage split + parameter sweep for the fused high-res re-render
(VERDICT r4 item 7: 1024x512 at 215 ms -> target <= 100 ms).

Times, at hres_height x hres_width (default 512x1024):
  sweep    — ods_sweep_identity_chunked (chunked dual-eye planar sweep)
  upsample — upsample_align_corners of blend/alpha to hres
  assemble — assemble_hres_prepared (prepared stack + cap bands)
  render   — render_equirect_view_from_prepared (chunked ladder + caps)
  e2e      — the full build_hres_render_fn_fused pipeline
and sweeps (cap, render_chunk) for the render stage.

Run: python tools/exp_hres_stages.py [--hh 512 --hw 1024]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hh", type=int, default=512)
    ap.add_argument("--hw", type=int, default=1024)
    ap.add_argument("--chain", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/matry_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from matryodshka_tpu.config import MatryConfig
    from matryodshka_tpu.cli import test as test_cli
    from matryodshka_tpu.geometry import render as render_geo
    from matryodshka_tpu.geometry import sweep as sweep_lib
    from matryodshka_tpu.models import msi as msi_lib
    from matryodshka_tpu.ops import pallas_render, pallas_sweep

    hh, hw = args.hh, args.hw
    CHAIN = args.chain
    cfg = MatryConfig(height=320, width=640, num_psv_planes=32,
                      num_msi_planes=32, ngf=64, coord_net=True,
                      supervision="tgt_hrestgt", hres_height=hh,
                      hres_width=hw,
                      compute_dtype="bfloat16").validate()
    p = cfg.num_psv_planes
    print(f"[hres] devices: {jax.devices()} shape {hw}x{hh}x{p}",
          file=sys.stderr)

    rng = np.random.RandomState(0)
    b = 1
    hres_ref = jnp.asarray(rng.rand(b, hh, hw, 3).astype(np.float32))
    hres_src = jnp.asarray(rng.rand(b, hh, hw, 3).astype(np.float32))
    blend = jnp.asarray(rng.rand(b, 320, 640, p).astype(np.float32))
    alphas = jnp.asarray(
        (rng.rand(b, 320, 640, p) * 2 - 1).astype(np.float32))
    intr = np.tile(np.eye(3, dtype=np.float32)[None], (b, 1, 1))
    intr[:, 0, 0] = 0.032
    intr = jnp.asarray(intr)
    eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
    tgt_pose = jnp.asarray([[0.05, 0.0, 0.0]])
    psv_depths = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, p))

    plan = test_cli._hres_fused_plan(hh, hw)
    cap0, render_chunk0, sweep_chunk0 = plan
    print(f"[hres] plan: cap={cap0} render_chunk={render_chunk0} "
          f"sweep_chunk={sweep_chunk0}", flush=True)

    def timeit(fn, *a, iters=3, warmup=1):
        for _ in range(warmup):
            jax.block_until_ready(fn(*a))
        best = 1e18
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best / CHAIN * 1000.0

    ref_p = msi_lib.preprocess_image(hres_ref)
    src_p = msi_lib.preprocess_image(hres_src)

    # -- sweep stage
    @jax.jit
    def stage_sweep(r, s):
        def body(_, rr):
            fgF, bgF = pallas_sweep.ods_sweep_identity_chunked(
                rr, s, psv_depths, intr, chunk_rows=sweep_chunk0,
                out_dtype=cfg.jnp_compute_dtype)
            return rr + fgF.astype(jnp.float32).mean() * 1e-12
        return jax.lax.fori_loop(0, CHAIN, body, r)
    try:
        print(f"[hres] sweep: {timeit(stage_sweep, ref_p, src_p):.1f} ms",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[hres] sweep: FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    # -- upsample stage
    @jax.jit
    def stage_up(bl, al):
        def body(_, x):
            u = msi_lib.upsample_align_corners(
                jnp.concatenate([bl, al], axis=-1) + x.mean() * 1e-12,
                hh, hw)
            return x + u.mean()[None, None, None, None] * 1e-12
        return jax.lax.fori_loop(0, CHAIN, body,
                                 jnp.zeros((1, 1, 1, 1)))
    print(f"[hres] upsample: {timeit(stage_up, blend, alphas):.1f} ms",
          flush=True)

    # operands for assemble/render
    fgF, bgF = jax.jit(
        lambda r, s: pallas_sweep.ods_sweep_identity_chunked(
            r, s, psv_depths, intr, chunk_rows=sweep_chunk0,
            out_dtype=cfg.jnp_compute_dtype))(ref_p, src_p)
    fgF = jax.block_until_ready(fgF)
    u_ba = jax.jit(lambda bl, al: msi_lib.upsample_align_corners(
        jnp.concatenate([bl, al], axis=-1), hh, hw))(blend, alphas)
    u_ba = jax.block_until_ready(u_ba)

    def synth_prepared(cap):
        """Random prepared/cap-band dict at the exact assemble shapes —
        the real assemble bakes the upsample one-hots into the HLO and
        a CHAIN-looped probe of it exceeds the relay's compile-request
        size cap (HTTP 413); render timing only needs shapes/dtypes."""
        cap_pad = render_geo._cap_band_pad(hh, hw, cap)
        kv = pallas_render.default_bounds(hh, hw, cap)[1]
        _, _, pad = pallas_render._band_geometry(
            cap, pallas_render.ROW_BLOCK, kv)
        rs = np.random.RandomState(cap)
        dt = cfg.jnp_compute_dtype
        prepared = jnp.asarray(
            rs.rand(b, p, 4, hh + 2 * pad, hw), dt)
        rows = cap + 2 * cap_pad
        cap_top = jnp.asarray(rs.rand(b, rows, hw, p, 4), dt)
        cap_bot = jnp.asarray(rs.rand(b, rows, hw, p, 4), dt)
        return {"prepared": prepared, "cap_top": cap_top,
                "cap_bot": cap_bot}

    # -- render stage sweep over (cap, chunk)
    for cap in sorted({cap0, 48, 64, 80}):
        hm = hh - 2 * cap
        if hm <= 0 or hm % 32:
            continue
        outs = jax.tree.map(jax.block_until_ready, synth_prepared(cap))
        for chunk in (128, 64, None):
            if chunk is not None and hm % chunk:
                continue
            @jax.jit
            def stage_render(o, cap=cap, chunk=chunk):
                def body(_, x):
                    img = msi_lib.render_equirect_view_from_prepared(
                        o, eye, tgt_pose + x * 1e-12, psv_depths, hh,
                        cap=cap, chunk_rows=chunk)
                    return img.mean() * 1e-12
                return jax.lax.fori_loop(0, CHAIN, body, jnp.zeros(()))
            try:
                ms = timeit(stage_render, outs)
                print(f"[hres] render cap={cap} chunk={chunk}: "
                      f"{ms:.1f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"[hres] render cap={cap} chunk={chunk}: FAIL "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)

    # -- e2e (the production fused fn)
    fn = test_cli.build_hres_render_fn_fused(cfg)
    if fn is None:
        print("[hres] e2e: fused fn unavailable", flush=True)
        return
    args6 = (hres_ref, hres_src, blend, alphas, eye, eye, eye, intr,
             tgt_pose)
    for _ in range(2):
        jax.block_until_ready(fn(*args6)[0])
    best = 1e18
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args6)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"[hres] e2e (production fused): {best * 1000:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
