#!/usr/bin/env python3
"""First-contact TPU triage: compile + run every round-3 kernel at
production shape, one at a time, with clear pass/fail and timing.

Run on the axon env:  python tools/tpu_smoke.py [--fast]

Order: cheapest/most-proven first, so a failure pinpoints the culprit
without wading through compiles.
"""

import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

FAST = "--fast" in sys.argv


def step(name):
    def deco(fn):
        def run():
            t0 = time.perf_counter()
            try:
                out = fn()
                dt = time.perf_counter() - t0
                print(f"[smoke] {name}: OK ({dt:.1f}s) {out or ''}",
                      flush=True)
                return True
            except Exception as e:  # noqa: BLE001
                dt = time.perf_counter() - t0
                print(f"[smoke] {name}: FAIL ({dt:.1f}s) "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)
                traceback.print_exc(limit=3)
                return False
        run.name = name
        return run
    return deco


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/matry_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"[smoke] devices: {jax.devices()}", flush=True)

    from matryodshka_tpu.geometry import sweep as sweep_lib
    from matryodshka_tpu.models import msi as msi_lib
    from matryodshka_tpu.ops import pallas_net, pallas_render, pallas_sweep

    H, W, P = 320, 640, 32
    rng = np.random.RandomState(0)
    depths = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, P))
    intr = np.eye(3, dtype=np.float32)[None].copy()
    intr[:, 0, 0] = 0.032
    intr = jnp.asarray(intr)
    ref = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    src = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))

    @step("dual sweep (2P grid, flipped volumes)")
    def s1():
        net, fgF, bgF = pallas_sweep.ods_sweep_identity_prepared(
            ref, src, depths, intr, out_dtype=jnp.bfloat16)
        jax.block_until_ready(fgF)
        return f"fgF {fgF.shape} {fgF.dtype}"

    @step("prepared assemble + ladder render + caps (full pipeline sans net)")
    def s2():
        net, fgF, bgF = pallas_sweep.ods_sweep_identity_prepared(
            ref, src, depths, intr, out_dtype=jnp.bfloat16)
        pred = jnp.tanh(jnp.asarray(
            rng.randn(H, W, 2 * P).astype(np.float32) * 0.3))
        from matryodshka_tpu.geometry import render as render_geo
        cap_pad = render_geo._cap_band_pad(H, W, pallas_render.CAP_ROWS)
        d = msi_lib.assemble_rgba_prepared("blend_psv", pred, fgF[0],
                                           bgF[0], P, cap_pad=cap_pad,
                                           dtype=jnp.bfloat16)
        outs = {k: v[None] for k, v in d.items()}
        img = msi_lib.render_equirect_view_from_prepared(
            outs, jnp.eye(4)[None], jnp.asarray([[0.03, 0.0, 0.0]]),
            depths, H)
        jax.block_until_ready(img)
        return f"img {img.shape}"

    @step("whole-net kernel (bf16, 640x320)")
    def s3():
        from matryodshka_tpu.models.unet import MSIUNet
        model = MSIUNet(num_outputs=64, ngf=64, variant="wrap",
                        dtype=jnp.bfloat16, param_dtype=jnp.float32)
        x = jnp.asarray(rng.randn(1, H, W, 192).astype(np.float32) * 0.5)
        params = model.init(jax.random.PRNGKey(1), x)
        ops = pallas_net.prepare_params(params, 64, 192, 64)
        xr = jnp.transpose(x[0], (0, 2, 1)).astype(jnp.bfloat16)
        y = pallas_net.unet_forward(xr, ops, 64, 64)
        jax.block_until_ready(y)
        refp = model.apply(params, x)[0]
        err = float(jnp.max(jnp.abs(jnp.transpose(y, (0, 2, 1)) - refp)))
        return f"pred {y.shape}, vs flax max err {err:.3e}"

    @step("fullres exactness (pallas-vs-gather, f32/bf16/rotation)")
    def s4():
        sys.path.insert(0, "tests")
        from test_tpu_fullres import run_checks
        e32, e16, erot = run_checks()
        return f"f32 {e32:.2e} bf16 {e16:.2e} rot {erot:.2e}"

    @step("chunked hres kernels (sweep+render at 1024x512 probe)")
    def s5():
        hh, hw = 1024, 512
        r2 = jnp.asarray(rng.rand(1, hh, hw, 3).astype(np.float32))
        s2_ = jnp.asarray(rng.rand(1, hh, hw, 3).astype(np.float32))
        fgF, bgF = pallas_sweep.ods_sweep_identity_chunked(
            r2, s2_, depths, intr, chunk_rows=128,
            out_dtype=jnp.bfloat16)
        jax.block_until_ready(fgF)
        from matryodshka_tpu.geometry import render as render_geo
        from matryodshka_tpu.models import msi as m
        cap = max(16, hh // 16)
        cap_pad = render_geo._cap_band_pad(hh, hw, cap)
        kv = pallas_render.default_bounds(hh, hw, cap)[1]
        u_b = jnp.asarray(rng.rand(hh, hw, P).astype(np.float32))
        u_a = jnp.asarray(rng.rand(hh, hw, P).astype(np.float32))
        d = m.assemble_hres_prepared("blend_psv", u_b, u_a, fgF[0],
                                     bgF[0], None, cap, 32, cap_pad, kv,
                                     dtype=jnp.bfloat16)
        outs = {k: v[None] for k, v in d.items()}
        img = m.render_equirect_view_from_prepared(
            outs, jnp.eye(4)[None], jnp.asarray([[0.03, 0.0, 0.0]]),
            depths, hh, cap=cap, chunk_rows=128)
        jax.block_until_ready(img)
        return f"hres img {img.shape}"

    steps = [s1, s2, s3, s4] + ([] if FAST else [s5])
    results = [s() for s in steps]
    print(f"[smoke] {sum(results)}/{len(results)} passed", flush=True)
    sys.exit(0 if all(results) else 1)


if __name__ == "__main__":
    main()
