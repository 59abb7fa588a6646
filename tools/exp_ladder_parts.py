#!/usr/bin/env python3
"""Split the tiled ladder render's stage budget on real TPU hardware.

Times the production kernel against elided variants (the `parts` knob
in _render_kernel_tiled) at the bench and diagonal poses:

  all       — production
  norolls   — no roll chain            => all - norolls  = roll cost
  nofma     — coef built, tap skipped  => all - nofma    = tap-FMA cost
  rollsonly — band copy + rolls only   => rollsonly      = copy+roll+
                                          composite + loop overhead
  noacc     — accumulator write-only   => all - noacc    = RMW read+add
  noch      — ch build skipped         => all - noch     = ch build

Run:  python tools/exp_ladder_parts.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/matry_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from matryodshka_tpu.geometry import intersect
    from matryodshka_tpu.geometry import sweep as sweep_lib
    from matryodshka_tpu.ops import pallas_render as pr

    H, W, P, CAP, RB = 320, 640, 32, pr.CAP_ROWS, pr.ROW_BLOCK
    rng = np.random.RandomState(0)
    radii = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, P))
    pose = jnp.eye(4)
    kh, kv = pr.default_bounds(H, W, CAP)
    wb = pr.default_wb(W)
    CHAIN = 20

    rgba = np.asarray(rng.rand(H, W, P, 4), np.float32)
    layers = None

    def timeit(fn, *args, iters=3, warmup=2):
        for _ in range(warmup):
            jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / (iters * CHAIN) * 1000.0

    for tname, tgt in (("bench", jnp.asarray([0.05, 0.0, 0.0])),
                       ("diag", jnp.asarray([0.05, 0.05, 0.05]))):
        u, v = intersect.intersect_sphere_uv(pose, tgt, radii, W, H)
        um = jax.block_until_ready(u[:, CAP:H - CAP].astype(jnp.float32))
        vm = jax.block_until_ready(v[:, CAP:H - CAP].astype(jnp.float32))
        layers = jax.block_until_ready(pr.prepare_layers(
            jnp.asarray(rgba), CAP, RB, kv, jnp.bfloat16))

        res = {}
        for parts in ("all", "norolls", "nofma", "rollsonly", "noacc",
                      "noch"):
            @jax.jit
            def chain(lay, parts=parts):
                def body(_, l):
                    o = pr._ladder_render_mid_uv(
                        l, um, vm, CAP, RB, kh, kv, wb=wb, parts=parts)
                    return l + o.mean().astype(l.dtype) * 1e-6
                return jax.lax.fori_loop(0, CHAIN, body, lay)
            try:
                res[parts] = timeit(chain, layers)
                print(f"[parts] {tname}/{parts}: {res[parts]:.2f} ms",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"[parts] {tname}/{parts}: FAIL "
                      f"{type(e).__name__}: {str(e)[:150]}", flush=True)
        if "all" in res:
            a = res["all"]
            msg = [f"[parts] {tname} split: total={a:.2f}"]
            if "norolls" in res:
                msg.append(f"rolls={a - res['norolls']:.2f}")
            if "nofma" in res:
                msg.append(f"tap_fma={a - res['nofma']:.2f}")
            if "rollsonly" in res:
                msg.append(f"copy+roll+loop={res['rollsonly']:.2f}")
            if "noacc" in res:
                msg.append(f"acc_rmw={a - res['noacc']:.2f}")
            if "noch" in res:
                msg.append(f"ch_build={a - res['noch']:.2f}")
            print(" ".join(msg), flush=True)


if __name__ == "__main__":
    main()
