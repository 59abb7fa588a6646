#!/usr/bin/env python3
"""A/B the DP-wrapped train step (r4b measured 4166 ms/step) against
the plain-jit step (train_probe measured 146.7 ms/step) in ONE
process, isolating: GSPMD shardings, donation, per-iter host key
splits, and the steady-state loop shape.

Measured 2026-08-19 (v5e, 640x320x32 b1 pixel CoordNet bf16):
  plain presplit 231.6 / plain hostsplit 252.9 (donate=False)
  donate presplit 144.7
  dp presplit 4197.4  <-- pathological
  dp hostsplit 144.2
The DP step itself is fine; feeding it keys sliced from a pre-split
[iters,2] array stalls it ~29x. This probe's foldin/logcompiles modes
pin down whether the production loop's fold_in pattern (loop.py:90)
is affected and whether the stall is recompilation.

Run:  python tools/train_probe2.py [--log-compiles] [phases...]
phases: plain donate dp foldin   (default: dp foldin)
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
    if "--log-compiles" in sys.argv:
        jax.config.update("jax_log_compiles", True)
    phases = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        ["dp", "foldin"]
    print("devices:", jax.devices(), flush=True)

    from matryodshka_tpu.config import MatryConfig
    from matryodshka_tpu.parallel import dp, mesh as mesh_lib
    from matryodshka_tpu.training import state as state_lib
    from matryodshka_tpu.training import step as step_lib
    from tools.r4_hw_session import _ods_batch

    cfg = MatryConfig(height=320, width=640, num_psv_planes=32,
                      num_msi_planes=32, ngf=64, batch_size=1,
                      which_loss="pixel", coord_net=True,
                      compute_dtype="bfloat16").validate()
    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    tx = state_lib.build_optimizer(cfg)
    key = jax.random.PRNGKey(1)

    def run(name, step_fn, batch, state0, iters=10, keymode="hostsplit"):
        try:
            t0 = time.time()
            s, m = step_fn(state0, batch, key)
            jax.block_until_ready(m["total_loss"])
            print(f"[{name}] compile+1st {time.time() - t0:.1f}s",
                  flush=True)
            keys = (jax.random.split(key, iters)
                    if keymode == "presplit" else None)
            k = key
            t0 = time.perf_counter()
            for i in range(iters):
                if keymode == "presplit":
                    sub = keys[i]
                elif keymode == "foldin":    # loop.py:90's pattern
                    sub = jax.random.fold_in(key, i)
                else:
                    k, sub = jax.random.split(k)
                s, m = step_fn(s, batch, sub)
            jax.block_until_ready(m["total_loss"])
            ms = (time.perf_counter() - t0) / iters * 1000.0
            print(f"[{name}] {ms:.1f} ms/step", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[{name}] FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    batch_j = _ods_batch(cfg)
    if "plain" in phases:
        plain = step_lib.make_train_step(cfg, model.apply, tx,
                                         donate=False)
        run("plain presplit", plain, batch_j, state, keymode="presplit")
        run("plain hostsplit", plain, batch_j, state)

    if "donate" in phases:
        don = step_lib.make_train_step(cfg, model.apply, tx, donate=True)
        state2, _ = state_lib.init_state(cfg, jax.random.PRNGKey(0))
        run("donate presplit", don, batch_j, state2, keymode="presplit")

    # DP wrapper (exactly the r4b path)
    mesh = mesh_lib.make_mesh(data=1)
    dpstep = dp.make_dp_train_step(cfg, model.apply, tx, mesh)
    batch_dp = dp.shard_batch(
        {k: np.asarray(v) for k, v in _ods_batch(cfg).items()}, mesh)
    if "dp" in phases:
        state3, _ = state_lib.init_state(cfg, jax.random.PRNGKey(0))
        run("dp presplit", dpstep, batch_dp, state3, keymode="presplit")
        state3, _ = state_lib.init_state(cfg, jax.random.PRNGKey(0))
        run("dp hostsplit", dpstep, batch_dp, state3)
    if "foldin" in phases:
        state4, _ = state_lib.init_state(cfg, jax.random.PRNGKey(0))
        run("dp foldin", dpstep, batch_dp, state4, keymode="foldin")


if __name__ == "__main__":
    main()
