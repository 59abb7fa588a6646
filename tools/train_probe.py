#!/usr/bin/env python3
"""Split the TPU train-step budget (r4: 4166 ms/step measured for the
pixel-loss DP step — 300x the inference frame). Suspect: the gather
render's backward lowers to a [320,640,32,4]-update scatter-add.

Phases (each chained inside one jit, steady-state device ms):
  fwd        — loss forward only
  step       — full value_and_grad + Adam update (the production step)
  net_grad   — U-Net-only backward (fixed PSV input)
  rend_grad  — render-only backward (grad wrt rgba through the XLA
               gather render, the scatter suspect)
  rend_fwd   — render forward only

Run:  python tools/train_probe.py
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
    print("devices:", jax.devices(), flush=True)

    from matryodshka_tpu.config import MatryConfig
    from matryodshka_tpu.geometry import sweep as sweep_lib
    from matryodshka_tpu.models import msi as msi_lib
    from matryodshka_tpu.training import state as state_lib
    from matryodshka_tpu.training import step as step_lib
    from tools.r4_hw_session import _ods_batch

    cfg = MatryConfig(height=320, width=640, num_psv_planes=32,
                      num_msi_planes=32, ngf=64, batch_size=1,
                      which_loss="pixel", coord_net=True,
                      compute_dtype="bfloat16").validate()
    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    batch = _ods_batch(cfg)
    batch["tgt_image"] = batch["tgt_image"]
    key = jax.random.PRNGKey(1)
    loss_fn = step_lib.make_loss_fn(cfg, model.apply)
    msi_depths = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_msi_planes))

    CHAIN = 4

    def timeit(fn, *args, iters=3, warmup=1):
        for _ in range(warmup):
            jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / (iters * CHAIN) * 1000.0

    # ---- fwd: loss forward only ----
    @jax.jit
    def fwd_chain(params, batch, key):
        def body(_, c):
            l, _aux = loss_fn(params, batch, key)
            return c + l * 1e-9
        return jax.lax.fori_loop(0, CHAIN, body, 0.0)

    try:
        ms = timeit(fwd_chain, state.params, batch, key)
        print(f"[probe] fwd loss only: {ms:.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[probe] fwd FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    # ---- net_grad: U-Net fwd+bwd only ----
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, cfg.height, cfg.width,
                             cfg.num_psv_planes * 6).astype(np.float32))

    @jax.jit
    def net_grad_chain(params, x):
        def one(params):
            def f(p):
                y = model.apply(p, x)
                return jnp.sum(jnp.square(y.astype(jnp.float32)))
            return jax.grad(f)(params)
        def body(_, c):
            g = one(params)
            return c + jax.tree_util.tree_leaves(g)[0].mean() * 1e-9
        return jax.lax.fori_loop(0, CHAIN, body, 0.0)

    try:
        ms = timeit(net_grad_chain, state.params, x)
        print(f"[probe] net fwd+bwd: {ms:.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[probe] net_grad FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    # ---- render fwd / bwd (the scatter suspect) ----
    rgba = jnp.asarray(rng.rand(1, cfg.height, cfg.width,
                                cfg.num_msi_planes, 4).astype(np.float32))
    eye = jnp.eye(4)[None]
    tgt = batch["tgt_pose"]

    @jax.jit
    def rend_fwd_chain(rgba):
        def body(_, c):
            img = msi_lib.render_equirect_view(rgba, eye, tgt, msi_depths)
            return c + img.mean() * 1e-9
        return jax.lax.fori_loop(0, CHAIN, body, 0.0)

    @jax.jit
    def rend_grad_chain(rgba):
        def one(rgba):
            def f(r):
                img = msi_lib.render_equirect_view(r, eye, tgt,
                                                   msi_depths)
                return jnp.sum(jnp.square(img))
            return jax.grad(f)(rgba)
        def body(_, c):
            g = one(rgba)
            return c + g.mean() * 1e-9
        return jax.lax.fori_loop(0, CHAIN, body, 0.0)

    for name, fn, args in (("render fwd", rend_fwd_chain, (rgba,)),
                           ("render fwd+bwd", rend_grad_chain, (rgba,))):
        try:
            ms = timeit(fn, *args)
            print(f"[probe] {name}: {ms:.1f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[probe] {name} FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # ---- full production step ----
    tx = state_lib.build_optimizer(cfg)
    step_fn = step_lib.make_train_step(cfg, model.apply, tx, donate=False)
    try:
        t0 = time.perf_counter()
        s2, m = step_fn(state, batch, key)
        jax.block_until_ready(m["total_loss"])
        compile_s = time.perf_counter() - t0
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            s2, m = step_fn(state, batch, key)
        jax.block_until_ready(m["total_loss"])
        ms = (time.perf_counter() - t0) / n * 1000.0
        print(f"[probe] full step: {ms:.1f} ms (compile {compile_s:.0f}s,"
              f" loss {float(m['total_loss']):.1f})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[probe] full step FAIL {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
