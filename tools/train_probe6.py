#!/usr/bin/env python3
"""Decompose the pixel train step's 1418 ms/step (scan-measured,
STATUS r4) into net / MSI-assembly / render backward slabs.

Three grad targets, each K=10 steps scanned in ONE jit with a tiny
SGD update on the carried params (prevents loop-invariant hoisting;
Adam's cost is negligible next to the slabs being measured):

  net    grad of sum(net(psv_const))            — U-Net fwd+bwd only
  rgba   grad of sum(infer_msi(...).rgba)       — + sweep fwd, color
                                                   assembly fwd+bwd
  pixel  the production pixel loss              — + render fwd+bwd
                                                   (gather VJP = TPU
                                                   scatter suspects)

Param grads never flow through the SWEEP gathers (batch images are not
differentiated), so sweep contributes forward-only cost; the scatter
suspects are the render/assembly backwards.

Run: python tools/train_probe6.py [net] [rgba] [pixel]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

K_INNER = 10
N_CALLS = 3


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/matry_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    which = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        ["net", "rgba", "pixel"]
    print("devices:", jax.devices(), flush=True)

    from matryodshka_tpu.config import MatryConfig
    from matryodshka_tpu.geometry import sweep as sweep_lib
    from matryodshka_tpu.models import msi as msi_lib
    from matryodshka_tpu.training import state as state_lib
    from matryodshka_tpu.training.step import make_loss_fn
    from tools.r4_hw_session import _ods_batch

    cfg = MatryConfig(height=320, width=640, num_psv_planes=32,
                      num_msi_planes=32, ngf=64, batch_size=1,
                      which_loss="pixel", coord_net=True,
                      compute_dtype="bfloat16").validate()
    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    params = state.params
    batch = {k: jnp.asarray(v) for k, v in _ods_batch(cfg).items()}
    psv_depths = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_psv_planes))
    apply = lambda p, x: model.apply(p, x)  # noqa: E731

    out0 = jax.jit(lambda p: msi_lib.infer_msi(
        apply, p, cfg, batch, psv_depths))(params)
    psv_const = jax.lax.stop_gradient(out0["psv"])
    print(f"psv {psv_const.shape} rgba {out0['rgba_layers'].shape}",
          flush=True)

    prod_loss = make_loss_fn(cfg, apply)
    rng = jax.random.PRNGKey(2)

    targets = {
        "net": lambda p: jnp.sum(
            apply(p, psv_const).astype(jnp.float32)),
        "rgba": lambda p: jnp.sum(msi_lib.infer_msi(
            apply, p, cfg, batch, psv_depths)["rgba_layers"]
            .astype(jnp.float32)),
        "pixel": lambda p: prod_loss(p, batch, rng)[0],
    }

    import optax
    from matryodshka_tpu.training.state import TrainState
    tx = state_lib.build_optimizer(cfg)

    for name in which:
        if name == "adam":
            # Full Adam + TrainState carry on the production pixel
            # loss, but NO metrics dict / grad_norm / has_aux plumbing:
            # bisects probe3's 1391 ms/step vs the bare grad+SGD
            # 140 ms/step.
            def multi(s0):
                def body(s, _):
                    l, g = jax.value_and_grad(
                        lambda p: prod_loss(p, batch, rng)[0])(s.params)
                    updates, opt = tx.update(g, s.opt_state, s.params)
                    p = optax.apply_updates(s.params, updates)
                    return TrainState(step=s.step + 1, params=p,
                                      opt_state=opt), l
                return jax.lax.scan(body, s0, None, length=K_INNER)

            fn = jax.jit(multi, donate_argnums=(0,))
            s0, _ = state_lib.init_state(cfg, jax.random.PRNGKey(0))
            t0 = time.time()
            s0, ls = fn(s0)
            jax.block_until_ready(ls)
            print(f"[gradsplit/adam] compile+first {K_INNER}: "
                  f"{time.time() - t0:.0f}s", flush=True)
            t0 = time.perf_counter()
            for _ in range(N_CALLS):
                s0, ls = fn(s0)
            jax.block_until_ready(ls)
            ms = (time.perf_counter() - t0) / (N_CALLS * K_INNER) * 1e3
            print(f"[gradsplit/adam] {ms:.1f} ms/step "
                  f"(l={float(ls[0]):.4g})", flush=True)
            continue

        f = targets[name]

        def multi(params):
            def body(p, _):
                l, g = jax.value_and_grad(f)(p)
                # tiny SGD keeps the loop body step-dependent
                p = jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)
                return p, l
            return jax.lax.scan(body, params, None, length=K_INNER)

        fn = jax.jit(multi, donate_argnums=(0,))
        p0 = jax.tree.map(jnp.copy, params)
        t0 = time.time()
        p0, ls = fn(p0)
        jax.block_until_ready(ls)
        print(f"[gradsplit/{name}] compile+first {K_INNER}: "
              f"{time.time() - t0:.0f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(N_CALLS):
            p0, ls = fn(p0)
        jax.block_until_ready(ls)
        ms = (time.perf_counter() - t0) / (N_CALLS * K_INNER) * 1000.0
        print(f"[gradsplit/{name}] {ms:.1f} ms/step "
              f"(l={float(ls[0]):.4g})", flush=True)


if __name__ == "__main__":
    main()
