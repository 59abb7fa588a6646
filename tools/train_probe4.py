#!/usr/bin/env python3
"""Discriminate the in-step E-LPIPS blowup.

Measured so far (all scan-in-one-jit, v5e, 640x320x32 b1 coord bf16):
  train step, pixel loss:            1418 ms (fwd-only 144)
  train step, elpips loss:          18664 ms (fwd-only 12509)
  E-LPIPS metric alone (isolated):    7.3 ms/forward (plain LPIPS 1.3)
So the metric is ~1700x slower inside the train-step graph than in
isolation. This probe swaps the loss's metric for plain LPIPS (no
transform ensemble, no 16-branch switch, no dropout) while keeping
everything else the production elpips path:
  - fast (~150-200 ms)  -> the ensemble/switch-in-graph interaction
    is the pathology;
  - still seconds       -> any VGG-loss-in-step blows up (scheduling/
    layout of the conv tower inside the big graph).

Run: python tools/train_probe4.py [--fwd]
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
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/matry_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    fwd_only = "--fwd" in sys.argv
    print("devices:", jax.devices(), flush=True)

    from matryodshka_tpu.config import MatryConfig
    from matryodshka_tpu.losses.elpips import api as elpips_api
    from matryodshka_tpu.parallel import dp, mesh as mesh_lib
    from matryodshka_tpu.training import state as state_lib
    from matryodshka_tpu.training.state import TrainState
    from matryodshka_tpu.training.step import make_loss_fn
    from tools.r4_hw_session import _ods_batch

    cfg = MatryConfig(height=320, width=640, num_psv_planes=32,
                      num_msi_planes=32, ngf=64, batch_size=1,
                      which_loss="elpips", coord_net=True,
                      compute_dtype="bfloat16").validate()
    mesh = mesh_lib.make_mesh(data=1)
    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    tx = state_lib.build_optimizer(cfg)
    if "--static-ensemble" in sys.argv:
        # Production elpips_vgg ensemble but with HOST-drawn (scale,
        # swap) pinned to the modal draw (1, False): the single-branch
        # grad path of cfg.elpips_host_scale. Expect pixel-step cost +
        # transforms + one VGG branch if the 16-branch switch backward
        # is the 16.7 s pathology.
        name = "elpips-static"
        metric = elpips_api.Metric(elpips_api.elpips_vgg(cfg.batch_size))
        lfn = lambda p, t, rng: metric.forward(  # noqa: E731
            p, t, rng, static_scale_swap=(1, False))
    else:
        # Plain LPIPS in place of the production elpips_vgg ensemble.
        name = "lpips"
        metric = elpips_api.Metric(elpips_api.lpips_vgg(cfg.batch_size))
        lfn = lambda p, t, rng: metric.forward(p, t, rng)  # noqa: E731
    loss_fn = make_loss_fn(cfg, model.apply, lfn)

    def multi_step(state, batch, base_key):
        def body(s, _):
            rng = jax.random.fold_in(base_key, s.step)
            if fwd_only:
                l, aux = loss_fn(s.params, batch, rng)
                return TrainState(step=s.step + 1, params=s.params,
                                  opt_state=s.opt_state), \
                    aux["total_loss"]
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (l, aux), grads = grad_fn(s.params, batch, rng)
            updates, opt_state = tx.update(grads, s.opt_state, s.params)
            params = optax.apply_updates(s.params, updates)
            return TrainState(step=s.step + 1, params=params,
                              opt_state=opt_state), aux["total_loss"]
        return jax.lax.scan(body, state, None, length=K_INNER)

    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P("data"))
    fn = jax.jit(multi_step,
                 in_shardings=(repl, batched, repl),
                 out_shardings=(repl, repl),
                 donate_argnums=(0,))
    batch = dp.shard_batch(
        {k: np.asarray(v) for k, v in _ods_batch(cfg).items()}, mesh)
    key = jax.random.PRNGKey(1)

    mode = (name + "-fwd") if fwd_only else (name + "-full")
    t0 = time.time()
    state, ls = fn(state, batch, key)
    jax.block_until_ready(ls)
    print(f"[train/{mode}] compile+first {K_INNER} steps "
          f"{time.time() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(N_CALLS):
        state, ls = fn(state, batch, key)
    jax.block_until_ready(ls)
    ms = (time.perf_counter() - t0) / (N_CALLS * K_INNER) * 1000.0
    print(f"[train/{mode}] {ms:.1f} ms/step "
          f"(losses {np.asarray(ls)[:3]})", flush=True)


if __name__ == "__main__":
    main()
