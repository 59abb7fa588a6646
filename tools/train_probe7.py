#!/usr/bin/env python3
"""Bisect the 10x gap between probe6/adam (141 ms/step: plain jit, full
Adam, production pixel loss) and probe3/plain (1410 ms/step: the
production multi_step body under plain jit).

The two bodies differ in exactly three ways; each variant here adds ONE
probe3 feature onto the fast probe6/adam base:

  base      probe6/adam exactly (fixed rng, has_aux=False, jnp batch)
  foldin    + rng = fold_in(base_key, s.step) per scanned step
  hasaux    + value_and_grad(loss_fn, has_aux=True) (drop aux after)
  shardin   + batch placed via dp.shard_batch on a data=1 mesh
  metrics   + the metrics dict w/ grad_norm (dp.py one_step exactly)

Run: python tools/train_probe7.py [base foldin hasaux shardin metrics]
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

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/matry_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    which = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        ["base", "foldin", "hasaux", "shardin", "metrics"]
    print("devices:", jax.devices(), flush=True)

    from matryodshka_tpu.config import MatryConfig
    from matryodshka_tpu.parallel import dp, mesh as mesh_lib
    from matryodshka_tpu.training import state as state_lib
    from matryodshka_tpu.training.state import TrainState
    from matryodshka_tpu.training.step import make_loss_fn
    from tools.r4_hw_session import _ods_batch

    cfg = MatryConfig(height=320, width=640, num_psv_planes=32,
                      num_msi_planes=32, ngf=64, batch_size=1,
                      which_loss="pixel", coord_net=True,
                      compute_dtype="bfloat16").validate()
    state0, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    tx = state_lib.build_optimizer(cfg)
    loss_fn = make_loss_fn(cfg, model.apply)
    batch_jnp = {k: jnp.asarray(v) for k, v in _ods_batch(cfg).items()}
    key = jax.random.PRNGKey(1)

    mesh = mesh_lib.make_mesh(data=1)
    batch_sharded = dp.shard_batch(
        {k: np.asarray(v) for k, v in _ods_batch(cfg).items()}, mesh)

    def make_multi(foldin=False, hasaux=False, metrics=False):
        def multi(s0, batch, base_key):
            def body(s, _):
                rng = (jax.random.fold_in(base_key, s.step)
                       if foldin else base_key)
                if hasaux or metrics:
                    (l, aux), g = jax.value_and_grad(
                        loss_fn, has_aux=True)(s.params, batch, rng)
                else:
                    l, g = jax.value_and_grad(
                        lambda p: loss_fn(p, batch, rng)[0])(s.params)
                updates, opt = tx.update(g, s.opt_state, s.params)
                p = optax.apply_updates(s.params, updates)
                ns = TrainState(step=s.step + 1, params=p, opt_state=opt)
                if metrics:
                    m = {k: v for k, v in aux.items()
                         if isinstance(v, jax.Array) and v.ndim == 0}
                    m["grad_norm"] = optax.global_norm(g)
                    return ns, m
                return ns, l
            return jax.lax.scan(body, s0, None, length=K_INNER)
        return multi

    variants = {
        "base": (make_multi(), batch_jnp),
        "foldin": (make_multi(foldin=True), batch_jnp),
        "hasaux": (make_multi(hasaux=True), batch_jnp),
        "shardin": (make_multi(), batch_sharded),
        "metrics": (make_multi(metrics=True), batch_jnp),
    }

    for name in which:
        multi, batch = variants[name]
        fn = jax.jit(multi, donate_argnums=(0,))
        s0, _ = state_lib.init_state(cfg, jax.random.PRNGKey(0))
        t0 = time.time()
        s0, ls = fn(s0, batch, key)
        jax.block_until_ready(jax.tree.leaves(ls)[0])
        print(f"[probe7/{name}] compile+first {K_INNER}: "
              f"{time.time() - t0:.0f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(N_CALLS):
            s0, ls = fn(s0, batch, key)
        jax.block_until_ready(jax.tree.leaves(ls)[0])
        ms = (time.perf_counter() - t0) / (N_CALLS * K_INNER) * 1000.0
        print(f"[probe7/{name}] {ms:.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
