#!/usr/bin/env python3
"""Train-step throughput measured the only way that is reliable through
the remote-TPU relay: K steps chained inside ONE jit via lax.scan, so a
single dispatch covers K full train steps and per-dispatch relay RTT /
host<->device chatter is amortized to zero.

Context: every python-loop measurement of the DP train step through the
axon relay is polluted and internally inconsistent —
  r4b  pixel 4166 ms/step          elpips 53479 ms/step
  r4c  pixel/hostsplit 1281 ms     elpips/hostsplit 182 ms  (elpips 7x
       FASTER than pixel: physically impossible — elpips is pixel + VGG
       towers + backward)
  r4d  pixel 3810 ms (constant key) elpips 97805 ms
tools/train_probe2.py pinned part of it (device-array key reuse stalls
the DP step ~29x vs fresh host-split keys) but even the "good" numbers
disagree run to run.  The scan form is immune: the step body is the
production body (in-graph fold_in off state.step, donation), compiled
once, and the device runs K steps back-to-back.

Run:  python tools/train_probe3.py [pixel] [elpips]
Reference budget: 140k steps (scripts/train/ods-wotemp-elpips-coord.sh).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

K_INNER = 10      # steps per dispatch
N_CALLS = 3       # timed dispatches


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/matry_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    losses = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        ["pixel", "elpips"]
    print("devices:", jax.devices(), flush=True)

    from matryodshka_tpu.cli.train import build_elpips_fn
    from matryodshka_tpu.config import MatryConfig
    from matryodshka_tpu.parallel import dp, mesh as mesh_lib
    from matryodshka_tpu.training import state as state_lib
    from matryodshka_tpu.training.state import TrainState
    from matryodshka_tpu.training.step import make_loss_fn
    from tools.r4_hw_session import _ods_batch

    for loss in losses:
        cfg = MatryConfig(height=320, width=640, num_psv_planes=32,
                          num_msi_planes=32, ngf=64, batch_size=1,
                          which_loss=loss, coord_net=True,
                          compute_dtype="bfloat16").validate()
        mesh = mesh_lib.make_mesh(data=1)
        state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
        tx = state_lib.build_optimizer(cfg)
        elpips_fn = build_elpips_fn(cfg) if loss == "elpips" else None
        loss_fn = make_loss_fn(cfg, model.apply, elpips_fn)

        fwd_only = "--fwd" in sys.argv

        def multi_step(state, batch, base_key):
            # Body identical to parallel/dp.py::train_step; scanned K
            # times so one dispatch = K production steps. With --fwd
            # the grad/update is skipped (loss-only scan) to split the
            # step into forward vs backward+update cost.
            def body(s, _):
                rng = jax.random.fold_in(base_key, s.step)
                if fwd_only:
                    l, aux = loss_fn(s.params, batch, rng)
                    return TrainState(step=s.step + 1, params=s.params,
                                      opt_state=s.opt_state), \
                        aux["total_loss"]
                grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
                (l, aux), grads = grad_fn(s.params, batch, rng)
                updates, opt_state = tx.update(grads, s.opt_state,
                                               s.params)
                params = optax.apply_updates(s.params, updates)
                return TrainState(step=s.step + 1, params=params,
                                  opt_state=opt_state), aux["total_loss"]
            return jax.lax.scan(body, state, None, length=K_INNER)

        if "--plain" in sys.argv:
            # No mesh shardings: gradsplit (train_probe6) measured the
            # same pixel loss at 140 ms/step under plain jit vs 1418
            # through the sharded wrapper on a data=1 mesh — this flag
            # A/Bs the full Adam step both ways.
            fn = jax.jit(multi_step, donate_argnums=(0,))
        else:
            repl = NamedSharding(mesh, P())
            batched = NamedSharding(mesh, P("data"))
            fn = jax.jit(multi_step,
                         in_shardings=(repl, batched, repl),
                         out_shardings=(repl, repl),
                         donate_argnums=(0,))
        batch = dp.shard_batch(
            {k: np.asarray(v) for k, v in _ods_batch(cfg).items()}, mesh)
        key = jax.random.PRNGKey(1)

        t0 = time.time()
        state, ls = fn(state, batch, key)
        jax.block_until_ready(ls)
        print(f"[scan-train] loss={loss}: compile+first {K_INNER} steps "
              f"{time.time() - t0:.0f}s", flush=True)

        t0 = time.perf_counter()
        for _ in range(N_CALLS):
            state, ls = fn(state, batch, key)
        jax.block_until_ready(ls)
        ms = (time.perf_counter() - t0) / (N_CALLS * K_INNER) * 1000.0
        hours_140k = ms / 1000.0 * 140_000 / 3600.0
        print(f"[scan-train] loss={loss}: {ms:.1f} ms/step "
              f"({1000.0 / ms:.2f} steps/s), 140k steps = "
              f"{hours_140k:.1f} h (losses {np.asarray(ls)[:3]})",
              flush=True)


if __name__ == "__main__":
    main()
