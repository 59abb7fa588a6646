"""Data-parallel training via GSPMD sharding annotations.

Instead of translating a NCCL allreduce loop, the train step is jitted with
NamedShardings: batch arrays sharded over the 'data' mesh axis, parameters
and optimizer state replicated. XLA GSPMD partitions the forward/backward
and inserts the gradient all-reduce over ICI automatically.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from matryodshka_tpu.config import MatryConfig
from matryodshka_tpu.training.state import TrainState
from matryodshka_tpu.training.step import make_loss_fn


def make_dp_train_step(cfg: MatryConfig, model_apply: Callable, tx,
                       mesh: Mesh,
                       elpips_fn: Optional[Callable] = None,
                       donate: bool = True) -> Callable:
    """Jitted data-parallel train_step(state, batch, rng).

    The global batch (cfg.batch_size) must be divisible by the 'data' axis
    size; each device computes its shard's loss and GSPMD reduces grads.
    `donate` aliases the incoming TrainState buffers into the outputs
    (callers must not reuse the old state), halving param+opt HBM traffic
    exactly like the single-device step (training/step.py).
    """
    loss_fn = make_loss_fn(cfg, model_apply, elpips_fn)
    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P("data"))

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        # In-graph per-step key derivation (see training/step.py): the
        # caller passes one constant base key for the whole run.
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, aux), grads = grad_fn(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {k: v for k, v in aux.items()
                   if isinstance(v, jax.Array) and v.ndim == 0}
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), metrics

    return jax.jit(
        train_step,
        in_shardings=(repl, batched, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_dp_train_multi_step(cfg: MatryConfig, model_apply: Callable, tx,
                             mesh: Mesh,
                             elpips_fn: Optional[Callable] = None,
                             steps_per_call: int = 1,
                             donate: bool = True) -> Callable:
    """Jitted multi_step(state, stacked_batch, rng): `steps_per_call`
    production train steps chained on-device via lax.scan in ONE
    dispatch.

    Each leaf of `stacked_batch` carries a leading [steps_per_call]
    axis (one batch per inner step; stack with `stack_batches`).
    Per-step RNG decorrelation is in-graph off state.step, identical to
    `make_dp_train_step`, so K chained steps match K sequential
    dispatches (same per-step keys and losses; params agree to f32 ulps
    — the scanned body is a different XLA program). Metrics come back
    stacked [steps_per_call] per scalar.

    Why: per-dispatch overhead (and, through a remote-TPU relay,
    multi-second host<->device pathologies — tools/train_probe2.py)
    is amortized over K steps; the device runs steps back-to-back.
    """
    loss_fn = make_loss_fn(cfg, model_apply, elpips_fn)
    repl = NamedSharding(mesh, P())
    stacked = NamedSharding(mesh, P(None, "data"))

    def one_step(state: TrainState, batch: Dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, aux), grads = grad_fn(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {k: v for k, v in aux.items()
                   if isinstance(v, jax.Array) and v.ndim == 0}
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), metrics

    def multi_step(state: TrainState, batches: Dict, rng: jax.Array):
        def body(s, b):
            return one_step(s, b, rng)
        return jax.lax.scan(body, state, batches)

    return jax.jit(
        multi_step,
        in_shardings=(repl, stacked, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def stack_batches(batches, mesh: Mesh) -> Dict:
    """Stack K host batch dicts along a new leading axis and place them
    sharded [None, 'data', ...] for `make_dp_train_multi_step`."""
    import numpy as np
    sh = NamedSharding(mesh, P(None, "data"))
    keys = batches[0].keys()
    return {k: jax.device_put(
        np.stack([np.asarray(b[k]) for b in batches]), sh)
        for k in keys}


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Place a host batch dict with axis 0 sharded over 'data'."""
    sh = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(v, sh) for k, v in batch.items()
            if not isinstance(v, (list, str))}
