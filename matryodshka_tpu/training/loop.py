"""The training loop: step pacing, summaries, checkpoints, profiling.

Covers MSI.train (msi.py:971-1022): per-step timing logged every
summary_freq steps, checkpoint every save_latest_freq (max_to_keep=10),
resume from latest with continue_train. Observability is a metrics JSONL
(scalars) + periodic PNG dumps of the current render and a few MSI layers
(the reference's TensorBoard image summaries, msi.py:735-774), plus an
optional jax.profiler trace window.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np

from matryodshka_tpu.config import MatryConfig
from matryodshka_tpu.data.images import write_image
from matryodshka_tpu.training.checkpoint import CheckpointManager
from matryodshka_tpu.training.state import TrainState, param_count


class SummaryWriter:
    """Scalars to JSONL + images to PNG under a log dir."""

    def __init__(self, log_dir: str, static_fields: Optional[Dict] = None):
        self.log_dir = log_dir
        # Stamped into every scalar record — e.g.
        # {"elpips_calibrated": false} when the perceptual loss runs on
        # random conv features, so no metrics.jsonl can carry a silent
        # random-feature score (the reference always trains/evals with
        # real pretrained features).
        self.static_fields = dict(static_fields or {})
        os.makedirs(log_dir, exist_ok=True)
        self._fh = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def scalars(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": step}
        rec.update(self.static_fields)
        rec.update({k: float(v) for k, v in metrics.items()})
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def image(self, step: int, name: str, img: np.ndarray) -> None:
        write_image(os.path.join(self.log_dir,
                                 f"{name}_{step:08d}.png"), img)

    def close(self):
        self._fh.close()


def train(cfg: MatryConfig,
          state: TrainState,
          train_step: Callable,
          batches: Iterator[Dict],
          image_summary_fn: Optional[Callable] = None,
          profile_steps: Optional[tuple] = None,
          steps_per_call: int = 1,
          static_log_fields: Optional[Dict] = None) -> TrainState:
    """Run the training loop until cfg.max_steps.

    Args:
      train_step: jitted (state, batch, rng) -> (state, metrics); with
        steps_per_call > 1, a multi-step fn from
        `parallel.dp.make_dp_train_multi_step` taking a K-stacked batch
        and returning [K]-stacked metrics.
      batches: iterator of device-ready batch dicts (host batch dicts
        when steps_per_call > 1 — the stacked transfer happens here).
      image_summary_fn: optional (state, batch) -> {name: HxWx3} images,
        called every summary_freq steps.
      profile_steps: optional (start, stop) step numbers for a
        jax.profiler trace written under the checkpoint dir.
      steps_per_call: chain this many train steps per dispatch via the
        on-device scan form (amortizes per-dispatch overhead; matches
        sequential dispatches to f32 ulps since per-step RNG is folded
        in-graph off state.step).
    """
    ckpt_dir = os.path.join(cfg.checkpoint_dir, cfg.experiment_name)
    manager = CheckpointManager(ckpt_dir, max_to_keep=10)
    writer = SummaryWriter(os.path.join(ckpt_dir, "logs"),
                           static_fields=static_log_fields)

    if cfg.continue_train:
        latest = manager.latest_step()
        if latest is not None:
            state = manager.restore(state, latest)
            print(f"[train] resumed from step {latest}")
        else:
            print("[train] no checkpoint to resume from; starting fresh")

    print(f"[train] parameter count: {param_count(state.params):,}")
    rng = jax.random.PRNGKey(cfg.random_seed)

    if steps_per_call > 1:
        if profile_steps is not None:
            print("[train] profile_steps is not supported with "
                  "steps_per_call > 1; ignoring")
        state = _train_multi(cfg, state, train_step, batches, writer,
                             manager, image_summary_fn, rng,
                             steps_per_call)
        manager.save(state)
        writer.close()
        return state

    start_step = int(state.step)
    t0 = time.time()
    for step_i, batch in enumerate(batches, start=start_step + 1):
        if step_i > cfg.max_steps:
            break
        if profile_steps and step_i == profile_steps[0]:
            jax.profiler.start_trace(os.path.join(ckpt_dir, "profile"))
        arrays = {k: v for k, v in batch.items()
                  if not isinstance(v, (list, str))}
        # One CONSTANT base key for the whole run: the per-step
        # decorrelation is folded in-graph off state.step (step.py /
        # dp.py), so the steady-state loop body is a single cached
        # dispatch. Host-side fold_in(rng, step_i) here was measured at
        # 5.7 s/step through the remote-TPU relay (a fresh tiny
        # compile+dispatch per step; tools/train_probe2.py).
        state, metrics = train_step(state, arrays, rng)
        if profile_steps and step_i == profile_steps[1]:
            jax.tree.map(lambda x: x.block_until_ready(), metrics)
            jax.profiler.stop_trace()

        if step_i % cfg.summary_freq == 0:
            metrics = jax.device_get(metrics)
            dt = (time.time() - t0) / cfg.summary_freq
            t0 = time.time()
            writer.scalars(step_i, {**metrics, "sec_per_step": dt})
            print(f"[step {step_i:8d}] loss={metrics['total_loss']:.5f} "
                  f"{dt:.4f}s/it")
            if image_summary_fn is not None:
                for name, img in image_summary_fn(state, arrays).items():
                    writer.image(step_i, name, np.asarray(img))

        if step_i % cfg.save_latest_freq == 0:
            manager.save(state)
            print(f"[train] saved checkpoint @ {step_i}")

    manager.save(state)
    writer.close()
    return state


def _train_multi(cfg: MatryConfig, state: TrainState, train_step,
                 batches: Iterator[Dict], writer: SummaryWriter,
                 manager: CheckpointManager, image_summary_fn,
                 rng, k: int) -> TrainState:
    """steps_per_call > 1 loop body: one dispatch per K-step window.

    Summaries fire for every interior step hitting summary_freq (using
    that step's row of the [K]-stacked metrics); checkpoints fire at
    window ends whose window crossed save_latest_freq (so the saved
    step is the window-end step). The iterator must yield at least K
    more batches per window; training stops at the last full window
    <= max_steps.
    """
    it = iter(batches)
    step_i = int(state.step)
    last_logged = step_i
    t0 = time.time()
    while step_i + k <= cfg.max_steps:
        window = []
        for b in it:
            window.append({kk: v for kk, v in b.items()
                           if not isinstance(v, (list, str))})
            if len(window) == k:
                break
        if len(window) < k:
            print(f"[train] data iterator exhausted mid-window @ "
                  f"{step_i}; stopping")
            break
        stacked = {kk: np.stack([np.asarray(b[kk]) for b in window])
                   for kk in window[0]}
        state, metrics = train_step(state, stacked, rng)
        w_end = step_i + k

        summary_steps = [s for s in range(step_i + 1, w_end + 1)
                         if s % cfg.summary_freq == 0]
        if summary_steps:
            m_host = jax.device_get(metrics)
            dt = (time.time() - t0) / (w_end - last_logged)
            t0, last_logged = time.time(), w_end
            for s in summary_steps:
                row = {kk: float(np.asarray(v)[s - step_i - 1])
                       for kk, v in m_host.items()}
                writer.scalars(s, {**row, "sec_per_step": dt})
                print(f"[step {s:8d}] loss={row['total_loss']:.5f} "
                      f"{dt:.4f}s/it")
            if image_summary_fn is not None:
                for name, img in image_summary_fn(
                        state, window[-1]).items():
                    writer.image(w_end, name, np.asarray(img))

        if any(s % cfg.save_latest_freq == 0
               for s in range(step_i + 1, w_end + 1)):
            manager.save(state)
            print(f"[train] saved checkpoint @ {w_end}")
        step_i = w_end
    return state
