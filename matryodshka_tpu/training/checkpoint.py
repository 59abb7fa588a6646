"""Checkpointing: orbax save/restore of {params, opt_state, step}.

Covers the reference's tf.train.Saver surface (msi.py:983-1002,
max_to_keep=10, save every save_latest_freq, resume from latest).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from matryodshka_tpu.training.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 10):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, state: TrainState) -> None:
        step = int(state.step)
        self.mngr.save(step, args=ocp.args.StandardSave(state))
        self.mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def restore(self, state: TrainState,
                step: Optional[int] = None) -> TrainState:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self.mngr.restore(step, args=ocp.args.StandardRestore(state))

    def restore_params(self, step: Optional[int] = None):
        """Restore only the parameter pytree (test/export paths).

        Returns (params, step). Arrays come back as host numpy, which
        makes checkpoints portable across backends (a TPU-saved
        checkpoint restores on CPU and vice versa — checkpoint sharding
        metadata pins devices otherwise).
        """
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        path = os.path.join(self.directory, str(step), "default")
        ckptr = ocp.PyTreeCheckpointer()
        meta = ckptr.metadata(path).item_metadata
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
        restored = ckptr.restore(
            path, args=ocp.args.PyTreeRestore(restore_args=restore_args))
        if isinstance(restored, dict):
            return restored["params"], int(np.asarray(restored["step"]))
        return restored.params, int(np.asarray(restored.step))
