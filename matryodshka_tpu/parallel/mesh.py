"""Device mesh construction.

The reference is single-process single-GPU (SURVEY.md section 2.6); here
scale-out is a jax.sharding.Mesh. Axes:
  'data'  — batch (data parallel training)
  'shell' — MSI plane axis (sharded high-res rendering / inference)
A 1-D mesh uses whichever axis the caller asks for; a 2-D mesh composes
both (data-parallel training of shell-sharded renders).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, shell: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = data * shell
    if need > len(devices):
        raise ValueError(f"mesh {data}x{shell} needs {need} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(data, shell)
    return Mesh(arr, ("data", "shell"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
