"""MatryODShka-TPU: a TPU-native JAX/XLA/Pallas framework for real-time 6DoF
ODS-video view synthesis with Multi-Sphere Images (MSI).

A from-scratch rebuild of the capabilities of brownvc/matryodshka (ECCV 2020),
redesigned TPU-first:

  * geometry kernels are pure jnp functions vectorized over a [planes] axis
    (vs. the reference's per-plane Python graph loops, geometry/projector.py:143-166)
  * bilinear resampling with horizontal wrap is a single fused gather
    (vs. tf.contrib.resampler + hand-rolled gather_nd, geometry/sampling.py)
  * one U-Net definition covers train/inference/export
    (vs. slim + hand-rolled pad/slice duality, matryodshka/nets.py:297-618)
  * configuration is one typed dataclass threaded explicitly
    (vs. the process-wide tf.app.flags singleton)
  * scale-out is jax.sharding over a device Mesh (data parallel training,
    shell-sharded high-resolution rendering) instead of single-GPU sessions.
"""

__version__ = "0.1.0"

from matryodshka_tpu.config import MatryConfig  # noqa: F401
