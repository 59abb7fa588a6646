"""LPIPS core: feature differences weighted by learned 1x1 linear layers.

JAX port of elpips/elpips/pnetlin.py:29-181:
  * inputs standardized by the LPIPS shift/scale constants
  * per-tap unit-normalization along channels
  * squared differences vs the reference image
  * spatial mean, then the learned per-channel linear weight, summed over
    taps.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


def normalize_tensor(feat: Array, eps: float = 1e-10) -> Array:
    norm = jnp.sqrt(jnp.sum(jnp.square(feat), axis=3, keepdims=True))
    return feat / (norm + eps)


def random_lin_weights(key: Array, channels: List[int]
                       ) -> Dict[str, np.ndarray]:
    """Uniform positive weights fallback (uncalibrated)."""
    out = {}
    for i, c in enumerate(channels):
        out[f"lin{i}.model.1.weight"] = np.full((1, 1, c, 1), 1.0 / c,
                                                np.float32)
    return out


class PNetLin:
    def __init__(self, net, lin_weights: Dict[str, np.ndarray]):
        self.net = net
        self.lin = lin_weights

    def forward(self, in0: Tuple[Array, ...], in1: Array,
                key: Optional[Array] = None) -> Tuple[Array, ...]:
        """in0: tuple of [N, H, W, 3] candidates; in1: [N, H, W, 3]
        reference. Returns a tuple of [N] distances."""
        shift = jnp.asarray(SHIFT).reshape(1, 1, 1, 3)
        scale = jnp.asarray(SCALE).reshape(1, 1, 1, 3)
        in0_sc = tuple((x - shift) / scale for x in in0)
        in1_sc = (in1 - shift) / scale

        taps = self.net(in0_sc + (in1_sc,), key)
        n_in0 = len(in0)

        vals = [jnp.zeros((in1.shape[0],), jnp.float32)
                for _ in range(n_in0)]
        for i, tap in enumerate(taps):
            normed = tuple(normalize_tensor(t) for t in tap)
            w = jnp.asarray(self.lin[f"lin{i}.model.1.weight"])
            w = w.reshape(-1)  # [C]
            for j in range(n_in0):
                diff = jnp.square(normed[j] - normed[-1])
                mean = jnp.mean(diff, axis=(1, 2))          # [N, C]
                vals[j] = vals[j] + jnp.sum(mean * w, axis=-1)
        return tuple(vals)
