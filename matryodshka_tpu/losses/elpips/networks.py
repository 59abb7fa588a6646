"""Feature networks for (E-)LPIPS: VGG16 variants and SqueezeNet 1.1.

JAX port of the conv towers in elpips/elpips/networks.py:
  * vgg16_full_avg (:672-...): 13 convs, avg-pooling, 14 taps (the raw
    input plus every conv activation) — the E-LPIPS ensemble variant.
  * vgg16 (:469-...): classic LPIPS 5-tap variant with max pooling.
  * squeezenet1_1 (:73-) / squeezenet1_1_full_maxpool (:270-): fire
    modules; 7 and 13 taps respectively.

Weights are a dict {'<torch_idx>.weight': HWIO array, '<torch_idx>.bias':
[C]} matching the torchvision features indices the reference uses.
Optional activation dropout (keep=0.99) applies ONE shared mask per conv
input to every tensor in the tuple (networks.py:50-70).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# (torch_idx, in_ch, out_ch) of VGG16 features convs.
VGG16_CONVS = [
    (0, 3, 64), (2, 64, 64),
    (5, 64, 128), (7, 128, 128),
    (10, 128, 256), (12, 256, 256), (14, 256, 256),
    (17, 256, 512), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]
# Channel counts of the 14 full_avg taps (input + 13 convs).
VGG16_FULL_AVG_CHANNELS = [3] + [c for (_, _, c) in VGG16_CONVS]
# Classic LPIPS taps: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3.
VGG16_LPIPS_CHANNELS = [64, 128, 256, 512, 512]

# SqueezeNet 1.1 layout: (name, type, params)
SQUEEZE_FIRE = [
    # (torch_idx, in, squeeze, expand1x1, expand3x3)
    (3, 64, 16, 64, 64), (4, 128, 16, 64, 64),
    (6, 128, 32, 128, 128), (7, 256, 32, 128, 128),
    (9, 256, 48, 192, 192), (10, 384, 48, 192, 192),
    (11, 384, 64, 256, 256), (12, 512, 64, 256, 256),
]
SQUEEZE_LPIPS_CHANNELS = [64, 128, 256, 384, 384, 512, 512]
SQUEEZE_FULL_MAXPOOL_CHANNELS = [3, 64, 128, 128, 256, 256, 384, 384,
                                 512, 512]


def random_vgg_weights(key: Array, seed_note: str = "untrained"
                       ) -> Dict[str, np.ndarray]:
    """Deterministic random VGG16 weights (He init).

    The trained weights are not redistributable from this repo; this
    fallback keeps the full compute path runnable (NOT a calibrated
    perceptual metric). Use tools/import_elpips_weights.py to build a real
    weight file.
    """
    w = {}
    for idx, cin, cout in VGG16_CONVS:
        key, k1 = jax.random.split(key)
        std = float(np.sqrt(2.0 / (3 * 3 * cin)))
        w[f"{idx}.weight"] = np.asarray(
            jax.random.normal(k1, (3, 3, cin, cout)) * std, np.float32)
        w[f"{idx}.bias"] = np.zeros((cout,), np.float32)
    return w


def _conv_relu(x, weight, bias, dropout_mask=None):
    if dropout_mask is not None:
        x = tuple(t * dropout_mask for t in x) if isinstance(x, tuple) \
            else x * dropout_mask
    def one(t):
        y = jax.lax.conv_general_dilated(
            t, jnp.asarray(weight), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.relu(y + jnp.asarray(bias))
    if isinstance(x, tuple):
        return tuple(one(t) for t in x)
    return one(x)


def _pool(x, kind: str):
    def one(t):
        if kind == "avg":
            return jax.lax.reduce_window(
                t, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID") / 4.0
        return jax.lax.reduce_window(
            t, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
    if isinstance(x, tuple):
        return tuple(one(t) for t in x)
    return one(x)


def _shared_dropout_mask(key, shape, keep_prob):
    mask = (jax.random.uniform(key, shape) < keep_prob)
    return mask.astype(jnp.float32) / keep_prob


class VGG16Features:
    """VGG16 conv tower with selectable taps and pooling.

    Operates on TUPLES of images so the same dropout mask applies to all
    inputs (the ensemble compares several images under identical noise,
    elpips/elpips/networks.py:61-66).
    """

    def __init__(self, weights: Dict[str, np.ndarray],
                 variant: str = "full_avg",
                 use_dropout: bool = False, keep_prob: float = 0.99):
        self.w = weights
        self.variant = variant
        self.use_dropout = use_dropout
        self.keep_prob = keep_prob

    def __call__(self, xs: Tuple[Array, ...], key: Array | None = None
                 ) -> List[Tuple[Array, ...]]:
        """xs: tuple of [N, H, W, 3]; returns list of per-tap tuples."""
        pool = "avg" if self.variant == "full_avg" else "max"
        taps: List[Tuple[Array, ...]] = []
        x = xs
        if self.variant == "full_avg":
            taps.append(x)

        conv_i = 0
        # VGG16 blocks: (convs per block) = 2,2,3,3,3 with pool between.
        for block, n_convs in enumerate((2, 2, 3, 3, 3)):
            if block > 0:
                x = _pool(x, pool)
            for k in range(n_convs):
                idx, cin, cout = VGG16_CONVS[conv_i]
                conv_i += 1
                mask = None
                if self.use_dropout and key is not None:
                    key, sub = jax.random.split(key)
                    mask = _shared_dropout_mask(
                        sub, x[0].shape, self.keep_prob)
                x = _conv_relu(x, self.w[f"{idx}.weight"],
                               self.w[f"{idx}.bias"], mask)
                if self.variant == "full_avg":
                    taps.append(x)
                elif k == n_convs - 1:
                    taps.append(x)   # relu{b}_{last}
        return taps

    @property
    def tap_channels(self) -> List[int]:
        return (VGG16_FULL_AVG_CHANNELS if self.variant == "full_avg"
                else VGG16_LPIPS_CHANNELS)


def random_squeeze_weights(key: Array) -> Dict[str, np.ndarray]:
    w = {}
    def add(name, shape, k):
        fan_in = int(np.prod(shape[:-1]))
        std = float(np.sqrt(2.0 / max(fan_in, 1)))
        w[name + ".weight"] = np.asarray(
            jax.random.normal(k, shape) * std, np.float32)
        w[name + ".bias"] = np.zeros((shape[-1],), np.float32)
    key, k = jax.random.split(key)
    add("0", (3, 3, 3, 64), k)
    for idx, cin, s, e1, e3 in SQUEEZE_FIRE:
        for suffix, shape in ((f"{idx}.squeeze", (1, 1, cin, s)),
                              (f"{idx}.expand1x1", (1, 1, s, e1)),
                              (f"{idx}.expand3x3", (3, 3, s, e3))):
            key, k = jax.random.split(key)
            add(suffix, shape, k)
    return w


class SqueezeNetFeatures:
    """SqueezeNet 1.1 tower (fire modules), LPIPS taps.

    variant 'lpips' -> 7 taps (after first conv and each fire pair);
    variant 'full_maxpool' -> 13 taps (every activation).
    """

    def __init__(self, weights: Dict[str, np.ndarray],
                 variant: str = "lpips", use_dropout: bool = False,
                 keep_prob: float = 0.99):
        self.w = weights
        self.variant = variant
        self.use_dropout = use_dropout
        self.keep_prob = keep_prob

    def _fire(self, x, idx, key):
        m_sq = m_ex = None
        if self.use_dropout and key is not None:
            k1, k2 = jax.random.split(key)
            m_sq = _shared_dropout_mask(k1, x[0].shape, self.keep_prob)
        s = _conv_relu(x, self.w[f"{idx}.squeeze.weight"],
                       self.w[f"{idx}.squeeze.bias"], m_sq)
        if self.use_dropout and key is not None:
            m_ex = _shared_dropout_mask(k2, s[0].shape, self.keep_prob)
        e1 = _conv_relu(s, self.w[f"{idx}.expand1x1.weight"],
                        self.w[f"{idx}.expand1x1.bias"], m_ex)
        e3 = _conv_relu(s, self.w[f"{idx}.expand3x3.weight"],
                        self.w[f"{idx}.expand3x3.bias"], m_ex)
        if isinstance(x, tuple):
            return tuple(jnp.concatenate([a, b], -1)
                         for a, b in zip(e1, e3))
        return jnp.concatenate([e1, e3], -1)

    def __call__(self, xs: Tuple[Array, ...], key: Array | None = None
                 ) -> List[Tuple[Array, ...]]:
        """Taps (networks.py:250-264 / :456-...):
        lpips: conv1, fire4, fire7, fire9, fire10, fire11, fire12 (7);
        full_maxpool: input, conv1, fire3, fire4, fire6, fire7, fire9,
        fire10, fire11, fire12 (10)."""
        full = self.variant == "full_maxpool"
        taps: List[Tuple[Array, ...]] = []
        if full:
            taps.append(xs)

        def maybe_key():
            nonlocal key
            if key is None:
                return None
            key, sub = jax.random.split(key)
            return sub

        mask = None
        if self.use_dropout and key is not None:
            mask = _shared_dropout_mask(maybe_key(), xs[0].shape,
                                        self.keep_prob)

        def conv1(t):
            y = jax.lax.conv_general_dilated(
                t, jnp.asarray(self.w["0.weight"]), (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jax.nn.relu(y + jnp.asarray(self.w["0.bias"]))

        x = tuple(conv1(t if mask is None else t * mask) for t in xs)
        taps.append(x)

        # (pool?, fire indices, tap-after-each?) per slice group
        for pool_first, fire_idxs in ((True, (3, 4)), (True, (6, 7)),
                                      (True, (9,)), (False, (10,)),
                                      (False, (11,)), (False, (12,))):
            if pool_first:
                x = _pool(x, "max")
            for j, idx in enumerate(fire_idxs):
                x = self._fire(x, idx, maybe_key())
                if full:
                    taps.append(x)
            if not full:
                taps.append(x)
        return taps

    @property
    def tap_channels(self) -> List[int]:
        return (SQUEEZE_FULL_MAXPOOL_CHANNELS
                if self.variant == "full_maxpool"
                else SQUEEZE_LPIPS_CHANNELS)
