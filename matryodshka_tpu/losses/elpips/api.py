"""Public (E-)LPIPS API: configs + Metric.

Mirrors elpips/elpips/__init__.py:7-76 and elpips.py:243-331 with
explicit JAX PRNG keys. Configs:
  * elpips_vgg(batch_size, n): full ensemble + net dropout p=0.99
  * lpips_vgg(batch_size): plain LPIPS, no transforms
  * elpips_squeeze_maxpool(batch_size, n)
  * lpips_squeeze(batch_size)

Weights: `weight_path` points to an .npz containing 'net/<key>' conv
weights (HWIO) and 'lin/lin{i}.model.1.weight' arrays — build one with
tools/import_elpips_weights.py from the reference .npy files plus a
torchvision VGG16 checkpoint. Without a weight file, deterministic
random weights keep the computation runnable but the metric is NOT the
calibrated perceptual distance (loudly warned).

The dynamic scale level (no dynamic shapes under jit) is a lax.switch
whose branches each evaluate the network at one static scale.
"""

from __future__ import annotations

import dataclasses
import sys
import warnings
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from matryodshka_tpu.losses.elpips import networks, pnetlin, transforms

Array = jax.Array


@dataclasses.dataclass
class Config:
    metric: str = "vgg_ensemble"
    enable_dropout: bool = True
    dropout_keep_prob: float = 0.99
    enable_offset: bool = True
    offset_max: int = 7
    enable_flip: bool = True
    enable_swap: bool = True
    enable_color_permutation: bool = True
    enable_color_multiplication: bool = True
    color_multiplication_mode: str = "color"
    enable_scale: bool = True
    num_scales: int = 8
    batch_size: int = 1
    average_over: int = 1

    @property
    def scale_probabilities(self):
        return tuple(1.0 / float(i) ** 2
                     for i in range(1, self.num_scales + 1))


def elpips_vgg(batch_size: int = 1, n: int = 1) -> Config:
    return Config(metric="vgg_ensemble", batch_size=batch_size,
                  average_over=n)


def lpips_vgg(batch_size: int = 1) -> Config:
    return Config(metric="vgg", enable_dropout=False, enable_offset=False,
                  enable_flip=False, enable_swap=False,
                  enable_color_permutation=False,
                  enable_color_multiplication=False, enable_scale=False,
                  batch_size=batch_size)


def elpips_squeeze_maxpool(batch_size: int = 1, n: int = 1) -> Config:
    return Config(metric="squeeze_ensemble_maxpool", batch_size=batch_size,
                  average_over=n)


def lpips_squeeze(batch_size: int = 1) -> Config:
    cfg = lpips_vgg(batch_size)
    cfg.metric = "squeeze"
    return cfg


def get_config(name: str, batch_size: int = 1, n: int = 1) -> Config:
    return {"elpips_vgg": lambda: elpips_vgg(batch_size, n),
            "lpips_vgg": lambda: lpips_vgg(batch_size),
            "elpips_squeeze_maxpool":
                lambda: elpips_squeeze_maxpool(batch_size, n),
            "lpips_squeeze": lambda: lpips_squeeze(batch_size)}[name]()


#: metric name -> packaged calibrated LPIPS linear-weight file (vendored
#: from the elpips distribution's .npy blobs; loaded at the reference's
#: elpips/elpips/pnetlin.py:58-60).
_PACKAGED_LIN = {
    "vgg_ensemble": "vgg_full_avg_lin.npz",
    "vgg": "vgg_maxpool_lin.npz",
    "squeeze_ensemble_maxpool": "squeeze_full_maxpool_lin.npz",
    "squeeze": "squeeze_lin.npz",
}


def packaged_lin_weights(metric: str):
    """Calibrated LPIPS linear weights shipped with this package."""
    import os
    path = os.path.join(os.path.dirname(__file__), "weights",
                        _PACKAGED_LIN[metric])
    blob = np.load(path)
    return {k: blob[k] for k in blob.files}


def load_weights(weight_path: Optional[str], metric: str):
    """Returns (net_weights, lin_weights, calibrated).

    Resolution order:
      * explicit ``weight_path`` .npz: 'net/...' conv weights (HWIO) +
        'lin/...' linear weights (build with
        tools/import_elpips_weights.py) — ``calibrated`` is True;
      * otherwise: packaged CALIBRATED linear weights + deterministic
        random conv features (runnable, loudly warned — the VGG/Squeeze
        conv blobs are not redistributable inside this repo) —
        ``calibrated`` is False, and every consumer must surface that
        (eval JSON, training metrics) so random-feature scores can
        never be silently compared against real LPIPS numbers.
    """
    vgg = metric in ("vgg", "vgg_ensemble")
    if weight_path is not None:
        blob = np.load(weight_path)
        net = {k[4:]: blob[k] for k in blob.files if k.startswith("net/")}
        lin = {k[4:]: blob[k] for k in blob.files if k.startswith("lin/")}
        if not lin:
            lin = packaged_lin_weights(metric)
        return net, lin, True
    warnings.warn(
        "elpips: no weight_path given — using packaged calibrated linear "
        "weights but DETERMINISTIC RANDOM conv features; the metric is "
        "runnable but not the calibrated perceptual distance. Build full "
        "weights with tools/import_elpips_weights.py.")
    key = jax.random.PRNGKey(0)
    net = (networks.random_vgg_weights(key) if vgg
           else networks.random_squeeze_weights(key))
    return net, packaged_lin_weights(metric), False


class Metric:
    """Perceptual distance metric (elpips.py:243-331).

    forward(image, reference, key) evaluates E[d(T(image), T(reference))]
    over `average_over` random transform draws; a tuple `image` evaluates
    several candidates under IDENTICAL transforms/dropout.
    """

    def __init__(self, config: Config,
                 weight_path: Optional[str] = None):
        self.config = config
        net_w, lin_w, self.calibrated = load_weights(weight_path,
                                                     config.metric)
        if config.metric == "vgg_ensemble":
            net = networks.VGG16Features(
                net_w, "full_avg", use_dropout=config.enable_dropout,
                keep_prob=config.dropout_keep_prob)
        elif config.metric == "vgg":
            net = networks.VGG16Features(
                net_w, "lpips", use_dropout=config.enable_dropout,
                keep_prob=config.dropout_keep_prob)
        elif config.metric == "squeeze_ensemble_maxpool":
            net = networks.SqueezeNetFeatures(
                net_w, "full_maxpool", use_dropout=config.enable_dropout,
                keep_prob=config.dropout_keep_prob)
        elif config.metric == "squeeze":
            net = networks.SqueezeNetFeatures(
                net_w, "lpips", use_dropout=config.enable_dropout,
                keep_prob=config.dropout_keep_prob)
        else:
            raise ValueError(config.metric)
        self.network = pnetlin.PNetLin(net, lin_w)

    def _one_draw(self, images: Tuple[Array, ...], reference: Array,
                  key: Array,
                  static_scale_swap: Optional[tuple] = None
                  ) -> Tuple[Array, ...]:
        cfg = self.config
        k_ens, k_drop = jax.random.split(key)
        # batch size from the INPUT shape, not the config: under
        # data-parallel shard_map (parallel/dp.py) each device evaluates
        # its local batch shard, which may be smaller than the global
        # config.batch_size.
        params = transforms.sample_ensemble(
            k_ens, reference.shape[0], cfg.offset_max,
            cfg.scale_probabilities,
            static_scale=(static_scale_swap[0]
                          if static_scale_swap is not None else None))

        def eval_branch(scale: int, swap: bool):
            def fn(_):
                xs = tuple(transforms.apply_ensemble(
                    X, params, scale, cfg.offset_max,
                    cfg.enable_offset, cfg.enable_scale,
                    swap=swap and cfg.enable_swap)
                    for X in images + (reference,))
                xs = tuple(2.0 * x - 1.0 for x in xs)
                losses = self.network.forward(
                    xs[:-1], xs[-1],
                    k_drop if cfg.enable_dropout else None)
                return jnp.stack(losses)
            return fn

        if static_scale_swap is not None:
            # HOST-drawn (scale, swap): evaluate the single matching
            # branch with no lax.switch. Measured motivation (STATUS
            # round 4): the grad of the 16-branch switch costs ~16.7
            # s/step in the production train graph on TPU, vs ~7 ms
            # for the metric in isolation; host-sampling the level per
            # dispatch (same 1/i^2 categorical, see
            # sample_scale_swap_host) keeps the distribution while
            # keeping the grad path single-branch.
            s, sw = static_scale_swap
            out = eval_branch(int(s), bool(sw))(0)
        elif cfg.enable_scale:
            # One static branch per (scale, swap): transposes and
            # downscales change shapes, which jit branches must pin.
            branches = []
            for s in range(1, cfg.num_scales + 1):
                for sw in (False, True):
                    branches.append(eval_branch(s, sw))
            index = (params.scale_level - 1) * 2 + params.swap_xy
            out = jax.lax.switch(index, branches, 0)
        else:
            if (cfg.enable_flip or cfg.enable_swap
                    or cfg.enable_color_permutation
                    or cfg.enable_color_multiplication
                    or cfg.enable_offset):
                if cfg.enable_swap:
                    out = jax.lax.switch(
                        params.swap_xy,
                        [eval_branch(1, False), eval_branch(1, True)], 0)
                else:
                    out = eval_branch(1, False)(0)
            else:
                xs = tuple(2.0 * x - 1.0
                           for x in images + (reference,))
                losses = self.network.forward(
                    xs[:-1], xs[-1],
                    k_drop if cfg.enable_dropout else None)
                out = jnp.stack(losses)
        return out

    def forward(self, image, reference: Array, key: Array,
                static_scale_swap: Optional[tuple] = None):
        """image: [N,H,W,3] or tuple thereof; reference: [N,H,W,3].
        Returns [N] distances (or a tuple of them).

        static_scale_swap: optional HOST-drawn (scale:int, swap:bool)
        replacing the in-graph (scale, swap) draw — the single matching
        branch is traced instead of a lax.switch over every level (one
        jit cache entry per combination; see sample_scale_swap_host).
        All other ensemble randomness stays in-graph keyed by `key`."""
        if isinstance(image, list):
            raise TypeError("image must be an array or tuple of arrays")
        images = image if isinstance(image, tuple) else (image,)

        total = jnp.zeros((len(images), reference.shape[0]),
                          jnp.float32)
        for i in range(self.config.average_over):
            total = total + self._one_draw(
                images, reference, jax.random.fold_in(key, i),
                static_scale_swap=static_scale_swap)
        total = total / self.config.average_over
        if isinstance(image, tuple):
            return tuple(total[i] for i in range(len(images)))
        return total[0]


def sample_scale_swap_host(rng: "np.random.RandomState",
                           config: Config) -> tuple:
    """Draw (scale, swap) on the HOST with the same distribution as the
    in-graph draw: scale ~ categorical(scale_probabilities) (the 1/i^2
    prior), swap ~ Bernoulli(0.5). Feed the result to
    Metric.forward(static_scale_swap=...); the caller keeps one
    compiled function per combination (at most 2*num_scales)."""
    if not config.enable_scale:
        scale = 1
    else:
        p = np.asarray(config.scale_probabilities, dtype=np.float64)
        scale = 1 + int(rng.choice(len(p), p=p / p.sum()))
    swap = bool(rng.randint(2)) if config.enable_swap else False
    return scale, swap
