"""2AFC training of the LPIPS linear weights.

JAX port of the reference harness (elpips/train.py): given triplets
(reference image, distortion 0, distortion 1) with human judgements
h in [0, 1] (fraction preferring im1), learn per-channel linear weights
so the metric's ranking matches the judgements.

The ranking head is the reference's BCERankingLoss (train.py:58-76): a
3-layer 1x1 MLP over (d0, d1, d0-d1, d0/(d1+eps), d1/(d0+eps)) producing
a preference logit, trained jointly with the (softplus-constrained,
nonnegative) lin weights by sigmoid cross-entropy, symmetrized over the
(d0, d1) ordering.

Data comes from a darc archive of records named ref/{i}, p0/{i}, p1/{i},
judge/{i} (build one with make_archive below) — or any iterator of
batch dicts.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from matryodshka_tpu.losses.elpips import api as elpips_api
from matryodshka_tpu.losses.elpips.darc import DataArchive

Array = jax.Array


def init_head_params(key: Array, chn_mid: int = 32) -> Dict[str, Array]:
    k1, k2, k3 = jax.random.split(key, 3)
    s = 0.1
    return {
        "W1": jax.random.normal(k1, (5, chn_mid)) * s,
        "b1": jnp.zeros((chn_mid,)),
        "W2": jax.random.normal(k2, (chn_mid, chn_mid)) * s,
        "b2": jnp.zeros((chn_mid,)),
        "W3": jax.random.normal(k3, (chn_mid, 1)) * s,
        "b3": jnp.zeros((1,)),
    }


def ranking_logit(head, d0: Array, d1: Array, eps: float = 0.1) -> Array:
    """The dist2logit MLP (train.py:58-72)."""
    feats = jnp.stack([d0, d1, d0 - d1, d0 / (d1 + eps),
                       d1 / (d0 + eps)], axis=-1)
    h = jax.nn.leaky_relu(feats @ head["W1"] + head["b1"], 0.2)
    h = jax.nn.leaky_relu(h @ head["W2"] + head["b2"], 0.2)
    return (h @ head["W3"] + head["b3"])[..., 0]


def bce_ranking_loss(head, d0, d1, judge):
    logits = ranking_logit(head, d0, d1)
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, judge))


@dataclasses.dataclass
class TrainConfig:
    metric: str = "lpips_vgg"       # config name; vgg weights fixed
    learning_rate: float = 1e-4
    batch_size: int = 8
    steps: int = 1000
    weight_path: Optional[str] = None
    seed: int = 0


def make_archive(path: str, triplets) -> None:
    """Write (ref, p0, p1, judge) triplets into a darc archive."""
    with DataArchive(path, "w") as db:
        for i, (ref, p0, p1, judge) in enumerate(triplets):
            db.append(np.asarray(ref, np.float32), f"ref/{i}")
            db.append(np.asarray(p0, np.float32), f"p0/{i}")
            db.append(np.asarray(p1, np.float32), f"p1/{i}")
            db.append(np.asarray(judge, np.float32), f"judge/{i}")


def archive_batches(path: str, batch_size: int,
                    seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    db = DataArchive(path, "r")
    n = len(db) // 4
    rng = np.random.RandomState(seed)
    while True:
        idx = rng.randint(0, n, size=batch_size)
        yield {
            "ref": np.stack([db.read(f"ref/{i}") for i in idx]),
            "p0": np.stack([db.read(f"p0/{i}") for i in idx]),
            "p1": np.stack([db.read(f"p1/{i}") for i in idx]),
            "judge": np.stack([db.read(f"judge/{i}") for i in idx]
                              ).reshape(batch_size),
        }


def train(cfg: TrainConfig, batches: Iterator[Dict[str, np.ndarray]],
          verbose: bool = True):
    """Returns (lin_weights dict, head params, final metrics).

    Only the LPIPS linear weights + ranking head are trained (the
    reference's default 'lpips' trainable mode); the conv tower is fixed.
    """
    metric = elpips_api.Metric(
        elpips_api.get_config(cfg.metric, batch_size=cfg.batch_size),
        weight_path=cfg.weight_path)
    net = metric.network.net
    chans = net.tap_channels

    key = jax.random.PRNGKey(cfg.seed)
    k_lin, k_head = jax.random.split(key)
    # raw params; effective lin weight = softplus(raw) >= 0
    lin_raw = {f"lin{i}": jnp.full((c,), -2.0) for i, c in
               enumerate(chans)}
    head = init_head_params(k_head)
    params = {"lin": lin_raw, "head": head}

    from matryodshka_tpu.losses.elpips.pnetlin import (SHIFT, SCALE,
                                                       normalize_tensor)

    def distances(lin, im, ref):
        shift = jnp.asarray(SHIFT).reshape(1, 1, 1, 3)
        scale = jnp.asarray(SCALE).reshape(1, 1, 1, 3)
        taps = net(((im - shift) / scale, (ref - shift) / scale))
        d = 0.0
        for i, tap in enumerate(taps):
            n0 = normalize_tensor(tap[0])
            n1 = normalize_tensor(tap[1])
            diff = jnp.mean(jnp.square(n0 - n1), axis=(1, 2))
            d = d + jnp.sum(diff * jax.nn.softplus(lin[f"lin{i}"]),
                            axis=-1)
        return d

    def loss_fn(params, batch):
        d0 = distances(params["lin"], batch["p0"], batch["ref"])
        d1 = distances(params["lin"], batch["p1"], batch["ref"])
        judge = batch["judge"]
        loss = 0.5 * (bce_ranking_loss(params["head"], d0, d1, judge)
                      + bce_ranking_loss(params["head"], d1, d0,
                                         1.0 - judge))
        acc = jnp.mean((d1 < d0).astype(jnp.float32) * judge
                       + (d1 >= d0).astype(jnp.float32) * (1.0 - judge))
        return loss, acc

    tx = optax.adam(cfg.learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    loss = acc = 0.0
    for i in range(cfg.steps):
        batch = {k: jnp.asarray(v) for k, v in next(batches).items()}
        params, opt_state, loss, acc = step(params, opt_state, batch)
        if verbose and (i + 1) % 100 == 0:
            print(f"[2afc] step {i+1}: loss={float(loss):.4f} "
                  f"acc={float(acc):.3f}")

    lin_weights = {
        f"lin{i}.model.1.weight": np.asarray(
            jax.nn.softplus(params["lin"][f"lin{i}"])).reshape(
                1, 1, -1, 1)
        for i in range(len(chans))}
    return lin_weights, params["head"], {"loss": float(loss),
                                         "accuracy": float(acc)}
