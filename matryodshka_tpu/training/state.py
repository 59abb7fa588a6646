"""Train state: params + optimizer state + step, and model construction."""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from matryodshka_tpu.config import MatryConfig
from matryodshka_tpu.models.unet import MSIUNet

Array = jax.Array


@flax.struct.dataclass
class TrainState:
    step: Array
    params: Any
    opt_state: Any


def build_model(cfg: MatryConfig) -> MSIUNet:
    return MSIUNet(
        num_outputs=cfg.num_net_outputs(),
        ngf=cfg.ngf,
        variant="coord" if cfg.coord_net else "wrap",
        smoothed=cfg.smoothed,
        # measured SLOWER than XLA convs end-to-end on the bench chip
        # (see ops/pallas_conv.py docstring); opt-in experiment only
        use_pallas_conv=False,
        dtype=cfg.jnp_compute_dtype,
        param_dtype=cfg.jnp_param_dtype,
    )


def build_gcn(cfg: MatryConfig):
    """GCN variant: (model, mesh_coords [V,3], p2v table). Mesh assets are
    generated + cached under cfg.mesh_dir (see geometry/icosphere.py)."""
    import jax.numpy as jnp

    from matryodshka_tpu.geometry import icosphere
    from matryodshka_tpu.models.gcn import GCNNet, SparseSupport

    coords, supports, p2v = icosphere.load_mesh_input(
        cfg.subdiv, cfg.height, cfg.width, cfg.mesh_dir)
    sups = [SparseSupport(*s, num_verts=len(coords)) for s in supports]
    model = GCNNet(num_outputs=cfg.num_net_outputs(), supports=sups,
                   ngf=cfg.ngf)
    return model, jnp.asarray(coords), jnp.asarray(p2v)


def build_optimizer(cfg: MatryConfig) -> optax.GradientTransformation:
    """Adam with the reference hyperparameters (train.py:47-48; TF defaults
    beta2=0.999, eps=1e-8)."""
    return optax.adam(cfg.learning_rate, b1=cfg.beta1, b2=0.999, eps=1e-8)


def init_state(cfg: MatryConfig, rng: Array):
    """Returns (TrainState, model). For cfg.gcn the model is a GCNNet and
    the extra mesh inputs are available via build_gcn(cfg)."""
    if cfg.gcn:
        model, coords, _ = build_gcn(cfg)
        dummy = jnp.zeros((coords.shape[0], cfg.num_net_inputs()),
                          jnp.float32)
    else:
        model = build_model(cfg)
        dummy = jnp.zeros((cfg.batch_size, cfg.height, cfg.width,
                           cfg.num_net_inputs()), jnp.float32)
    params = model.init(rng, dummy)
    tx = build_optimizer(cfg)
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state), model


def param_count(params) -> int:
    return sum(int(jnp.size(p)) for p in jax.tree.leaves(params))
