"""Training entry point (the reference's train.py, flags included).

Example (mirrors scripts/train/ods-wotemp-elpips-coord.sh):
  python train.py --cameras_glob 'glob/train/ods/*.txt' \
      --image_dir train_640x320 --experiment_name ods-run \
      --which_loss elpips --coord_net true --max_steps 140000
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from matryodshka_tpu.config import MatryConfig, parse_config
from matryodshka_tpu.data.loader import (OdsLoader, RealEstateLoader,
                                         device_prefetch)
from matryodshka_tpu.geometry import sweep as sweep_lib
from matryodshka_tpu.models import msi as msi_lib
from matryodshka_tpu.training import loop as loop_lib
from matryodshka_tpu.training import state as state_lib
from matryodshka_tpu.training.step import make_loss_fn, make_train_step


def build_elpips_fn(cfg: MatryConfig):
    if cfg.which_loss != "elpips":
        return None
    from matryodshka_tpu.losses.elpips import api as elpips_api
    metric = elpips_api.Metric(elpips_api.elpips_vgg(
        batch_size=cfg.batch_size, n=cfg.elpips_average_over),
        weight_path=cfg.elpips_weight_path)
    return lambda p, t, rng: metric.forward(p, t, rng)


def make_image_summary_fn(cfg: MatryConfig, model_apply):
    psv_depths = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_psv_planes))
    msi_depths = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_msi_planes))

    @jax.jit
    def summarize(params, batch):
        outputs = msi_lib.infer_msi(lambda p, x: model_apply(p, x), params,
                                    cfg, batch, psv_depths)
        rgba = outputs["rgba_layers"]
        imgs = {}
        if cfg.input_type == "ODS":
            b = rgba.shape[0]
            eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
            out = msi_lib.render_equirect_view(rgba, eye,
                                               batch["tgt_pose"],
                                               msi_depths)
            imgs["output_image"] = msi_lib.deprocess_image(out[0])
        for i in (0, rgba.shape[3] // 2, rgba.shape[3] - 1):
            imgs[f"rgb_layer_{i}"] = msi_lib.deprocess_image(
                rgba[0, :, :, i, :3])
            imgs[f"alpha_layer_{i}"] = rgba[0, :, :, i, 3:]
        imgs["tgt_image"] = batch["tgt_image"][0]
        return imgs

    def fn(state, batch):
        return jax.device_get(summarize(state.params, batch))

    return fn


def main(argv=None):
    cfg = parse_config(argv, description="matryodshka-tpu training")
    print(f"[train] devices: {jax.devices()}")

    if cfg.input_type == "REALESTATE_PP":
        loader = RealEstateLoader(cfg, training=True,
                                  shuffle_seq_length=10)
    else:
        loader = OdsLoader(cfg, training=True)
    print(f"[train] {len(loader.sequences)} sequences")

    rng = jax.random.PRNGKey(cfg.random_seed)
    state, model = state_lib.init_state(cfg, rng)
    tx = state_lib.build_optimizer(cfg)
    step_fn = make_train_step(cfg, model.apply, tx,
                              elpips_fn=build_elpips_fn(cfg))

    image_fn = make_image_summary_fn(cfg, model.apply)
    batches = device_prefetch(loader.batches(), size=2)
    loop_lib.train(cfg, state, step_fn, batches,
                   image_summary_fn=image_fn)


if __name__ == "__main__":
    main()
