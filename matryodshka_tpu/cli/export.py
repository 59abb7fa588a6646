"""Export entry point (the reference's export.py).

The reference freezes a TF graph to .pb then converts to ONNX for the
TensorRT/Unity runtime (export.py:251-327, scripts/export/pb2onnx.sh).
The TPU-native deployment path is jax.export: the net-only function
(plane_sweep_input -> msi_output atlas, matching the frozen graph's
interface) or the full pipeline is serialized as StableHLO, reloadable
into any XLA runtime without Python.

Outputs:
  {export_dir}/{name}.stablehlo   — serialized jax.export artifact
  {export_dir}/{name}.meta.json   — shapes/dtypes + interface contract
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from matryodshka_tpu.config import MatryConfig, add_config_args, \
    config_from_args
from matryodshka_tpu.geometry import sweep as sweep_lib
from matryodshka_tpu.models import msi as msi_lib
from matryodshka_tpu.models.unet import atlas_pack
from matryodshka_tpu.training import state as state_lib
from matryodshka_tpu.training.checkpoint import CheckpointManager


def build_net_only_fn(cfg: MatryConfig, model, params):
    """plane_sweep_input -> msi_output atlas, the frozen-graph interface
    (nets.py:310,370-385: input [1, H, W, 2*P*3], output the 8-row tiled
    mosaic of the first 64 channels)."""

    def fn(plane_sweep_input):
        pred = model.apply(params, plane_sweep_input)
        return atlas_pack(pred, cfg.height, cfg.width,
                          channels=min(64, cfg.num_net_outputs()))

    return fn


def build_full_fn(cfg: MatryConfig, model, params):
    """ref/src images + poses -> RGBA shells (full pipeline export)."""
    psv_depths = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_psv_planes))

    def fn(ref_image, src_image, ref_pose, src_pose, ref_pose_inv,
           intrinsics):
        batch = dict(ref_image=ref_image, src_image=src_image,
                     ref_pose=ref_pose, src_pose=src_pose,
                     ref_pose_inv=ref_pose_inv, intrinsics=intrinsics)
        outputs = msi_lib.infer_msi(
            lambda p, x: model.apply(p, x), params, cfg, batch, psv_depths)
        return outputs["rgba_layers"]

    return fn


def main(argv=None):
    parser = argparse.ArgumentParser(description="matryodshka-tpu export")
    add_config_args(parser)
    parser.add_argument("--export_dir", type=str, default="export")
    parser.add_argument("--export_name", type=str, default="msi_model")
    parser.add_argument("--platform", type=str, default="tpu",
                        choices=["tpu", "cpu", "cuda"])
    args = parser.parse_args(argv)
    cfg = config_from_args(args)

    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    params = state.params
    ckpt_dir = os.path.join(cfg.checkpoint_dir, cfg.experiment_name)
    try:
        manager = CheckpointManager(ckpt_dir)
        params, step = manager.restore_params()
        print(f"[export] restored checkpoint @ step {step}")
    except FileNotFoundError:
        step = 0
        print("[export] WARNING: no checkpoint found; exporting fresh "
              "init weights")

    from jax import export as jax_export

    os.makedirs(args.export_dir, exist_ok=True)
    if cfg.net_only:
        fn = build_net_only_fn(cfg, model, params)
        in_specs = (jax.ShapeDtypeStruct(
            (1, cfg.height, cfg.width, cfg.num_net_inputs()),
            jnp.float32),)
        interface = {
            "inputs": {"plane_sweep_input":
                       [1, cfg.height, cfg.width, cfg.num_net_inputs()]},
            "outputs": {"msi_output": "8-row channel atlas"},
        }
    else:
        fn = build_full_fn(cfg, model, params)
        b = 1
        in_specs = (
            jax.ShapeDtypeStruct((b, cfg.height, cfg.width, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, cfg.height, cfg.width, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, 4, 4), jnp.float32),
            jax.ShapeDtypeStruct((b, 4, 4), jnp.float32),
            jax.ShapeDtypeStruct((b, 4, 4), jnp.float32),
            jax.ShapeDtypeStruct((b, 3, 3), jnp.float32),
        )
        interface = {
            "inputs": {"ref_image": list(in_specs[0].shape),
                       "src_image": list(in_specs[1].shape),
                       "ref_pose": [b, 4, 4], "src_pose": [b, 4, 4],
                       "ref_pose_inv": [b, 4, 4],
                       "intrinsics": [b, 3, 3]},
            "outputs": {"rgba_layers":
                        [b, cfg.height, cfg.width, cfg.num_msi_planes, 4]},
        }

    exported = jax_export.export(jax.jit(fn),
                                 platforms=[args.platform])(*in_specs)
    blob = exported.serialize()
    path = os.path.join(args.export_dir, f"{args.export_name}.stablehlo")
    with open(path, "wb") as fh:
        fh.write(blob)
    meta = {"step": int(step), "net_only": cfg.net_only,
            "platform": args.platform, "interface": interface,
            "config": {"height": cfg.height, "width": cfg.width,
                       "num_psv_planes": cfg.num_psv_planes,
                       "num_msi_planes": cfg.num_msi_planes,
                       "which_color_pred": cfg.which_color_pred,
                       "coord_net": cfg.coord_net}}
    with open(os.path.join(args.export_dir,
                           f"{args.export_name}.meta.json"), "w") as fh:
        json.dump(meta, fh, indent=2)
    print(f"[export] wrote {path} ({len(blob)} bytes)")


if __name__ == "__main__":
    main()
