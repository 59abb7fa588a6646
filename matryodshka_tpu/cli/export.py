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


def crop_to_multiple(image, size: int):
    """Center-ish crop to a multiple of `size` (export.py:117-132; the
    extra pixel goes on the left/top)."""
    h, w = image.shape[0], image.shape[1]
    left = (w % size) // 2
    top = (h % size) // 2
    return image[top:top + h - (h % size), left:left + w - (w % size), :]


def make_image_processor(cfg: MatryConfig, height: int, width: int,
                         channels: int, padx: int, pady: int,
                         flip_y: bool, flip_channels: bool,
                         remap_file=None):
    """uint8 flat buffer -> processed float image (export.py:134-160):
    optional RGBA->RGB slice, remap warp (a [H, W, 2] coordinate field
    from an .npy, e.g. fisheye->ERP), y/channel flips, padding, crop to a
    multiple of 16."""
    import numpy as np

    from matryodshka_tpu.ops.resample import bilinear_zero_resample

    remap = None
    if remap_file:
        remap = jnp.asarray(np.load(remap_file).astype(np.float32))

    def process(raw):
        img = raw.reshape(height, width, channels)
        img = img[:, :, :3]
        img = img.astype(jnp.float32) / 255.0
        if remap is not None:
            img = bilinear_zero_resample(img, remap)
        if flip_y:
            img = img[::-1]
        if flip_channels:
            img = img[:, :, ::-1]
        img = jnp.pad(img, ((pady, pady), (padx, padx), (0, 0)))
        return crop_to_multiple(img, 16)

    return process


def pose_from_flag(flag: str):
    """12 comma/space-separated values -> 4x4 (export.py:169-179)."""
    import numpy as np
    if flag:
        vals = [float(x) for x in flag.replace(",", " ").split()]
        assert len(vals) == 12, "pose flag needs 12 values"
        return np.asarray(vals + [0.0, 0.0, 0.0, 1.0],
                          np.float32).reshape(4, 4)
    return np.eye(4, dtype=np.float32)


def clip_params_to_fp16(params):
    """Clip weights into the fp16 representable range (export.py:311-321,
    for downstream runtimes that run the net in fp16)."""
    lim = float(jnp.finfo(jnp.float16).max)
    return jax.tree.map(lambda p: jnp.clip(p, -lim, lim), params)


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
    # input-processing options (export.py:33-115)
    parser.add_argument("--with_preprocess", action="store_true",
                        help="bake uint8->image preprocessing into the "
                             "exported function")
    parser.add_argument("--rgba", action="store_true")
    parser.add_argument("--flip_y", action="store_true")
    parser.add_argument("--flip_channels", action="store_true")
    parser.add_argument("--remap_ref", type=str, default=None)
    parser.add_argument("--remap_src", type=str, default=None)
    parser.add_argument("--padx", type=int, default=0)
    parser.add_argument("--pady", type=int, default=0)
    parser.add_argument("--pose1", type=str, default="")
    parser.add_argument("--pose2", type=str, default="")
    parser.add_argument("--clip_to_fp16", action="store_true")
    args = parser.parse_args(argv)
    from matryodshka_tpu.config import enable_compilation_cache
    enable_compilation_cache()
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

    if args.clip_to_fp16:
        params = clip_params_to_fp16(params)

    os.makedirs(args.export_dir, exist_ok=True)
    if args.with_preprocess and not cfg.net_only:
        # uint8 flat buffers + fixed flag poses -> rgba layers, with the
        # full preprocessing pipeline baked in (export.py:180-249)
        channels = 4 if args.rgba else 3
        proc_ref = make_image_processor(cfg, cfg.height, cfg.width,
                                        channels, args.padx, args.pady,
                                        args.flip_y, args.flip_channels,
                                        args.remap_ref)
        proc_src = make_image_processor(cfg, cfg.height, cfg.width,
                                        channels, args.padx, args.pady,
                                        args.flip_y, args.flip_channels,
                                        args.remap_src)
        pose1 = jnp.asarray(pose_from_flag(args.pose1))[None]
        pose2 = jnp.asarray(pose_from_flag(args.pose2))[None]
        pose1_inv = jnp.linalg.inv(pose1)
        intr = jnp.asarray(
            [[0.032, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
            jnp.float32)[None]
        inner = build_full_fn(cfg, model, params)

        def fn(ref_raw, src_raw):
            ref = proc_ref(ref_raw)[None]
            src = proc_src(src_raw)[None]
            return inner(ref, src, pose1, pose2, pose1_inv, intr)

        n_in = cfg.height * cfg.width * channels
        in_specs = (jax.ShapeDtypeStruct((n_in,), jnp.uint8),
                    jax.ShapeDtypeStruct((n_in,), jnp.uint8))
        interface = {
            "inputs": {"ref_image": [n_in], "src_image": [n_in]},
            "outputs": {"rgba_layers": "see config"},
        }
        exported = jax_export.export(jax.jit(fn),
                                     platforms=[args.platform])(*in_specs)
        blob = exported.serialize()
        path = os.path.join(args.export_dir,
                            f"{args.export_name}.stablehlo")
        with open(path, "wb") as fh:
            fh.write(blob)
        print(f"[export] wrote {path} ({len(blob)} bytes, preprocessing "
              f"baked in)")
        return

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
