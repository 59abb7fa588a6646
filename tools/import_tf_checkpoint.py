#!/usr/bin/env python3
"""Import a reference (TF1) MatryODShka checkpoint into this framework.

The reference distributes two pretrained models (download_model.sh), saved
with tf.train.Saver under variable scopes like
  net/conv1_1/weights, net/conv1_1/LayerNorm/beta, ...
Reading TF checkpoints requires either TensorFlow or a prior conversion to
.npz (`python -c "import tensorflow as tf; ..."` on any machine with TF —
see --help epilog). This tool consumes such an .npz and emits an orbax
checkpoint loadable by matryodshka-tpu, handling:

  * name mapping (net/convX_Y/{weights,biases} -> MSIUNet convX_Y kernels)
  * slim.layer_norm beta/gamma -> SpatialLayerNorm
  * conv2d_transpose kernel convention: TF's conv2d_transpose computes the
    GRADIENT of a conv (kernel [kh, kw, out, in], implicitly flipped);
    flax ConvTranspose computes a true transposed convolution with kernel
    [kh, kw, in, out] — requires a spatial flip + axis swap.

Usage:
  # one-time, on a machine with TF1/2:
  python -c "
  import tensorflow as tf, numpy as np
  r = tf.train.load_checkpoint('model.latest-140000')
  np.savez('tf_weights.npz', **{k.replace('/', '|'): r.get_tensor(k)
           for k in r.get_variable_to_shape_map()})"
  # then here:
  python tools/import_tf_checkpoint.py tf_weights.npz out_ckpt_dir \
      --coord_net --height 320 --width 640
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

CONV_LAYERS = ["conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1",
               "conv3_2", "conv3_3", "conv4_1", "conv4_2", "conv4_3",
               "conv6_2", "conv6_3", "conv7_2", "conv8_2", "color_pred"]
DECONV_LAYERS = ["conv6_1", "conv7_1", "conv8_1"]


def convert(tf_vars: dict) -> dict:
    """TF var dict (slash-or-pipe-separated names) -> flax param dict."""
    def get(name):
        for key in (name, name.replace("/", "|")):
            if key in tf_vars:
                return np.asarray(tf_vars[key])
        raise KeyError(f"missing variable {name}; have e.g. "
                       f"{list(tf_vars)[:5]}")

    params: dict = {}
    for layer in CONV_LAYERS:
        entry = {"kernel": get(f"net/{layer}/weights")}
        try:
            entry["bias"] = get(f"net/{layer}/biases")
        except KeyError:
            pass
        params[layer] = entry
        if layer != "color_pred":
            params[layer + "_ln"] = {
                "beta": get(f"net/{layer}/LayerNorm/beta"),
                "gamma": get(f"net/{layer}/LayerNorm/gamma"),
            }
    for layer in DECONV_LAYERS:
        k = get(f"net/{layer}/weights")  # [kh, kw, out, in]
        # TF conv2d_transpose(k) == flax ConvTranspose(flip(k).swap):
        k = k[::-1, ::-1, :, :]                  # spatial flip
        k = np.transpose(k, (0, 1, 3, 2))        # [kh, kw, in, out]
        entry = {"kernel": k}
        try:
            entry["bias"] = get(f"net/{layer}/biases")
        except KeyError:
            pass
        params[layer] = entry
        params[layer + "_ln"] = {
            "beta": get(f"net/{layer}/LayerNorm/beta"),
            "gamma": get(f"net/{layer}/LayerNorm/gamma"),
        }
    return {"params": params}


def to_tf_vars(params: dict) -> dict:
    """Inverse of convert(): flax param tree -> reference-named TF vars.

    Together with tools/tensor_bundle.py this exports checkpoints BACK
    to the reference's format (and drives the parity dress rehearsal:
    export -> reimport must be bit-identical)."""
    p = params["params"] if "params" in params else params
    tf_vars = {}
    for layer in CONV_LAYERS:
        tf_vars[f"net/{layer}/weights"] = np.asarray(p[layer]["kernel"])
        if "bias" in p[layer]:
            tf_vars[f"net/{layer}/biases"] = np.asarray(p[layer]["bias"])
        if layer != "color_pred":
            ln = p[layer + "_ln"]
            tf_vars[f"net/{layer}/LayerNorm/beta"] = np.asarray(
                ln["beta"])
            tf_vars[f"net/{layer}/LayerNorm/gamma"] = np.asarray(
                ln["gamma"])
    for layer in DECONV_LAYERS:
        k = np.asarray(p[layer]["kernel"])        # flax [kh, kw, in, out]
        k = np.transpose(k, (0, 1, 3, 2))[::-1, ::-1]   # TF [kh,kw,out,in]
        tf_vars[f"net/{layer}/weights"] = k
        if "bias" in p[layer]:
            tf_vars[f"net/{layer}/biases"] = np.asarray(p[layer]["bias"])
        ln = p[layer + "_ln"]
        tf_vars[f"net/{layer}/LayerNorm/beta"] = np.asarray(ln["beta"])
        tf_vars[f"net/{layer}/LayerNorm/gamma"] = np.asarray(ln["gamma"])
    return tf_vars


def load_tf_vars(path: str) -> dict:
    """Load TF variables from an .npz dump OR directly from a TF-v1
    checkpoint prefix (pure-python TensorBundle reader — no TF needed)."""
    if path.endswith(".npz"):
        blob = np.load(path, allow_pickle=True)
        return {k: blob[k] for k in blob.files}
    import os
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import tensor_bundle
    return tensor_bundle.load(path)


def main():
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("src", help=".npz of TF variables, or a TF-v1 "
                    "checkpoint prefix (read without TF)")
    ap.add_argument("out_dir", help="orbax checkpoint dir to write")
    ap.add_argument("--step", type=int, default=0)
    args = ap.parse_args()

    tf_vars = load_tf_vars(args.src)
    params = convert(tf_vars)

    import jax.numpy as jnp

    from matryodshka_tpu.training.checkpoint import CheckpointManager
    from matryodshka_tpu.training.state import TrainState

    n = sum(int(np.asarray(v).size) for layer in params["params"].values()
            for v in layer.values())
    print(f"converted {n:,} parameters across "
          f"{len(params['params'])} modules")

    state = TrainState(step=jnp.asarray(args.step, jnp.int32),
                       params=params, opt_state=None)
    manager = CheckpointManager(args.out_dir)
    manager.save(state)
    print(f"wrote orbax checkpoint @ step {args.step} to {args.out_dir}")


if __name__ == "__main__":
    main()
