#!/usr/bin/env python3
"""Build an elpips weight .npz for matryodshka_tpu.

Combines:
  * LPIPS linear weights from the original elpips distribution's .npy
    files (vgg_full_avg.npy / vgg_maxpool.npy / squeeze*.npy) — small,
    shipped with the reference repo;
  * the feature network conv weights, from either
      - a torchvision VGG16 state_dict (.pth, loaded with torch), or
      - the elpips "*_pytorch_transposed_nonlinear_features.npy" dicts
        (torch_idx.weight in HWIO + .bias), or
      - any .npz with the same keys.

Usage:
  python tools/import_elpips_weights.py out.npz \
      --lin /path/to/elpips/vgg_full_avg.npy \
      --net /path/to/vgg16_features.pth
"""

import argparse

import numpy as np


def load_lin(path):
    d = np.load(path, allow_pickle=True, encoding="latin1").item()
    return {f"lin/{k}": np.asarray(v, np.float32) for k, v in d.items()}


def load_net(path):
    if path.endswith(".pth") or path.endswith(".pt"):
        import torch
        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        out = {}
        for k, v in sd.items():
            # keys like 'features.0.weight' [out,in,kh,kw] -> HWIO
            if not k.startswith("features."):
                continue
            idx, kind = k.split(".")[1], k.split(".")[2]
            arr = v.detach().numpy()
            if kind == "weight" and arr.ndim == 4:
                arr = np.transpose(arr, (2, 3, 1, 0))
            out[f"net/{idx}.{kind}"] = np.asarray(arr, np.float32)
        return out
    d = np.load(path, allow_pickle=True, encoding="latin1")
    if hasattr(d, "item"):
        try:
            d = d.item()
        except (ValueError, AttributeError):
            pass
    if isinstance(d, dict):
        items = d.items()
    else:
        items = ((k, d[k]) for k in d.files)
    return {f"net/{k}": np.asarray(v, np.float32) for k, v in items}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output")
    ap.add_argument("--lin", required=True,
                    help="elpips lin-weight .npy (e.g. vgg_full_avg.npy)")
    ap.add_argument("--net", required=True,
                    help="feature net weights (.pth state_dict or .npy)")
    args = ap.parse_args()
    blob = {}
    blob.update(load_lin(args.lin))
    blob.update(load_net(args.net))
    np.savez(args.output, **blob)
    print(f"wrote {args.output} with {len(blob)} arrays")


if __name__ == "__main__":
    main()
