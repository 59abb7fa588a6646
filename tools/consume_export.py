"""External consumer for matryodshka-tpu export artifacts.

Deliberately imports NOTHING from matryodshka_tpu — this is the
deployment-side counterpart of the reference's ONNX/TensorRT consumer
(scripts/export/pb2onnx.sh): a serialized jax.export artifact plus its
meta.json is everything a runtime needs. Usage:

  python tools/consume_export.py export_dir/name.stablehlo

Loads the blob with jax.export.deserialize, reads the input contract
from the sibling meta.json, feeds random inputs of the declared
shapes/dtypes, and prints the outputs — proving the artifact is
self-contained (the StableHLO inside is equally loadable from C++ via
PjRt/XLA without any Python).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

import jax

# honor JAX_PLATFORMS even where a sitecustomize force-registers an
# accelerator backend after env parsing (this repo's test environment)
_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    try:
        jax.config.update("jax_platforms", _plat)
    except Exception:
        pass

from jax import export as jax_export  # noqa: E402


def main(path: str) -> None:
    meta_path = path.rsplit(".", 1)[0] + ".meta.json"
    with open(meta_path) as fh:
        meta = json.load(fh)
    with open(path, "rb") as fh:
        blob = fh.read()

    exported = jax_export.deserialize(blob)
    print(f"loaded {path}: {len(blob)/1e6:.1f} MB, "
          f"platforms={exported.platforms}")
    print(f"in_avals : {exported.in_avals}")
    print(f"out_avals: {exported.out_avals}")

    rng = np.random.RandomState(0)
    args = []
    for aval in exported.in_avals:
        dt = np.dtype(aval.dtype)
        if dt == np.uint8:
            args.append(rng.randint(0, 256, aval.shape).astype(np.uint8))
        else:
            args.append(rng.rand(*aval.shape).astype(dt))

    outs = exported.call(*args)
    outs = jax.tree_util.tree_leaves(outs)
    for i, o in enumerate(outs):
        o = np.asarray(o)
        print(f"out[{i}]: shape={o.shape} dtype={o.dtype} "
              f"range=[{o.min():.4f}, {o.max():.4f}] "
              f"finite={bool(np.isfinite(o).all())}")
    print(f"interface: {meta.get('interface', meta)}")


if __name__ == "__main__":
    main(sys.argv[1])
