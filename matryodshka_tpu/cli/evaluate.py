"""Evaluation entry point (the reference's eval.py).

Scans test output directories, computes SSIM / PSNR (and E-LPIPS when
weights are available) of rendered vs ground-truth target views, and
aggregates average + variance into a JSON table (eval.py:127-145,
262-300). Video mode computes frame-to-frame blurred RGB/depth diffs
(eval.py:147-260). `--remove_pole` crops the top/bottom quarters.

Unlike the reference (which rebuilds a TF graph + session per example —
"very slow by design", SURVEY.md 3.5), metrics here are one jitted
function reused across examples.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
from typing import Dict, List

import jax.numpy as jnp
import numpy as np
from PIL import Image

from matryodshka_tpu.evaluation import metrics as M


def _load(path: str) -> np.ndarray:
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0


def collect_examples(result_dir: str) -> List[Dict[str, str]]:
    """Find (gt, output) image pairs in test output dirs
    (eval.py:62-95 layout: {dir}/tgt_image_{name}.png +
    {dir}/output_tgt_{name}.png)."""
    examples = []
    for d in sorted(glob.glob(os.path.join(result_dir, "*"))):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        gt = os.path.join(d, f"tgt_image_{name}.png")
        out = os.path.join(d, f"output_tgt_{name}.png")
        if os.path.exists(gt) and os.path.exists(out):
            examples.append({"name": name, "gt": gt, "out": out})
    return examples


def collect_video_examples(result_dir: str) -> List[Dict[str, str]]:
    """Consecutive-frame pairs from video_* dirs (eval.py:97-125)."""
    dirs = sorted(d for d in glob.glob(os.path.join(result_dir, "video_*"))
                  if os.path.isdir(d))
    pairs = []
    for a, b in zip(dirs, dirs[1:]):
        na, nb = os.path.basename(a), os.path.basename(b)
        pairs.append({
            "rgb_a": os.path.join(a, f"output_tgt_{na}.png"),
            "rgb_b": os.path.join(b, f"output_tgt_{nb}.png"),
            "depth_a": os.path.join(a, f"output_depth_{na}.png"),
            "depth_b": os.path.join(b, f"output_depth_{nb}.png"),
        })
    return pairs


def evaluate_one(gt: np.ndarray, out: np.ndarray,
                 remove_pole: bool = False,
                 elpips_metric=None) -> Dict[str, float]:
    if remove_pole:
        gt, out = M.remove_pole(gt), M.remove_pole(out)
    scores = {
        "ssim": float(M.ssim(jnp.asarray(out), jnp.asarray(gt))),
        "psnr": float(M.psnr(jnp.asarray(out), jnp.asarray(gt))),
    }
    if elpips_metric is not None:
        import jax
        scores["elpips"] = float(np.mean(np.asarray(
            elpips_metric.forward(jnp.asarray(out)[None],
                                  jnp.asarray(gt)[None],
                                  jax.random.PRNGKey(0)))))
    return scores


def aggregate(rows: List[Dict[str, float]]) -> Dict[str, float]:
    out = {}
    if not rows:
        return out
    for k in rows[0]:
        vals = np.asarray([r[k] for r in rows], np.float64)
        out[f"avg_{k}"] = float(vals.mean())
        out[f"var_{k}"] = float(vals.var())
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description="matryodshka-tpu eval")
    ap.add_argument("--result_root", type=str, required=True,
                    help="test output dir ({output_root}/{experiment})")
    ap.add_argument("--eval_type", type=str, default="reg",
                    choices=["reg", "video"])
    ap.add_argument("--remove_pole", action="store_true")
    ap.add_argument("--with_elpips", action="store_true")
    ap.add_argument("--elpips_weight_path", type=str, default=None)
    ap.add_argument("--allow_uncalibrated", action="store_true",
                    help="permit E-LPIPS scores computed with random "
                         "conv features (no --elpips_weight_path); the "
                         "numbers are NOT the calibrated perceptual "
                         "distance and are stamped as such in the JSON")
    ap.add_argument("--output_json", type=str, default=None)
    args = ap.parse_args(argv)

    elpips_metric = None
    if args.with_elpips:
        from matryodshka_tpu.losses.elpips import api as elpips_api
        elpips_metric = elpips_api.Metric(
            elpips_api.elpips_vgg(batch_size=1),
            weight_path=args.elpips_weight_path)
        if not elpips_metric.calibrated and not args.allow_uncalibrated:
            # The reference always evaluates with real pretrained
            # features (eval.py:138-142); a random-feature score must
            # never leave this tool looking like one.
            ap.error(
                "E-LPIPS would run with RANDOM conv features (no "
                "--elpips_weight_path and no importable blob). Scores "
                "would be meaningless as perceptual distances. Pass "
                "--elpips_weight_path (build with "
                "tools/import_elpips_weights.py) or opt in explicitly "
                "with --allow_uncalibrated.")

    result: Dict = {"result_root": args.result_root,
                    "eval_type": args.eval_type}
    if elpips_metric is not None:
        result["elpips_calibrated"] = bool(elpips_metric.calibrated)
    if args.eval_type == "reg":
        examples = collect_examples(args.result_root)
        print(f"[eval] {len(examples)} examples")
        rows = []
        for ex in examples:
            scores = evaluate_one(_load(ex["gt"]), _load(ex["out"]),
                                  args.remove_pole, elpips_metric)
            scores["name"] = ex["name"]
            rows.append(scores)
            print(f"  {ex['name']}: " + " ".join(
                f"{k}={v:.4f}" for k, v in scores.items()
                if isinstance(v, float)))
        result["per_example"] = rows
        result.update(aggregate(
            [{k: v for k, v in r.items() if isinstance(v, float)}
             for r in rows]))
    else:
        pairs = collect_video_examples(args.result_root)
        print(f"[eval] {len(pairs)} consecutive-frame pairs")
        rgb_diffs, depth_diffs = [], []
        for p in pairs:
            rgb_diffs.append(float(M.temporal_diff(
                jnp.asarray(_load(p["rgb_a"])),
                jnp.asarray(_load(p["rgb_b"])))))
            if os.path.exists(p["depth_a"]):
                depth_diffs.append(float(M.temporal_diff(
                    jnp.asarray(_load(p["depth_a"])),
                    jnp.asarray(_load(p["depth_b"])))))
        result["avg_rgb_diff"] = float(np.mean(rgb_diffs)) if rgb_diffs \
            else None
        result["sd_rgb_diff"] = float(np.std(rgb_diffs)) if rgb_diffs \
            else None
        if depth_diffs:
            result["avg_depth_diff"] = float(np.mean(depth_diffs))
            result["sd_depth_diff"] = float(np.std(depth_diffs))

    out_path = args.output_json or os.path.join(
        args.result_root, f"eval_{args.eval_type}.json")
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=2)
    print(f"[eval] wrote {out_path}")
    summary = {k: v for k, v in result.items()
               if isinstance(v, float)}
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
