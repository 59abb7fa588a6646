#!/usr/bin/env python3
"""Component-level TPU profiler with chained-in-one-jit measurement.

Per-dispatch round trips through a remote-TPU relay (tens of ms) swamp
single-call timings, so every stage here is measured by chaining K
iterations inside ONE jit with a data dependency, then dividing — pure
steady-state device time.

Usage: python tools/profile_components.py [--chain 20] [--height 320] ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=20)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--planes", type=int, default=32)
    ap.add_argument("--ngf", type=int, default=64)
    ap.add_argument("--coord_net", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from matryodshka_tpu.config import (MatryConfig,
                                        enable_compilation_cache)
    from matryodshka_tpu.geometry import sweep as sweep_lib
    from matryodshka_tpu.models import msi as msi_lib
    from matryodshka_tpu.training import state as state_lib

    enable_compilation_cache()
    cfg = MatryConfig(height=args.height, width=args.width,
                      num_psv_planes=args.planes,
                      num_msi_planes=args.planes, ngf=args.ngf,
                      coord_net=args.coord_net,
                      compute_dtype="bfloat16").validate()
    print(f"[prof] devices: {jax.devices()}", file=sys.stderr)

    rng = np.random.RandomState(0)
    b, h, w = 1, cfg.height, cfg.width
    eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
    intr = np.tile(np.eye(3, dtype=np.float32)[None], (b, 1, 1))
    intr[:, 0, 0] = 0.032
    batch = {
        "ref_image": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
        "src_image": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
        "ref_pose": eye, "src_pose": eye, "ref_pose_inv": eye,
        "tgt_pose": jnp.tile(jnp.asarray([0.05, 0.0, 0.0])[None], (b, 1)),
        "intrinsics": jnp.asarray(intr),
    }
    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    psv_depths = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_psv_planes))
    msi_depths = psv_depths

    K = args.chain

    def chained(step_fn, seed_img):
        """step_fn: img [B,H,W,3] -> img-like; chained K times."""
        @jax.jit
        def run(img):
            def body(_, im):
                return jnp.clip(step_fn(im), 0.0, 1.0)
            return jax.lax.fori_loop(0, K, body, img)

        jax.block_until_ready(run(seed_img))  # compile + warm
        t0 = time.perf_counter()
        out = run(seed_img)
        jax.block_until_ready(out)
        t1 = time.perf_counter()
        out = run(seed_img)
        jax.block_until_ready(out)
        t2 = time.perf_counter()
        return min(t1 - t0, t2 - t1) / K * 1000.0

    apply = lambda p, x: model.apply(p, x)

    def sweep_step(img):
        net_in = sweep_lib.format_network_input(
            msi_lib.preprocess_image(img),
            msi_lib.preprocess_image(batch["src_image"]),
            batch["ref_pose"], batch["src_pose"], batch["ref_pose_inv"],
            psv_depths, batch["intrinsics"], use_pallas=cfg.use_pallas)
        # reduce over ALL channels so XLA cannot dead-code either eye
        m = jnp.mean(net_in, axis=-1, keepdims=True)
        return img * 0.9 + m * 0.1

    def net_step(img):
        net_in = jnp.tile(img, (1, 1, 1, cfg.num_net_inputs() // 3))
        pred = apply(state.params, net_in * 2 - 1)
        m = jnp.mean(pred, axis=-1, keepdims=True)
        return img * 0.9 + (m * 0.5 + 0.5) * 0.1

    def assemble_step(img):
        net_in = jnp.tile(img * 2 - 1, (1, 1, 1,
                                        cfg.num_net_inputs() // 3))
        pred = jnp.tile(img * 2 - 1, (1, 1, 1,
                                      cfg.num_net_outputs() // 3 + 1)
                        )[..., :cfg.num_net_outputs()]
        rgba = msi_lib.assemble_rgba(cfg.which_color_pred, pred, net_in,
                                     cfg.num_msi_planes)["rgba_layers"]
        m = jnp.mean(rgba, axis=(3, 4), keepdims=False)[..., None]
        return img * 0.9 + m * 0.1

    def render_step(img):
        rgba = jnp.tile(img[:, :, :, None, :],
                        (1, 1, 1, cfg.num_msi_planes, 1))
        rgba = jnp.concatenate([rgba, rgba[..., :1] * 0.5 + 0.2], -1)
        out = msi_lib.render_equirect_view(rgba, eye, batch["tgt_pose"],
                                           msi_depths,
                                           use_pallas=cfg.use_pallas)
        return out

    def e2e_step(img):
        b2 = dict(batch)
        b2["ref_image"] = img
        outputs = msi_lib.infer_msi(apply, state.params, cfg, b2,
                                    psv_depths)
        return msi_lib.render_equirect_view(
            outputs["rgba_layers"], eye, batch["tgt_pose"], msi_depths,
            use_pallas=cfg.use_pallas)

    seed = batch["ref_image"]
    for name, fn in (("sweep(2 eyes)", sweep_step), ("unet", net_step),
                     ("assemble", assemble_step), ("render", render_step),
                     ("e2e", e2e_step)):
        ms = chained(fn, seed)
        print(f"{name:14s} {ms:7.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
