"""Benchmark one E-LPIPS training step at full resolution on TPU.

The round-1 risk item: the (scale, swap) static lax.switch builds 16
VGG16 towers (losses/elpips/api.py) — this measures the real compile
cost and steady-state step time so 'elpips training' has a number.
Run: python tools/bench_elpips_step.py [--height 320 --width 640]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--planes", type=int, default=32)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--loss", default="elpips", choices=["elpips", "pixel"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from matryodshka_tpu.config import MatryConfig, enable_compilation_cache
    from matryodshka_tpu.cli.train import build_elpips_fn
    from matryodshka_tpu.training import state as state_lib
    from matryodshka_tpu.training.step import make_train_step

    enable_compilation_cache()
    cfg = MatryConfig(height=args.height, width=args.width,
                      num_psv_planes=args.planes,
                      num_msi_planes=args.planes, ngf=64,
                      which_loss=args.loss, coord_net=True,
                      compute_dtype="bfloat16").validate()
    print(f"[elpips-bench] devices: {jax.devices()}", file=sys.stderr)

    rng = np.random.RandomState(0)
    b, h, w = 1, cfg.height, cfg.width
    eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
    intr = np.tile(np.eye(3, dtype=np.float32)[None], (b, 1, 1))
    intr[:, 0, 0] = 0.032
    batch = {
        "ref_image": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
        "src_image": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
        "tgt_image": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
        "ref_pose": eye, "src_pose": eye, "ref_pose_inv": eye,
        "tgt_pose": jnp.tile(jnp.asarray([0.05, 0.0, 0.0])[None], (b, 1)),
        "intrinsics": jnp.asarray(intr),
    }
    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    tx = state_lib.build_optimizer(cfg)
    step_fn = make_train_step(cfg, model.apply, tx,
                              elpips_fn=build_elpips_fn(cfg))

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    state, metrics = step_fn(state, batch, key)
    jax.block_until_ready(metrics["total_loss"])
    compile_s = time.time() - t0
    print(f"[elpips-bench] first step (compile+run): {compile_s:.1f} s",
          file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub)
    jax.block_until_ready(metrics["total_loss"])
    ms = (time.perf_counter() - t0) / args.steps * 1000
    print(f"[elpips-bench] steady-state step: {ms:.1f} ms "
          f"(loss={float(metrics['total_loss']):.4f})")


if __name__ == "__main__":
    main()
