#!/usr/bin/env python3
"""Production E-LPIPS train-step timing: host-drawn (scale, swap)
single-branch step (cli/train.py build_host_scale_step's per-combo
program) vs the pixel step, both scan-chained like bench.py's train
timing. VERDICT r4 item 4's bar: elpips step <= 2x pixel step.
Run: python tools/bench_elpips_hostscale.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from matryodshka_tpu.config import MatryConfig, enable_compilation_cache
    from matryodshka_tpu.cli.train import build_elpips_fn
    from matryodshka_tpu.losses.elpips import api as elpips_api
    from matryodshka_tpu.parallel import dp, mesh as mesh_lib
    from matryodshka_tpu.training import state as state_lib

    enable_compilation_cache()
    K = 5

    rng = np.random.RandomState(0)
    b, h, w = 1, 320, 640
    eye = np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1))
    intr = np.tile(np.eye(3, dtype=np.float32)[None], (b, 1, 1))
    intr[:, 0, 0] = 0.032
    batch = {
        "ref_image": rng.rand(b, h, w, 3).astype(np.float32),
        "src_image": rng.rand(b, h, w, 3).astype(np.float32),
        "tgt_image": rng.rand(b, h, w, 3).astype(np.float32),
        "ref_pose": eye, "src_pose": eye, "ref_pose_inv": eye,
        "tgt_pose": np.tile(np.asarray([[0.05, 0.0, 0.0]], np.float32),
                            (b, 1)),
        "intrinsics": intr,
    }
    print(f"[hostscale] devices: {jax.devices()}", file=sys.stderr)
    m = mesh_lib.make_mesh(data=1)
    key = jax.random.PRNGKey(1)

    def measure(which_loss, ss=None):
        cfg = MatryConfig(height=h, width=w, num_psv_planes=32,
                          num_msi_planes=32, ngf=64,
                          which_loss=which_loss, coord_net=True,
                          compute_dtype="bfloat16").validate()
        state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
        tx = state_lib.build_optimizer(cfg)
        e_fn = None
        if which_loss == "elpips":
            metric = elpips_api.Metric(elpips_api.elpips_vgg(
                batch_size=b, n=cfg.elpips_average_over))
            e_fn = build_elpips_fn(cfg, static_scale_swap=ss,
                                   _metric=metric)
        multi = dp.make_dp_train_multi_step(cfg, model.apply, tx, m,
                                            elpips_fn=e_fn,
                                            steps_per_call=K,
                                            donate=False)
        sb = dp.stack_batches([batch] * K, m)
        t0 = time.perf_counter()
        state2, _ = multi(state, sb, key)
        jax.block_until_ready(state2.params)
        print(f"[hostscale] {which_loss}{ss or ''}: first call "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            s3, mm = multi(state2, sb, key)
            jax.block_until_ready(s3.params)
            best = min(best, (time.perf_counter() - t0) / K * 1000.0)
        print(f"[hostscale] {which_loss}{ss or ''}: {best:.1f} ms/step",
              flush=True)
        return best

    px = measure("pixel")
    el = measure("elpips", ss=(1, False))
    el2 = measure("elpips", ss=(2, True))
    print(f"[hostscale] ratio scale1: {el / px:.2f}x  "
          f"scale2: {el2 / px:.2f}x  (bar: <= 2x)", flush=True)


if __name__ == "__main__":
    main()
