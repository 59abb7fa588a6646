#!/usr/bin/env python3
"""Isolate the E-LPIPS forward pathology (12.5 s/step measured by
tools/train_probe3.py --fwd at 640x320, vs ~milliseconds of MXU work
for two VGG evals).

A/B in one process, each timed as K=10 evaluations chained in one jit
via lax.scan (relay-safe):
  lpips  — Metric(lpips_vgg(1)): plain LPIPS, no transform ensemble,
           no scale switch.
  elpips — Metric(elpips_vgg(1)): full ensemble with the 16-branch
           (scale, swap) lax.switch tower.
If lpips is ~ms and elpips is ~seconds, the switch tower is the
pathology (all branches evaluated, not one); if both are seconds, the
VGG feature implementation itself is.

Run: python tools/elpips_fwd_probe.py [lpips] [elpips]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

K = 10


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/matry_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    which = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        ["lpips", "elpips"]
    print("devices:", jax.devices(), flush=True)

    from matryodshka_tpu.losses.elpips import api

    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(1, 320, 640, 3).astype(np.float32))
    ref = jnp.asarray(rs.rand(1, 320, 640, 3).astype(np.float32))

    for name in which:
        cfg = (api.lpips_vgg(1) if name == "lpips"
               else api.elpips_vgg(1))
        metric = api.Metric(cfg)

        @jax.jit
        def many(img, ref, key, _m=metric):
            def body(c, i):
                d = _m.forward(img, ref, jax.random.fold_in(key, i))
                return c + d[0], ()
            out, _ = jax.lax.scan(body, jnp.zeros(()),
                                  jnp.arange(K))
            return out

        key = jax.random.PRNGKey(0)
        t0 = time.time()
        jax.block_until_ready(many(img, ref, key))
        print(f"[{name}] compile+first {K}: {time.time() - t0:.0f}s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(3):
            out = many(img, ref, key)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / (3 * K) * 1000.0
        print(f"[{name}] {ms:.2f} ms/forward (d={float(out) / K:.5f})",
              flush=True)


if __name__ == "__main__":
    main()
