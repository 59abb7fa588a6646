#!/usr/bin/env python3
"""One-process TPU measurement session for round 3.

The axon tunnel allows a single JAX process at a time and costs
minutes of init + compile, so every hardware question is batched here:

  1. profile_r3 stage budget (sweep/net/assemble/uv/ladder/caps)
  2. bench.py e2e JSON line
  3. (--sweeps) ladder rb/wb and cap sweeps

Run:  python tools/r3_hw_session.py [--sweeps]
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def phase(name, fn):
    print(f"\n===== {name} =====", flush=True)
    t0 = time.perf_counter()
    try:
        fn()
        print(f"===== {name}: done ({time.perf_counter() - t0:.0f}s) =====",
              flush=True)
    except Exception:  # noqa: BLE001 — keep later phases alive
        print(f"===== {name}: FAILED ({time.perf_counter() - t0:.0f}s) =====",
              flush=True)
        traceback.print_exc(limit=5)


def main():
    import jax
    print("devices:", jax.devices(), flush=True)

    from tools import profile_r3
    phase("profile_r3", profile_r3.main)

    import bench
    phase("bench", bench.main)

    if "--sweeps" in sys.argv:
        from tools import exp_ladder_rb_wb
        phase("ladder rb/wb sweep", exp_ladder_rb_wb.main)


if __name__ == "__main__":
    main()
