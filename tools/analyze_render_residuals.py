"""Measure per-plane render-warp residual bounds (du = u - j, dv = v - i).

The Pallas render kernel (ops/pallas_render.py) replaces per-pixel gathers
with static rolls + masked blends; its ladder sizes are set by the max
integer displacement of the lookup field from the identity map, per shell.
This tool prints those bounds for representative novel-view poses so the
bucket thresholds in the kernel stay honest.

Run: JAX_PLATFORMS=cpu python tools/analyze_render_residuals.py
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from matryodshka_tpu.geometry import intersect
from matryodshka_tpu.geometry import sweep as sweep_lib


def residuals(uv, h, w):
    """uv: [P, H, W, 2] -> per-plane (max|du|, max|dv|) in pixels."""
    j = np.arange(w)[None, None, :]
    i = np.arange(h)[None, :, None]
    # The ERP projection of an ERP-grid ray bundle is a REVERSED ramp in j
    # (theta = -S): u = u0 - j + parallax. Measure the circular residual
    # against that ramp, anchored at the zero-parallax value u0 = W - 1 - j
    # (u(j) == W-1-j exactly when pose = identity, t = 0).
    du = (np.asarray(uv[..., 0]) - (w - 1 - j) + w / 2) % w - w / 2
    dv = np.asarray(uv[..., 1]) - i
    return (np.abs(du).max(axis=(1, 2)), np.abs(dv).max(axis=(1, 2)),
            du, dv)


def main():
    h, w = 320, 640
    radii = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, 32))
    eye = jnp.eye(4)

    for name, pos in [("bench tgt [0.05,0,0]", [0.05, 0.0, 0.0]),
                      ("diag [0.05,0.05,0.05]", [0.05, 0.05, 0.05]),
                      ("big [0.1,0.1,0.1]", [0.1, 0.1, 0.1])]:
        uv = intersect.intersect_sphere(eye, jnp.asarray(pos), radii, w, h)
        mdu, mdv, du, dv = residuals(uv, h, w)
        print(f"--- {name}")
        A = np.linalg.norm(pos) * w / (2 * np.pi) / np.asarray(radii)
        for p in range(0, 32, 4):
            print(f"  p={p:2d} r={float(radii[p]):7.2f} "
                  f"max|du|={mdu[p]:6.3f} max|dv|={mdv[p]:6.3f} "
                  f"A_pred={A[p]:6.3f}")
        print(f"  global max|du|={mdu.max():.3f} max|dv|={mdv.max():.3f}")

    # ODS eye re-render (order +-1, baseline 0.032, identity pose)
    intr = jnp.eye(3).at[0, 0].set(0.032)
    for order in (1, -1):
        uv = intersect.intersect_ods(eye, jnp.zeros(3), order, intr, radii,
                                     w, h)
        mdu, mdv, _, _ = residuals(uv, h, w)
        print(f"--- ods order={order}: global max|du|={mdu.max():.3f} "
              f"max|dv|={mdv.max():.3f}; nearest plane "
              f"du={mdu[-1]:.3f} dv={mdv[-1]:.3f}")


if __name__ == "__main__" and "--cost" not in __import__("sys").argv:
    main()


def kernel_cost(uv, h, w, row_block=16, cap=16, kh_max=32, kv_max=7,
                op_us=5.0, mask_us=1.25):
    """Predict Pallas render-kernel ms for adaptive per-(plane,block) rungs.

    exact  : double ladder, cost ~ rungs_h rolls + rungs_h*rungs_v fmas
    separable: H-pass on band rows + V-pass (documented approximation)
    """
    p = uv.shape[0]
    j = np.arange(w)[None, None, :]
    i = np.arange(h)[None, :, None]
    u = np.asarray(uv[..., 0])
    v = np.asarray(uv[..., 1])
    dk = (w - 1 - j - np.floor(u) + w / 2) % w - w / 2
    dy = np.floor(v) - i
    mid = slice(cap, h - cap)
    dk = dk[:, mid]
    dy = dy[:, mid]
    hm = h - 2 * cap
    nblk = hm // row_block
    exact = sep = 0.0
    clipped = 0
    for pp in range(p):
        for b in range(nblk):
            rows = slice(b * row_block, (b + 1) * row_block)
            kh = int(min(max(-dk[pp, rows].min(), dk[pp, rows].max()) + 1,
                         kh_max))
            kv = int(min(max(-dy[pp, rows].min(), dy[pp, rows].max()) + 1,
                         kv_max))
            clipped += int(max(-dk[pp, rows].min(),
                               dk[pp, rows].max()) + 1 > kh_max)
            rh, rv = 2 * kh + 2, 2 * kv + 2
            band = (row_block + 2 * kv + 2) / row_block
            frac = row_block / h
            exact += frac * (rh * band + rh * rv * 2.25)
            sep += frac * (rh * band * 3.25 + rv * 2.25)
    # gather cap cost: measured 24.25ms for full 320-row render
    cap_ms = 24.25 * (2 * cap) / h
    return exact * op_us / 1000, sep * op_us / 1000, cap_ms, clipped


def cost_report():
    h, w = 320, 640
    radii = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, 32))
    eye = jnp.eye(4)
    intr = jnp.eye(3).at[0, 0].set(0.032)
    cases = []
    for name, pos in [("bench[.05,0,0]", [0.05, 0.0, 0.0]),
                      ("diag[.05]*3", [0.05, 0.05, 0.05])]:
        cases.append((name, intersect.intersect_sphere(
            eye, jnp.asarray(pos), radii, w, h)))
    cases.append(("ods+1", intersect.intersect_ods(
        eye, jnp.zeros(3), 1, intr, radii, w, h)))
    for name, uv in cases:
        for rb in (16, 32):
            for cap in (8, 16, 32):
                e, s, c, clip = kernel_cost(uv, h, w, row_block=rb, cap=cap)
                print(f"{name:16s} rb={rb:2d} cap={cap:2d} "
                      f"exact={e:5.2f}+cap{c:4.2f}={e+c:5.2f}ms  "
                      f"sep={s:4.2f}+cap={s+c:5.2f}ms  clipped_blocks={clip}")


if __name__ == "__main__" and "--cost" in __import__("sys").argv:
    cost_report()
