"""Generate tests/goldens/reference_goldens.npz from tools/reference_numpy.

Deterministic inputs, pure numpy (no matryodshka_tpu imports) — the
goldens are an independent second derivation of the reference's math.
Run: python tools/gen_reference_goldens.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import reference_numpy as ref  # noqa: E402

F = np.float32


def main():
    rng = np.random.RandomState(20260816)
    out = {}

    h, w, p = 32, 64, 6
    depths = np.asarray(ref.inv_depths(1.0, 100.0, p), dtype=F)
    out["inv_depths_32"] = np.asarray(ref.inv_depths(1.0, 100.0, 32),
                                      dtype=F)
    intr = np.eye(3, dtype=F)[None]
    intr[:, 0, 0] = 0.032

    S, T = ref.lat_long_grid((h, w))
    out["lat_long_S"] = S
    out["lat_long_T"] = T
    U, V = ref.uv_grid((h, w))
    out["uv_grid_U"] = U
    out["uv_grid_V"] = V

    pts = ref.backproject_spherical(S, T, depths)
    out["backproject_spherical"] = np.stack(pts)

    for order in (1, -1):
        out[f"project_ods_{'l' if order == 1 else 'r'}"] = ref.project_ods(
            pts, order, intr, w, h)
    out["project_spherical"] = ref.project_spherical(pts, w, h)

    # intersections: identity + translated + (jitter-scale) rotated poses
    radii = depths
    def pose_rt(angles, t):
        cx, cy, cz = np.cos(angles)
        sx, sy, sz = np.sin(angles)
        Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], dtype=F)
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], dtype=F)
        Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]], dtype=F)
        m = np.eye(4, dtype=F)
        m[:3, :3] = Rz @ Ry @ Rx
        m[:3, 3] = t
        return m

    eye4 = np.eye(4, dtype=F)
    jit = pose_rt(np.asarray([0.02, -0.015, 0.025], dtype=F),
                  np.asarray([0.004, -0.006, 0.008], dtype=F))
    out["jitter_pose"] = jit
    for name, pose, center in [
            ("id_offs", eye4, np.asarray([0.05, -0.02, 0.03], dtype=F)),
            ("jit_offs", jit, np.asarray([-0.04, 0.01, 0.06], dtype=F))]:
        out[f"intersect_sphere_{name}"] = ref.intersect_sphere(
            pose, center, radii, w, h)
    out["intersect_ods_l"] = ref.intersect_ods(eye4, 1, intr, radii, w, h)
    out["intersect_ods_jit_r"] = ref.intersect_ods(jit, -1, intr, radii,
                                                   w, h)
    out["intersect_persp"] = ref.intersect_perspective(
        eye4, np.asarray([0.02, -0.01, 0.04], dtype=F), radii, w, h,
        tgt_width=32, tgt_height=16)

    # wrap resample on random data / random (out-of-range) coords
    img = rng.rand(2, h, w, 3).astype(F)
    coords = np.stack([rng.uniform(-5, w + 5, (2, 10, 12)),
                       rng.uniform(-5, h + 5, (2, 10, 12))],
                      axis=-1).astype(F)
    out["resample_img"] = img
    out["resample_coords"] = coords
    out["resample_out"] = ref.resample(img, coords)

    # full ODS sweep, both eyes, identity pose
    image = rng.rand(1, h, w, 3).astype(F)
    pose1 = eye4[None]
    out["sweep_image"] = image
    out["sweep_l"] = ref.ods_sphere_sweep(image, 1, depths, pose1, intr)
    out["sweep_r"] = ref.ods_sphere_sweep(image, -1, depths, pose1, intr)

    # renders + composites
    rgba = rng.rand(h, w, p, 4).astype(F)
    out["render_rgba"] = rgba
    out["render_equirect"] = ref.render_equirect(
        rgba, eye4, np.asarray([0.05, -0.02, 0.03], dtype=F), radii)
    out["render_ods_l"] = ref.render_ods(rgba, 1, eye4, intr, radii)
    layers = [rgba[None, :, :, i, :] for i in range(p)]
    out["over_composite"] = ref.over_composite(layers)
    out["over_composite_depth"] = ref.over_composite_depth(layers)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens",
        "reference_goldens.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    total = sum(v.nbytes for v in out.values())
    print(f"wrote {path}: {len(out)} arrays, {total/1e6:.2f} MB raw")


if __name__ == "__main__":
    main()
