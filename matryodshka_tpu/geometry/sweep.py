"""Sphere-sweep / plane-sweep volume construction.

Replaces the reference's per-batch, per-plane Python graph loops
(geometry/projector.py:129-223) with a single vectorized pipeline: for one
example, all P planes' backprojection, pose transform, projection and
gather happen as [P, H, W] array math compiled to a handful of fused XLA
ops; batching is jax.vmap.

Channel layout contract (load-bearing for the CNN and layer assembly):
a sweep of a 3-channel image over P planes yields [B, H, W, P*3] with
plane-major RGB triples — plane p occupies channels [3p, 3p+3), matching
projector.py:163-169 + msi.py:137.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from matryodshka_tpu.geometry import cameras, grids
from matryodshka_tpu.ops.resample import (resample_layers,
                                            resample_stack)

Array = jax.Array


def _sweep_coords(shape, order: int, depths: Array, pose: Array,
                  intrinsics: Array, st_fn, backproject_fn,
                  project_fn) -> Array:
    """Lookup coordinates for one example's sweep: [P, H, W, 2]."""
    h, w = shape
    S, T = st_fn((h, w))
    points = backproject_fn(S, T, depths, intrinsics)
    points = cameras.apply_pose(points, pose)
    return project_fn(points, order, pose, intrinsics, w, h)


def _sweep_batch(image: Array, order: int, depths: Array, pose: Array,
                 intrinsics: Array, st_fn, backproject_fn, project_fn,
                 use_pallas: bool = False) -> Array:
    """Sweep a [B, H, W, C] batch -> [B, H, W, P*C].

    Coordinates are vmapped (cheap elementwise math); the gather runs
    UNBATCHED through resample_layers — a vmapped gather falls off XLA's
    fast row-copy path on TPU (measured ~2x slower), so the batch axis is
    folded into the table axis instead.
    """
    b, h, w, c = image.shape
    p = depths.shape[0]
    uv = jax.vmap(lambda po, K: _sweep_coords(
        (h, w), order, depths, po, K, st_fn, backproject_fn, project_fn)
    )(pose, intrinsics)                       # [B, P, H, W, 2]
    vol = resample_layers(image, uv)          # [B, P, H, W, C]
    return jnp.transpose(vol, (0, 2, 3, 1, 4)).reshape(b, h, w, p * c)


def ods_sphere_sweep(image: Array, order: int, depths: Array, pose: Array,
                     intrinsics: Array, use_pallas: bool = False) -> Array:
    """ODS sphere sweep of a batch of ERP images.

    Args:
      image: [B, H, W, C]; order: +1 ref eye / -1 src eye;
      depths: [P]; pose: [B, 4, 4]; intrinsics: [B, 3, 3]
      (intrinsics[:, 0, 0] is the ODS circle radius).
    Returns:
      [B, H, W, P*C] sphere-sweep volume. (projector.py:209-211)
    """
    return _sweep_batch(image, order, depths, pose, intrinsics,
                        grids.lat_long_grid,
                        cameras.backproject_spherical,
                        cameras.project_ods, use_pallas=use_pallas)


def ods_centered_sphere_sweep(image: Array, order: int, depths: Array,
                              pose: Array, intrinsics: Array,
                              use_pallas: bool = False) -> Array:
    """Sphere sweep with a centered (non-ODS) spherical projection
    (projector.py:213-215; used by sweep_ref)."""
    return _sweep_batch(image, order, depths, pose, intrinsics,
                        grids.lat_long_grid,
                        cameras.backproject_spherical,
                        cameras.project_spherical, use_pallas=use_pallas)


def perspective_plane_sweep(image: Array, order: int, depths: Array,
                            pose: Array, intrinsics: Array,
                            use_pallas: bool = False) -> Array:
    """Fronto-parallel plane sweep with pinhole projection
    (projector.py:221-223)."""
    return _sweep_batch(image, order, depths, pose, intrinsics,
                        grids.uv_grid, cameras.backproject_planar,
                        cameras.project_perspective,
                        use_pallas=use_pallas)


def gcn_sphere_sweep(image: Array, order: int, depths: Array, coords: Array,
                     pose: Array, intrinsics: Array) -> Array:
    """Sphere sweep sampled at icosphere vertices instead of the pixel grid.

    Args:
      image: [B, H, W, C]; coords: [V, 3] unit-sphere vertex positions;
      depths: [P]; pose: [B, 4, 4]; intrinsics: [B, 3, 3].
    Returns:
      [B, V, P*C] per-vertex sweep features (projector.py:172-207 squeezed).

    Note the reference feeds packed vertex tensors through project_ods,
    which negates y for tensors (spherical.py:172-175) — reproduced via
    negate_y=True.
    """
    b, h, w, c = image.shape
    p = depths.shape[0]

    def one(im, po, K):
        pts = coords.T  # [3, V]
        pts = depths[:, None, None] * pts[None]  # [P, 3, V]
        x, y, z = pts[:, 0, :], pts[:, 1, :], pts[:, 2, :]
        uv = cameras.project_ods((x[:, :, None], y[:, :, None],
                                  z[:, :, None]), order, po, K, w, h,
                                 negate_y=True)  # [P, V, 1, 2]
        vol = resample_stack(im, uv, wrap=True)  # [P, V, 1, C]
        return jnp.transpose(vol[:, :, 0, :], (1, 0, 2)).reshape(-1, p * c)

    return jax.vmap(one)(image, pose, intrinsics)


def format_network_input(ref_image: Array, src_image: Array,
                         ref_pose: Array, src_pose: Array,
                         ref_pose_inv: Array, depths: Array,
                         intrinsics: Array, input_type: str = "ODS",
                         jitter_pose_inv: Array | None = None,
                         use_pallas: bool = False,
                         out_dtype=None) -> Array:
    """Double sweep: ref eye order=+1, src eye order=-1, concat on channels.

    Mirrors matryodshka/msi.py:1094-1130: each source's sweep pose is
    (source_pose @ ref_pose_inv [@ jitter_pose_inv]).

    Returns [B, H, W, 2*P*3].
    """
    if jitter_pose_inv is not None:
        ref_pose_inv = jnp.einsum("bij,bjk->bik", ref_pose_inv,
                                  jitter_pose_inv)

    # Fast fused path: ODS loaders hardcode identity ref/src poses
    # (data_loader.py:146-157), so without jitter the sweep pose is
    # exactly identity and the row-separable Pallas kernel applies.
    if (use_pallas and input_type == "ODS" and jitter_pose_inv is None
            and jax.default_backend() == "tpu"):
        from matryodshka_tpu.ops import pallas_sweep
        dt = out_dtype or jnp.float32
        vols = [pallas_sweep.ods_sweep_identity(ref_image, 1, depths,
                                                intrinsics, out_dtype=dt),
                pallas_sweep.ods_sweep_identity(src_image, -1, depths,
                                                intrinsics, out_dtype=dt)]
        return jnp.concatenate(vols, axis=-1)

    sweep = (ods_sphere_sweep if input_type == "ODS"
             else perspective_plane_sweep)
    vols = []
    for i, (img, pose) in enumerate(((ref_image, ref_pose),
                                     (src_image, src_pose))):
        order = 1 if i % 2 == 0 else -1
        cur_pose = jnp.einsum("bij,bjk->bik", pose, ref_pose_inv)
        vols.append(sweep(img, order, depths, cur_pose, intrinsics,
                          use_pallas=use_pallas))
    out = jnp.concatenate(vols, axis=-1)
    return out.astype(out_dtype) if out_dtype is not None else out


def format_realestate_network_input(ref_image: Array, src_image: Array,
                                    ref_pose: Array, src_pose: Array,
                                    depths: Array, intrinsics: Array,
                                    jitter_pose_inv: Array | None = None
                                    ) -> Array:
    """RealEstate10K MPI input: ref image + homography plane sweeps of both
    sources (msi.py:1024-1059). Returns [B, H, W, 3 + 2*P*3]."""
    from matryodshka_tpu.geometry.homography import plane_sweep
    ref_pose_inv = jnp.linalg.inv(ref_pose)
    if jitter_pose_inv is not None:
        ref_pose_inv = jnp.einsum("bij,bjk->bik", ref_pose_inv,
                                  jitter_pose_inv)
    parts = [ref_image]
    for pose, img in ((ref_pose, ref_image), (src_pose, src_image)):
        cur_pose = jnp.einsum("bij,bjk->bik", pose, ref_pose_inv)
        parts.append(plane_sweep(img, depths, cur_pose, intrinsics))
    return jnp.concatenate(parts, axis=-1)


def inv_depths(start_depth: float, end_depth: float, num_depths: int):
    """Inverse-depth-uniform samples, sorted descending (far -> near).

    Matches matryodshka/msi.py:1196-1217 exactly, including the inclusion
    of both endpoints. Returns a Python list of floats (static for jit).
    """
    inv_start = 1.0 / start_depth
    inv_end = 1.0 / end_depth
    depths = [start_depth, end_depth]
    for i in range(1, num_depths - 1):
        fraction = float(i) / float(num_depths - 1)
        depths.append(1.0 / (inv_start + (inv_end - inv_start) * fraction))
    return sorted(depths)[::-1]
