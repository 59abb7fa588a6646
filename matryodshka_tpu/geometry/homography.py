"""Planar homography path (stereo-magnification legacy, PP / RealEstate10K).

Math parity targets in the reference:
  * inv_homography        — geometry/homography.py:35-58
  * transform_points / normalize_homogeneous — geometry/homography.py:60-94
  * planar_transform      — geometry/homography.py:120-157
  * projective_forward_homography — geometry/projector.py:343-373
  * plane_sweep / projective_inverse_warp / pixel2cam / cam2pixel /
    meshgrid_abs — geometry/projector.py:375-499

NOTE on pixel convention: the reference documents a known half-pixel bug in
this path (projector.py:336-342) — projection assumes pixel centers at
integer coordinates over [0, W-1] x [0, H-1]. We reproduce that exact
convention for parity.

Everything is vectorized over the plane axis; the per-depth Python loop of
plane_sweep (projector.py:389-393) becomes one [P]-batched warp. Sampling
uses zero-outside-boundary bilinear (tf.contrib.resampler semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from matryodshka_tpu.ops.resample import bilinear_zero_resample

Array = jax.Array


def _divide_safe(num, den, eps: float = 1e-8):
    den = den + eps * (den == 0.0).astype(num.dtype)
    return num / den


def inv_homography(k_s: Array, k_t_inv: Array, rot: Array, t: Array,
                   n_hat: Array, a: Array) -> Array:
    """Inverse homography (target pixel -> source pixel) via a plane.

    k_s: [..., 3, 3]; k_t_inv: [..., 3, 3] (explicit argument — the
    reference smuggles it through the graph as 'intrinsics_inv:0');
    rot: [..., 3, 3]; t: [..., 3, 1]; n_hat: [..., 1, 3]; a: [..., 1, 1].
    """
    rot_t = jnp.swapaxes(rot, -1, -2)
    denom = a - n_hat @ rot_t @ t
    numerator = rot_t @ t @ n_hat @ rot_t
    return k_s @ (rot_t + _divide_safe(numerator, denom)) @ k_t_inv


def transform_points(points: Array, homography: Array) -> Array:
    """Apply [..., 3, 3] homographies to [..., H, W, 3] (u, v, 1) points."""
    orig_shape = points.shape
    batch_shape = homography.shape[:-2]
    pts = points.reshape(batch_shape + (-1, 3))
    out = pts @ jnp.swapaxes(homography, -1, -2)
    return out.reshape(orig_shape)


def normalize_homogeneous(points: Array) -> Array:
    uv = points[..., :-1]
    w = points[..., -1:]
    return _divide_safe(uv, w)


def meshgrid_abs(height: int, width: int) -> Array:
    """[3, H, W] homogeneous integer-centered pixel grid
    (projector.py:478-499, including its half-pixel convention)."""
    xs = jnp.linspace(0.0, width - 1.0, width)
    ys = jnp.linspace(0.0, height - 1.0, height)
    X, Y = jnp.meshgrid(xs, ys)
    return jnp.stack([X, Y, jnp.ones_like(X)], axis=0)


def planar_transform(imgs: Array, k_s: Array, k_t_inv: Array, rot: Array,
                     t: Array, n_hat: Array, a: Array) -> Array:
    """Warp per-layer images by per-layer plane homographies.

    imgs: [P, H, W, C]; k_s/k_t_inv: [3, 3]; rot: [3, 3]; t: [3, 1];
    n_hat: [P, 1, 3]; a: [P, 1, 1]. Single example — vmap for batch.
    Returns [P, H, W, C] warped into the target frame.
    """
    p, h, w, _ = imgs.shape
    hom = inv_homography(k_s[None], k_t_inv[None], rot[None], t[None],
                         n_hat, a)  # [P, 3, 3]
    grid = jnp.transpose(meshgrid_abs(h, w), (1, 2, 0))  # [H, W, 3]
    grid = jnp.broadcast_to(grid, (p, h, w, 3))
    coords = normalize_homogeneous(transform_points(grid, hom))
    return jax.vmap(bilinear_zero_resample)(imgs, coords)


def projective_forward_homography(src_images: Array, intrinsics: Array,
                                  intrinsics_inv: Array, pose: Array,
                                  depths: Array) -> Array:
    """Forward-warp MPI layers into a target view via homographies.

    src_images: [P, H, W, C] (one example); pose: [4, 4] source-to-target;
    depths: [P]. Mirrors projector.py:343-373 (n_hat = +z, a = -depth).
    """
    p = src_images.shape[0]
    rot = pose[:3, :3]
    t = pose[:3, 3:]
    n_hat = jnp.broadcast_to(jnp.array([[0.0, 0.0, 1.0]]), (p, 1, 3))
    a = -depths.reshape(p, 1, 1)
    return planar_transform(src_images, intrinsics, intrinsics_inv, rot, t,
                            n_hat, a)


def projective_inverse_warp(img: Array, depth: Array, pose: Array,
                            intrinsics: Array, intrinsics_inv: Array
                            ) -> Array:
    """Inverse-warp one source image to the target plane at one depth.

    img: [H, W, C]; depth: scalar; pose: [4, 4] target-to-source.
    (projector.py:397-433 + pixel2cam/cam2pixel.)
    """
    h, w, _ = img.shape
    grid = meshgrid_abs(h, w).reshape(3, -1)  # [3, H*W]
    cam = (intrinsics_inv @ grid) * depth
    cam_h = jnp.concatenate([cam, jnp.ones((1, h * w))], axis=0)
    K4 = jnp.zeros((4, 4)).at[:3, :3].set(intrinsics).at[3, 3].set(1.0)
    proj = K4 @ pose
    pix = proj @ cam_h
    uv = pix[0:2] / (pix[2:3] + 1e-10)
    coords = jnp.transpose(uv, (1, 0)).reshape(h, w, 2)
    return bilinear_zero_resample(img, coords)


def plane_sweep(image: Array, depths: Array, pose: Array,
                intrinsics: Array) -> Array:
    """Plane-sweep volume via inverse homography warps.

    image: [B, H, W, C]; depths: [P]; pose: [B, 4, 4] target-to-source.
    Returns [B, H, W, P*C] plane-major (projector.py:375-395).
    """
    b, h, w, c = image.shape
    p = depths.shape[0]
    K_inv = jnp.linalg.inv(intrinsics)

    def one(img, po, K, Ki):
        warped = jax.vmap(
            lambda d: projective_inverse_warp(img, d, po, K, Ki))(depths)
        return jnp.transpose(warped, (1, 2, 0, 3)).reshape(h, w, p * c)

    return jax.vmap(one)(image, pose, intrinsics, K_inv)


def mpi_render_view(rgba_layers: Array, tgt_pose: Array, depths: Array,
                    intrinsics: Array) -> Array:
    """Render a perspective view from an MPI (msi.py:527-548).

    rgba_layers: [H, W, P, 4]; tgt_pose: [4, 4] relative pose.
    """
    from matryodshka_tpu.geometry.render import over_composite
    layers = jnp.moveaxis(rgba_layers, 2, 0)
    k_inv = jnp.linalg.inv(intrinsics)
    proj = projective_forward_homography(layers, intrinsics, k_inv,
                                         tgt_pose, depths)
    return over_composite(jnp.moveaxis(proj, 0, 2))
