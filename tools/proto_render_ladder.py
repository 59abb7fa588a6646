"""Numpy prototype / spec of the Pallas ladder render kernel.

Validates the roll-ladder algebra that ops/pallas_render.py implements:

  out(i,j) = bilinear_wrap(L, u(i,j), v(i,j))
           = sum_m cv_m(i,j) * sum_k ch_k(i,j) * Lf_pad[i+m, j+k]

with Lf the horizontally FLIPPED source (the ERP->ERP warp is a reversed
ramp: u ~ (W-1-j) - parallax), integer residuals
  dk = W-1-floor(u)-j   (horizontal, circular)
  dy = floor(v)-i       (vertical)
and combined bilinear rung coefficients
  ch_k = (1-fx)*[dk==k] + fx*[dk==k+1]
  cv_m = (1-fy)*[dy==m] + fy*[dy==m-1].

Modes:
  exact     — full 2D rung product (bit-equal to the gather path).
  separable — V-pass with output-pixel weights at original columns, then
              the H-ladder on the blended rows (the kernel's fast mode).
              Deviation: vertical weights ride at column j instead of
              j+dk; bounded by |dk|*d(v)/dj, measured here per latitude.

Run: JAX_PLATFORMS=cpu PYTHONPATH=. python tools/proto_render_ladder.py
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from matryodshka_tpu.geometry import intersect
from matryodshka_tpu.geometry import sweep as sweep_lib
from matryodshka_tpu.ops.resample import bilinear_wrap_resample


def ladder_render(layer, u, v, mode, kh_max=40, kv_max=8):
    """layer [H,W,C]; u,v [H,W]. Returns [H,W,C] float32."""
    h, w, c = layer.shape
    j = np.arange(w)[None, :]
    i = np.arange(h)[:, None]
    lf = layer[:, ::-1]                      # flipped: Lf[:, j'] = L[:, W-1-j']
    x0f = np.floor(u)
    fx = (u - x0f)[..., None]
    dk = (w - 1 - x0f - j + w / 2) % w - w / 2   # circular integer residual
    dk = np.clip(dk, -kh_max, kh_max)
    y0f = np.floor(v)
    fy = (v - y0f)[..., None]
    dy = np.clip(y0f - i, -kv_max, kv_max)

    # vertically padded-with-wrap flipped source
    pad = kv_max + 2
    lf_pad = np.concatenate([lf[-pad:], lf, lf[:pad]], axis=0)

    def band_row(m):
        # rows i+m for all i, from the padded copy
        return lf_pad[pad + m: pad + m + h]

    if mode == "exact":
        out = np.zeros_like(layer, dtype=np.float64)
        for m in range(-kv_max, kv_max + 2):
            cv = (1 - fy) * (dy == m)[..., None] + fy * (dy == m - 1)[..., None]
            if not cv.any():
                continue
            rowm = band_row(m)
            for k in range(-kh_max, kh_max + 2):
                ch = ((1 - fx) * (dk == k)[..., None]
                      + fx * (dk == k + 1)[..., None])
                if not (cv * ch).any():
                    continue
                out += cv * ch * np.roll(rowm, -k, axis=1)
        return out.astype(np.float32)

    assert mode == "separable"
    vb = np.zeros_like(layer, dtype=np.float64)
    for m in range(-kv_max, kv_max + 2):
        cv = (1 - fy) * (dy == m)[..., None] + fy * (dy == m - 1)[..., None]
        if cv.any():
            vb += cv * band_row(m)
    out = np.zeros_like(layer, dtype=np.float64)
    for k in range(-kh_max, kh_max + 2):
        ch = (1 - fx) * (dk == k)[..., None] + fx * (dk == k + 1)[..., None]
        if ch.any():
            out += ch * np.roll(vb, -k, axis=1)
    return out.astype(np.float32)


def main():
    h, w, cap = 320, 640, 16
    rng = np.random.RandomState(0)
    radii = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, 32))
    eye = jnp.eye(4)
    layer = rng.rand(h, w, 4).astype(np.float32)

    for name, pos in [("bench[.05,0,0]", [0.05, 0.0, 0.0]),
                      ("diag[.04]*3", [0.04, 0.04, 0.04])]:
        uv = np.asarray(intersect.intersect_sphere(
            eye, jnp.asarray(pos), radii, w, h))
        print(f"=== {name}")
        for p in (0, 16, 28, 31):
            u, v = uv[p, ..., 0], uv[p, ..., 1]
            ref = np.asarray(bilinear_wrap_resample(
                jnp.asarray(layer), jnp.asarray(uv[p])))
            ex = ladder_render(layer, u, v, "exact")
            sep = ladder_render(layer, u, v, "separable")
            mid = slice(cap, h - cap)
            err_e = np.abs(ex - ref)[mid].max()
            err_s = np.abs(sep - ref)[mid].max()
            # deviation by latitude band of the separable mode
            bands = [np.abs(sep - ref)[b:b + 32].max()
                     for b in range(cap, h - cap, 32)]
            print(f"  p={p:2d} exact_err={err_e:.2e} sep_err={err_s:.3e} "
                  f"sep_by_band={[f'{b:.3f}' for b in bands]}")


if __name__ == "__main__":
    main()
