"""Production-shape exactness: pallas-vs-gather at 640x320x32 ON TPU.

Graduates the bench's exactness print into a regression test (VERDICT
round-2 item 5): at f32 the ladder render must match the gather path to
1e-5; the bf16-prepared pipeline's delta is recorded and bounded by the
storage quantization budget.

Under pytest this SKIPS (tests/conftest.py forces the CPU backend);
run it on the TPU environment directly:

    python tests/test_tpu_fullres.py
"""

import sys

import numpy as np
import pytest


def _backend():
    import jax
    return jax.default_backend()


def run_checks():
    import jax
    import jax.numpy as jnp

    from matryodshka_tpu.geometry import render as render_lib
    from matryodshka_tpu.geometry import sweep as sweep_lib
    from matryodshka_tpu.models import msi as msi_lib

    H, W, P = 320, 640, 32
    rng = np.random.RandomState(0)
    rgba = jnp.asarray(rng.rand(H, W, P, 4).astype(np.float32))
    radii = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, P))
    pose = jnp.eye(4)
    tgt = jnp.asarray([0.032, 0.01, -0.02])

    ref = np.asarray(jax.jit(
        lambda r: render_lib.render_equirect_view(r, pose, tgt, radii)
    )(rgba))

    # f32 fused path
    got32 = np.asarray(jax.jit(
        lambda r: render_lib.render_equirect_view(r, pose, tgt, radii,
                                                  use_pallas=True)
    )(rgba))
    err32 = float(np.max(np.abs(got32 - ref)))
    print(f"[fullres] f32 pallas-vs-gather max err: {err32:.3e}")
    assert err32 <= 1e-5, err32

    # bf16 storage path (the production prepared pipeline's dtype)
    got16 = np.asarray(jax.jit(
        lambda r: render_lib.render_equirect_view(
            r, pose, tgt, radii, use_pallas=True,
            pallas_opts={"dtype": jnp.bfloat16})
    )(rgba))
    err16 = float(np.max(np.abs(got16 - ref)))
    print(f"[fullres] bf16-storage delta: {err16:.3e}")
    assert err16 <= 2e-2, err16  # bf16 quantization budget (~2.6e-3 typ.)

    # a rotation pose must take the gather fallback and stay exact
    ang = 0.4
    rot = jnp.asarray([[1, 0, 0, 0],
                       [0, np.cos(ang), -np.sin(ang), 0],
                       [0, np.sin(ang), np.cos(ang), 0],
                       [0, 0, 0, 1]], dtype=jnp.float32)
    ref_rot = np.asarray(jax.jit(
        lambda r: render_lib.render_equirect_view(r, rot, tgt, radii)
    )(rgba))
    got_rot = np.asarray(jax.jit(
        lambda r: render_lib.render_equirect_view(r, rot, tgt, radii,
                                                  use_pallas=True)
    )(rgba))
    err_rot = float(np.max(np.abs(got_rot - ref_rot)))
    print(f"[fullres] rotation-fallback max err: {err_rot:.3e}")
    assert err_rot <= 1e-5, err_rot
    return err32, err16, err_rot


def test_fullres_exactness_tpu():
    if _backend() != "tpu":
        pytest.skip("needs the real TPU backend")
    run_checks()


if __name__ == "__main__":
    if _backend() != "tpu":
        print(f"backend is {_backend()}, need TPU", file=sys.stderr)
        sys.exit(2)
    run_checks()
    print("fullres exactness: OK")
