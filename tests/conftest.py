"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip hardware isn't available in CI; sharding tests validate the
pjit/shard_map paths on a virtual 8-device CPU mesh instead.
Must set the flags before jax initializes its backends.
"""

import os

# Force CPU: the environment pre-sets JAX_PLATFORMS='axon' (TPU tunnel)
# and a sitecustomize registers that backend in every process, overriding
# the env var — so the config must be updated AFTER importing jax.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache makes repeated test runs much faster.
jax.config.update("jax_compilation_cache_dir", "/tmp/matry_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# ---------------------------------------------------------------------------
# Smoke tier: `pytest -m smoke` runs ONE cheap test per subsystem in well
# under a minute on a 1-CPU box (the full 200-test suite takes >20 min
# there). Curated by node id so the individual test files stay clean;
# picks favor tiny shapes and few jit compiles.
# ---------------------------------------------------------------------------
SMOKE_TESTS = {
    # geometry math
    "test_geometry.py::test_lat_long_grid_endpoints",
    "test_geometry.py::test_inv_depths_reference_spec",
    # committed reference goldens (parity evidence)
    "test_reference_goldens.py::test_inv_depths",
    "test_reference_goldens.py::test_wrap_resample",
    # resampling semantics
    "test_resample.py::test_exact_at_pixel_centers",
    # sphere sweep
    "test_sweep.py::test_centered_sweep_identity_is_flip",
    # model layer
    "test_unet.py::test_assemble_rgba_blend_psv",
    "test_train_smoke.py::test_param_count_reasonable",
    # data pipeline (no jax compiles)
    "test_data.py::test_ods_parser",
    # losses / metrics
    "test_metrics_losses.py::test_psnr_formula",
    "test_metrics_losses.py::test_l2_loss_is_half_sum",
    # elpips subsystem (transforms only; no VGG tower)
    "test_elpips.py::test_transforms_shapes",
    # gcn assets
    "test_gcn.py::test_icosphere_counts",
    # parallel (mesh plumbing only; no 8-dev compile)
    "test_parallel.py::test_mesh_construction",
    # perf-flag config (no jax)
    "test_perf_flags.py::test_valid_flags_round_trip",
    # pallas dispatch guards (no kernel execution)
    "test_pallas_render.py::test_declines_bad_shapes",
    # darc archive (no jax)
    "test_darc_2afc.py::test_darc_roundtrip",
    # tf-checkpoint import conventions
    "test_tf_import.py::test_deconv_kernel_convention",
}


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        # item.nodeid is like "tests/test_x.py::test_y" — match on the
        # "<file>::<name>" suffix so the set stays path-independent.
        parts = item.nodeid.split("/")[-1]
        if parts in SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)
