"""Icosphere generation + GCN head tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matryodshka_tpu.config import MatryConfig
from matryodshka_tpu.geometry import icosphere
from matryodshka_tpu.models import gcn as gcn_lib
from matryodshka_tpu.models import msi as msi_lib
from matryodshka_tpu.geometry import sweep as sweep_lib


def test_icosphere_counts():
    for s, v_expected in ((0, 12), (1, 42), (2, 162), (3, 642)):
        verts, faces = icosphere.icosphere(s)
        assert len(verts) == v_expected == 10 * 4 ** s + 2
        assert len(faces) == 20 * 4 ** s
        np.testing.assert_allclose(np.linalg.norm(verts, axis=1), 1.0,
                                   rtol=1e-6)


def test_support_matrices():
    verts, faces = icosphere.icosphere(1)
    supports = icosphere.support_matrices(verts, faces)
    assert len(supports) == 2
    r0, c0, v0 = supports[0]
    np.testing.assert_array_equal(r0, c0)  # identity
    r1, c1, v1 = supports[1]
    # each vertex has 5 or 6 neighbors
    deg = np.bincount(r1)
    assert set(deg.tolist()) <= {5, 6}
    # values are exactly 1/sqrt(deg_r * deg_c)
    np.testing.assert_allclose(v1, 1.0 / np.sqrt(deg[r1] * deg[c1]),
                               rtol=1e-6)
    # symmetric
    fwd = set(zip(r1.tolist(), c1.tolist()))
    assert all((c, r) in fwd for r, c in fwd)


def test_p2v_partition_of_unity():
    verts, faces = icosphere.icosphere(2)
    h, w = 8, 16
    p2v = icosphere.pixel_to_vertex_lookup(verts, faces, h, w)
    assert p2v.shape == (w, h, 3, 2)
    wts = p2v[..., 1]
    np.testing.assert_allclose(wts.sum(-1), 1.0, atol=1e-5)
    assert wts.min() >= -1e-6
    ids = p2v[..., 0].astype(int)
    assert ids.min() >= 0 and ids.max() < len(verts)


def test_mesh_to_equirect_constant_function():
    """A constant per-vertex signal must scatter to a constant image."""
    verts, faces = icosphere.icosphere(2)
    h, w = 8, 16
    p2v = jnp.asarray(icosphere.pixel_to_vertex_lookup(verts, faces, h, w))
    colors = jnp.ones((len(verts), 5)) * 0.37
    img = gcn_lib.mesh_to_equirect(colors, p2v)
    assert img.shape == (1, h, w, 5)
    np.testing.assert_allclose(np.asarray(img), 0.37, rtol=1e-5)


def test_mesh_to_equirect_linear_function():
    """Barycentric interpolation reproduces linear-in-direction signals
    up to the gnomonic projection's curvature error."""
    verts, faces = icosphere.icosphere(3)
    h, w = 16, 32
    p2v = jnp.asarray(icosphere.pixel_to_vertex_lookup(verts, faces, h, w))
    colors = jnp.asarray(verts[:, 1:2])  # f(v) = y
    img = np.asarray(gcn_lib.mesh_to_equirect(colors, p2v))[0, :, :, 0]
    from matryodshka_tpu.geometry.grids import lat_long_grid
    S, T = lat_long_grid((h, w))
    expected = np.asarray(jnp.sin(T))
    np.testing.assert_allclose(img, expected, atol=0.05)


def test_gcn_net_shapes_and_smoothing():
    verts, faces = icosphere.icosphere(2)
    sups = [gcn_lib.SparseSupport(*s, num_verts=len(verts))
            for s in icosphere.support_matrices(verts, faces)]
    net = gcn_lib.GCNNet(num_outputs=8, supports=sups, ngf=16)
    x = jnp.asarray(np.random.RandomState(0).rand(len(verts), 24)
                    .astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(params, x)
    assert y.shape == (len(verts), 8)
    assert np.abs(np.asarray(y)).max() <= 1.0


def test_sparse_support_matmul():
    verts, faces = icosphere.icosphere(1)
    rows, cols, vals = icosphere.support_matrices(verts, faces)[1]
    sup = gcn_lib.SparseSupport(rows, cols, vals, len(verts))
    x = jnp.asarray(np.random.RandomState(1).rand(len(verts), 3)
                    .astype(np.float32))
    got = np.asarray(sup.matmul(x))
    dense = np.zeros((len(verts), len(verts)), np.float32)
    dense[rows, cols] = vals
    np.testing.assert_allclose(got, dense @ np.asarray(x), rtol=1e-5,
                               atol=1e-6)


def test_infer_gcn_msi_end_to_end():
    cfg = MatryConfig(height=16, width=32, num_psv_planes=3,
                      num_msi_planes=3, ngf=8, batch_size=1,
                      gcn=True, subdiv=2).validate()
    verts, faces = icosphere.icosphere(2)
    sups = [gcn_lib.SparseSupport(*s, num_verts=len(verts))
            for s in icosphere.support_matrices(verts, faces)]
    p2v = jnp.asarray(icosphere.pixel_to_vertex_lookup(
        verts, faces, cfg.height, cfg.width))
    net = gcn_lib.GCNNet(num_outputs=cfg.num_net_outputs(), supports=sups,
                         ngf=cfg.ngf)
    x0 = jnp.zeros((len(verts), cfg.num_net_inputs()))
    params = net.init(jax.random.PRNGKey(0), x0)

    rng = np.random.RandomState(0)
    eye = jnp.tile(jnp.eye(4)[None], (1, 1, 1))
    intr = jnp.tile(jnp.asarray([[0.032, 0, 0], [0, 1, 0], [0, 0, 1.0]],
                                dtype=jnp.float32)[None], (1, 1, 1))
    batch = {
        "ref_image": jnp.asarray(rng.rand(1, 16, 32, 3).astype(np.float32)),
        "src_image": jnp.asarray(rng.rand(1, 16, 32, 3).astype(np.float32)),
        "ref_pose": eye, "src_pose": eye, "ref_pose_inv": eye,
        "intrinsics": intr,
    }
    depths = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, 3))
    outputs = msi_lib.infer_gcn_msi(net.apply, params, cfg, batch, depths,
                                    jnp.asarray(verts), p2v)
    rgba = outputs["rgba_layers"]
    assert rgba.shape == (1, 16, 32, 3, 4)
    assert np.isfinite(np.asarray(rgba)).all()


def test_load_mesh_input_cache(tmp_path):
    coords, sups, p2v = icosphere.load_mesh_input(1, 8, 16,
                                                  str(tmp_path))
    coords2, sups2, p2v2 = icosphere.load_mesh_input(1, 8, 16,
                                                     str(tmp_path))
    np.testing.assert_array_equal(coords, coords2)
    np.testing.assert_array_equal(p2v, p2v2)
    assert len(sups) == len(sups2) == 2


def test_gcn_train_step(tmp_path):
    """One optimizer step through the GCN path decreases loss."""
    import jax as _jax
    from matryodshka_tpu.training import state as state_lib
    from matryodshka_tpu.training.step import make_train_step

    cfg = MatryConfig(height=16, width=32, num_psv_planes=3,
                      num_msi_planes=3, ngf=8, batch_size=1, gcn=True,
                      subdiv=2, mesh_dir=str(tmp_path),
                      compute_dtype="float32").validate()
    state, model = state_lib.init_state(cfg, _jax.random.PRNGKey(0))
    _, coords, p2v = state_lib.build_gcn(cfg)
    tx = state_lib.build_optimizer(cfg)
    step_fn = make_train_step(cfg, model.apply, tx,
                              gcn_inputs=(coords, p2v), donate=False)
    rng = np.random.RandomState(0)
    eye = jnp.tile(jnp.eye(4)[None], (1, 1, 1))
    intr = jnp.tile(jnp.asarray([[0.032, 0, 0], [0, 1, 0], [0, 0, 1.0]],
                                dtype=jnp.float32)[None], (1, 1, 1))
    batch = {
        "ref_image": jnp.asarray(rng.rand(1, 16, 32, 3).astype(np.float32)),
        "src_image": jnp.asarray(rng.rand(1, 16, 32, 3).astype(np.float32)),
        "tgt_image": jnp.asarray(rng.rand(1, 16, 32, 3).astype(np.float32)),
        "ref_pose": eye, "src_pose": eye, "ref_pose_inv": eye,
        "tgt_pose": jnp.asarray([[0.03, 0.0, 0.0]]),
        "intrinsics": intr,
    }
    losses = []
    for i in range(3):
        state, metrics = step_fn(state, batch, _jax.random.PRNGKey(i))
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_p2v_vectorized_matches_loop_reference():
    """The batched pixel_to_vertex_lookup reproduces the per-pixel loop
    (same candidate order, first-hit/best-min selection) exactly."""
    from matryodshka_tpu.geometry import icosphere as ico
    verts, faces = ico.icosphere(2)
    fast = ico.pixel_to_vertex_lookup(verts, faces, 24, 48)
    slow = ico._pixel_to_vertex_lookup_loop(verts, faces, 24, 48)
    np.testing.assert_array_equal(fast[..., 0], slow[..., 0])
    np.testing.assert_allclose(fast[..., 1], slow[..., 1], atol=1e-6)


def test_p2v_subdiv4_fast_smoke():
    """Generation at a real subdivision level must be fast (the loop
    version took minutes here, hours at subdiv 7)."""
    import time
    from matryodshka_tpu.geometry import icosphere as ico
    verts, faces = ico.icosphere(4)
    t0 = time.time()
    p2v = ico.pixel_to_vertex_lookup(verts, faces, 80, 160)
    dt = time.time() - t0
    assert dt < 30.0, dt
    assert p2v.shape == (160, 80, 3, 2)
    w = p2v[..., 1]
    np.testing.assert_allclose(w.sum(axis=-1), 1.0, atol=1e-5)
    assert (w >= 0).all()
