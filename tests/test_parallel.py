"""Parallelism tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matryodshka_tpu.config import MatryConfig
from matryodshka_tpu.geometry import render as render_lib
from matryodshka_tpu.parallel import dp, mesh as mesh_lib, sharded_render
from matryodshka_tpu.training import state as state_lib

from tests.test_train_smoke import synthetic_batch, tiny_cfg


def test_mesh_construction():
    m = mesh_lib.make_mesh(data=4, shell=2)
    assert m.shape == {"data": 4, "shell": 2}
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(data=16, shell=1)


def test_partial_composite_equals_full():
    rng = np.random.RandomState(0)
    rgba = rng.rand(6, 8, 12, 4).astype(np.float32)
    rgba[:, :, 0, 3] = 1.0  # bake in layer-0 convention
    full = np.asarray(render_lib.over_composite(jnp.asarray(rgba)))
    # split into 4 groups of 3 shells, composite partials, recombine
    Cs, Ts = [], []
    for g in range(4):
        C, T = sharded_render.partial_composite(
            jnp.asarray(rgba[:, :, g * 3:(g + 1) * 3]))
        Cs.append(C)
        Ts.append(T)
    out = np.asarray(sharded_render.combine_partials(
        jnp.stack(Cs), jnp.stack(Ts)))
    np.testing.assert_allclose(out, full, rtol=1e-4, atol=1e-5)


def test_sharded_render_matches_single_device():
    rng = np.random.RandomState(1)
    h, w, p = 16, 32, 8
    rgba = jnp.asarray(rng.rand(h, w, p, 4).astype(np.float32))
    radii = jnp.asarray(np.linspace(100.0, 1.0, p).astype(np.float32))
    pose = jnp.eye(4)
    pos = jnp.asarray([0.03, 0.01, -0.02])

    expected = np.asarray(render_lib.render_equirect_view(
        rgba, pose, pos, radii))

    m = mesh_lib.make_mesh(data=1, shell=8)
    got = np.asarray(sharded_render.render_equirect_view_sharded(
        rgba, pose, pos, radii, m))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_dp_train_step_matches_single_device():
    """A DP-sharded step over 4 devices must produce the same loss and
    parameters as the unsharded step on the same global batch."""
    from matryodshka_tpu.training.step import make_train_step

    cfg = tiny_cfg(batch_size=4)
    batch = synthetic_batch(cfg)

    rng = jax.random.PRNGKey(0)
    state, model = state_lib.init_state(cfg, rng)
    tx = state_lib.build_optimizer(cfg)

    step_single = make_train_step(cfg, model.apply, tx, donate=False)
    s1, m1 = step_single(state, batch, jax.random.PRNGKey(7))

    m = mesh_lib.make_mesh(data=4)
    step_dp = dp.make_dp_train_step(cfg, model.apply, tx, m)
    sharded = dp.shard_batch(batch, m)
    s2, m2 = step_dp(state, sharded, jax.random.PRNGKey(7))

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=1e-4)
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_dp_multi_step_matches_sequential():
    """K steps chained on-device (make_dp_train_multi_step) must match
    K sequential DP dispatches: the per-step RNG folds in-graph off
    state.step in both forms. (Params agree to float32 ulps, not bits —
    the scanned body is a different XLA program and fusion may
    reassociate sums.)"""
    cfg = tiny_cfg(batch_size=2)
    rng = jax.random.PRNGKey(0)
    state, model = state_lib.init_state(cfg, rng)
    tx = state_lib.build_optimizer(cfg)
    m = mesh_lib.make_mesh(data=2)
    base_key = jax.random.PRNGKey(7)

    rs = np.random.RandomState(3)
    batches = []
    ref = synthetic_batch(cfg)
    for _ in range(3):
        b = {k: np.asarray(v) for k, v in ref.items()}
        b["ref_image"] = b["ref_image"] + rs.rand(
            *b["ref_image"].shape).astype(np.float32) * 0.01
        batches.append(b)

    step_dp = dp.make_dp_train_step(cfg, model.apply, tx, m,
                                    donate=False)
    s_seq = state
    seq_losses = []
    for b in batches:
        s_seq, mm = step_dp(s_seq, dp.shard_batch(b, m), base_key)
        seq_losses.append(float(mm["total_loss"]))

    multi = dp.make_dp_train_multi_step(cfg, model.apply, tx, m,
                                        steps_per_call=3, donate=False)
    s_multi, mm = multi(state, dp.stack_batches(batches, m), base_key)

    assert int(s_multi.step) == int(s_seq.step)
    np.testing.assert_array_equal(
        np.asarray(mm["total_loss"]), np.asarray(seq_losses,
                                                 dtype=np.float32))
    for a, b in zip(jax.tree.leaves(s_seq.params),
                    jax.tree.leaves(s_multi.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_loop_steps_per_call_matches_single(tmp_path):
    """The steps_per_call>1 loop path produces the same final params as
    the per-step loop on the same batch stream, and fires summaries and
    a checkpoint."""
    import dataclasses
    import itertools

    from matryodshka_tpu.training import loop as loop_lib

    cfg = tiny_cfg(batch_size=2)
    cfg = dataclasses.replace(
        cfg, max_steps=4, summary_freq=2, save_latest_freq=4,
        checkpoint_dir=str(tmp_path), experiment_name="spc").validate()
    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    tx = state_lib.build_optimizer(cfg)
    m = mesh_lib.make_mesh(data=1)
    batch = {k: np.asarray(v)
             for k, v in synthetic_batch(cfg).items()}

    multi = dp.make_dp_train_multi_step(cfg, model.apply, tx, m,
                                        steps_per_call=2, donate=False)
    s_loop = loop_lib.train(
        cfg, state, multi, itertools.repeat(batch), steps_per_call=2)

    step_dp = dp.make_dp_train_step(cfg, model.apply, tx, m,
                                    donate=False)
    s_ref, _ = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(cfg.random_seed)
    for _ in range(cfg.max_steps):
        s_ref, _ = step_dp(s_ref, dp.shard_batch(batch, m), key)

    assert int(s_loop.step) == cfg.max_steps
    # Adam's rsqrt amplifies program-level ulp differences over 4 steps;
    # the 3-step test above holds 2e-4, here one element drifts ~9e-4.
    for a, b in zip(jax.tree.leaves(s_ref.params),
                    jax.tree.leaves(s_loop.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-5)
    logs = tmp_path / "spc" / "logs" / "metrics.jsonl"
    assert logs.exists() and len(logs.read_text().splitlines()) == 2


def test_host_scale_elpips_step():
    """build_host_scale_step: host-drawn (scale, swap) routes to cached
    single-branch jitted steps; losses stay finite and the cache fills
    with at most 2*num_scales entries."""
    import warnings

    from matryodshka_tpu.cli.train import build_host_scale_step
    from matryodshka_tpu.losses.elpips import api as elpips_api

    cfg = tiny_cfg(batch_size=1, which_loss="elpips")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ecfg = elpips_api.elpips_vgg(batch_size=1)
        ecfg.num_scales = 2  # keep branches tiny-image-safe
        metric = elpips_api.Metric(ecfg)

    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    tx = state_lib.build_optimizer(cfg)
    m = mesh_lib.make_mesh(data=1)
    step = build_host_scale_step(cfg, model.apply, tx, m,
                                 _metric=metric)
    batch = dp.shard_batch(
        {k: np.asarray(v) for k, v in synthetic_batch(cfg).items()}, m)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(4):
        state, mm = step(state, batch, key)
        losses.append(float(mm["total_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 4


def test_gcn_dp_multi_step(tmp_path):
    """GCN trains under the DP multi-step trainer (VERDICT r4 item 8).

    The GCN forward is batch-1 by construction (msi.infer_gcn_msi,
    reference msi.py:291-382), which is exactly what shard_map DP
    provides per device: global batch 2 over a 2-shard mesh runs
    batch-1 bodies. Checks: (a) 2-shard scan-of-2-steps runs and
    decreases the loss; (b) on a 1-device mesh the multi-step GCN
    losses match the plain make_train_step exactly."""
    from matryodshka_tpu.training.step import make_train_step

    def gcn_cfg(bs):
        return MatryConfig(height=16, width=32, num_psv_planes=3,
                           num_msi_planes=3, ngf=8, batch_size=bs,
                           gcn=True, subdiv=2, mesh_dir=str(tmp_path),
                           compute_dtype="float32").validate()

    def gcn_batch(bs):
        rs = np.random.RandomState(0)
        eye = np.tile(np.eye(4, dtype=np.float32)[None], (bs, 1, 1))
        intr = np.tile(np.asarray(
            [[0.032, 0, 0], [0, 1, 0], [0, 0, 1.0]],
            dtype=np.float32)[None], (bs, 1, 1))
        return {
            "ref_image": rs.rand(bs, 16, 32, 3).astype(np.float32),
            "src_image": rs.rand(bs, 16, 32, 3).astype(np.float32),
            "tgt_image": rs.rand(bs, 16, 32, 3).astype(np.float32),
            "ref_pose": eye, "src_pose": eye, "ref_pose_inv": eye,
            "tgt_pose": np.asarray([[0.03, 0.0, 0.0]] * bs, np.float32),
            "intrinsics": intr,
        }

    base_key = jax.random.PRNGKey(7)

    # (a) 2-shard DP: batch-1 per device
    cfg2 = gcn_cfg(2)
    state2, model2 = state_lib.init_state(cfg2, jax.random.PRNGKey(0))
    _, coords, p2v = state_lib.build_gcn(cfg2)
    tx = state_lib.build_optimizer(cfg2)
    m2 = mesh_lib.make_mesh(data=2)
    multi2 = dp.make_dp_train_multi_step(
        cfg2, model2.apply, tx, m2, gcn_inputs=(coords, p2v),
        steps_per_call=2, donate=False)
    b2 = gcn_batch(2)
    s_multi, mm = multi2(state2, dp.stack_batches([b2, b2], m2),
                         base_key)
    losses = np.asarray(mm["total_loss"])
    assert int(s_multi.step) == 2
    assert np.all(np.isfinite(losses))
    assert losses[1] < losses[0]

    # (b) 1-device multi-step == plain step, exactly
    cfg1 = gcn_cfg(1)
    state1, model1 = state_lib.init_state(cfg1, jax.random.PRNGKey(0))
    b1 = gcn_batch(1)
    m1 = mesh_lib.make_mesh(data=1)
    multi1 = dp.make_dp_train_multi_step(
        cfg1, model1.apply, tx, m1, gcn_inputs=(coords, p2v),
        steps_per_call=2, donate=False)
    _, mm1 = multi1(state1, dp.stack_batches([b1, b1], m1), base_key)

    single = make_train_step(cfg1, model1.apply, tx,
                             gcn_inputs=(coords, p2v), donate=False)
    s_ref = state1
    seq = []
    for _ in range(2):
        s_ref, ms = single(s_ref, {k: jnp.asarray(v)
                                   for k, v in b1.items()}, base_key)
        seq.append(float(ms["total_loss"]))
    np.testing.assert_allclose(np.asarray(mm1["total_loss"]),
                               np.asarray(seq, np.float32), rtol=1e-5)


def test_host_scale_per_step_draws_multi_step():
    """With steps_per_call>1 the host-scale builder gives each inner
    step its OWN (scale, swap) draw via an unrolled program (VERDICT r4
    item 4): (a) the unrolled chain with per-step elpips fns matches
    the same draws applied by sequential single steps; (b) the program
    pool is bounded by max_programs and reused afterwards."""
    import warnings

    from matryodshka_tpu.cli.train import (build_elpips_fn,
                                           build_host_scale_step)
    from matryodshka_tpu.losses.elpips import api as elpips_api

    cfg = tiny_cfg(batch_size=1, which_loss="elpips")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ecfg = elpips_api.elpips_vgg(batch_size=1)
        ecfg.num_scales = 2  # keep branches tiny-image-safe
        metric = elpips_api.Metric(ecfg)

    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    tx = state_lib.build_optimizer(cfg)
    m = mesh_lib.make_mesh(data=1)
    batch = {k: np.asarray(v) for k, v in synthetic_batch(cfg).items()}
    key = jax.random.PRNGKey(1)

    # (a) numeric parity: unrolled per-step fns == sequential singles
    draws = [(1, False), (2, True)]
    e_fns = [build_elpips_fn(cfg, static_scale_swap=ss, _metric=metric)
             for ss in draws]
    multi = dp.make_dp_train_multi_step(
        cfg, model.apply, tx, m, elpips_fns=e_fns, steps_per_call=2,
        donate=False)
    s_multi, mm = multi(state, dp.stack_batches([batch, batch], m), key)
    assert int(s_multi.step) == 2
    losses = np.asarray(mm["total_loss"])
    assert losses.shape == (2,) and np.all(np.isfinite(losses))

    s_ref = state
    seq = []
    for ss in draws:
        single = dp.make_dp_train_step(
            cfg, model.apply, tx, m,
            elpips_fn=build_elpips_fn(cfg, static_scale_swap=ss,
                                      _metric=metric), donate=False)
        s_ref, ms = single(s_ref, dp.shard_batch(batch, m), key)
        seq.append(float(ms["total_loss"]))
    np.testing.assert_allclose(losses, np.asarray(seq, np.float32),
                               rtol=1e-5)

    # (b) pool bounding: distinct K-tuples until max_programs, then
    # reuse without new compiles
    made = []
    orig = dp.make_dp_train_multi_step

    def spy(*a, **kw):
        made.append(kw.get("elpips_fns"))
        return orig(*a, **kw)

    dp.make_dp_train_multi_step = spy
    try:
        step = build_host_scale_step(cfg, model.apply, tx, m,
                                     steps_per_call=2, _metric=metric,
                                     max_programs=2)
        sb = dp.stack_batches([batch, batch], m)
        s = state
        for _ in range(5):
            s, mm = step(s, sb, key)
            assert np.all(np.isfinite(np.asarray(mm["total_loss"])))
    finally:
        dp.make_dp_train_multi_step = orig
    assert 1 <= len(made) <= 2
    assert all(fns is not None and len(fns) == 2 for fns in made)
    assert int(s.step) == 10
