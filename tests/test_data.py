"""Data pipeline tests on synthetic fixtures."""

import os

import numpy as np
import pytest

from matryodshka_tpu.config import MatryConfig
from matryodshka_tpu.data import parsers, synthetic
from matryodshka_tpu.data.loader import (OdsLoader, RealEstateLoader,
                                         device_prefetch)


@pytest.fixture(scope="module")
def ods_fixture(tmp_path_factory):
    out = tmp_path_factory.mktemp("odsdata")
    glob_pat = synthetic.make_ods_fixture(str(out), num_scenes=2,
                                          height=32, width=64)
    return str(out), glob_pat


@pytest.fixture(scope="module")
def re_fixture(tmp_path_factory):
    out = tmp_path_factory.mktemp("redata")
    glob_pat = synthetic.make_realestate_fixture(str(out), num_seqs=1,
                                                 frames=12, height=32,
                                                 width=64)
    return str(out), glob_pat


def test_ods_parser(ods_fixture):
    root, glob_pat = ods_fixture
    seqs = parsers.load_ods_sequences(glob_pat)
    assert len(seqs) == 4  # 2 scenes x 2 groups
    s = seqs[0]
    assert s.scene_id == "scene00"
    assert len(s.image_ids) == 3
    assert s.baseline == pytest.approx(0.032)
    assert s.tgt_pos.shape == (3,)


def test_ods_loader_batch_contract(ods_fixture):
    root, glob_pat = ods_fixture
    cfg = MatryConfig(height=32, width=64, batch_size=2,
                      cameras_glob=glob_pat,
                      image_dir=os.path.join(root, "images"))
    loader = OdsLoader(cfg, training=True)
    batch = next(loader.batches())
    assert batch["ref_image"].shape == (2, 32, 64, 3)
    assert batch["tgt_image"].dtype == np.float32
    assert 0.0 <= batch["tgt_image"].min() <= batch["tgt_image"].max() <= 1.0
    assert batch["intrinsics"].shape == (2, 3, 3)
    np.testing.assert_allclose(batch["intrinsics"][:, 0, 0], 0.032,
                               atol=1e-6)
    np.testing.assert_allclose(batch["ref_pose"][0], np.eye(4))
    np.testing.assert_allclose(batch["tgt_pose_rt"][0, :3, 3],
                               batch["tgt_pose"][0])


def test_ods_loader_eval_order_and_repeat(ods_fixture):
    root, glob_pat = ods_fixture
    cfg = MatryConfig(height=32, width=64, batch_size=1,
                      cameras_glob=glob_pat,
                      image_dir=os.path.join(root, "images"))
    loader = OdsLoader(cfg, training=False)
    batches = list(loader.batches())
    assert len(batches) == 4
    loader2 = OdsLoader(cfg, training=False, repeat_sample=3)
    assert len(list(loader2.batches())) == 12


def test_device_prefetch(ods_fixture):
    root, glob_pat = ods_fixture
    cfg = MatryConfig(height=32, width=64, batch_size=1,
                      cameras_glob=glob_pat,
                      image_dir=os.path.join(root, "images"))
    loader = OdsLoader(cfg, training=False)
    n = 0
    for batch in device_prefetch(loader.batches()):
        assert hasattr(batch["ref_image"], "devices")
        assert isinstance(batch["scene_id"], list)
        n += 1
    assert n == 4


def test_realestate_parser_and_loader(re_fixture):
    root, glob_pat = re_fixture
    seqs = parsers.load_realestate_sequences(glob_pat)
    assert len(seqs) == 1
    assert seqs[0].seq_id == "vid0000"
    assert len(seqs[0]) == 12
    assert seqs[0].poses.shape == (12, 3, 4)

    cfg = MatryConfig(height=32, width=64, batch_size=1,
                      input_type="REALESTATE_PP", cameras_glob=glob_pat,
                      image_dir=os.path.join(root, "images"))
    loader = RealEstateLoader(cfg, training=True, shuffle_seq_length=5,
                              min_stride=1, max_stride=2)
    batch = next(loader.batches())
    assert batch["ref_image"].shape == (1, 32, 64, 3)
    assert batch["intrinsics"].shape == (1, 3, 3)
    assert batch["tgt_pose"].shape == (1, 4, 4)
    np.testing.assert_allclose(
        batch["ref_pose_inv"][0] @ batch["ref_pose"][0], np.eye(4),
        atol=1e-5)


def test_realestate_admission_rule(re_fixture):
    """Training admission mirrors the reference (loader.py:118): a
    sequence must fit length n at MAX stride, i.e. (n-1)*max_stride + 1
    frames; eval admission only needs n frames."""
    root, glob_pat = re_fixture  # fixture sequence has 12 frames
    cfg = MatryConfig(height=32, width=64, batch_size=1,
                      input_type="REALESTATE_PP", cameras_glob=glob_pat,
                      image_dir=os.path.join(root, "images"))
    # (5-1)*2+1 = 9 <= 12: admitted
    ok = RealEstateLoader(cfg, training=True, shuffle_seq_length=5,
                          min_stride=1, max_stride=2)
    assert len(ok.sequences) == 1
    # (5-1)*3+1 = 13 > 12: rejected at training...
    with pytest.raises(ValueError):
        RealEstateLoader(cfg, training=True, shuffle_seq_length=5,
                         min_stride=1, max_stride=3)
    # ...but admitted for eval (needs only 5 frames)
    ev = RealEstateLoader(cfg, training=False, shuffle_seq_length=5,
                          min_stride=1, max_stride=3)
    assert len(ev.sequences) == 1
    # admitted sequences never clamp the stride distribution: every
    # stride in [min, max] is reachable
    rng = np.random.RandomState(0)
    ts = list(ok.sequences[0].timestamps)
    strides = set()
    for _ in range(50):
        sub = ok.sequences[0].random_subsequence(rng, 5, 1, 2)
        strides.add(ts.index(sub.timestamps[1])
                    - ts.index(sub.timestamps[0]))
    assert strides == {1, 2}


def test_realestate_subsequence_ops(re_fixture):
    root, glob_pat = re_fixture
    seq = parsers.load_realestate_sequences(glob_pat)[0]
    sub = seq.subsequence(2, 8, 2)
    assert len(sub) == 3
    assert sub.timestamps[0] == seq.timestamps[2]
    rev = sub.reverse()
    assert rev.timestamps[0] == sub.timestamps[-1]
    rng = np.random.RandomState(0)
    rnd = seq.random_subsequence(rng, 3, 1, 3)
    assert len(rnd) == 3


def test_perspective_loader(tmp_path):
    from matryodshka_tpu.data.loader import ReplicaPerspectiveLoader
    glob_pat = synthetic.make_perspective_fixture(str(tmp_path),
                                                  height=32, width=64)
    cfg = MatryConfig(height=32, width=64, batch_size=1, input_type="PP",
                      cameras_glob=glob_pat,
                      image_dir=os.path.join(str(tmp_path), "images"))
    loader = ReplicaPerspectiveLoader(cfg, training=False)
    batch = next(loader.batches())
    assert batch["ref_image"].shape == (1, 32, 64, 3)
    np.testing.assert_allclose(batch["src_pose"][0, 0, 3], -0.1, atol=1e-6)
    np.testing.assert_allclose(batch["tgt_pose"][0, 0, 3], -0.05,
                               atol=1e-6)
    np.testing.assert_allclose(batch["intrinsics"][0, 0, 0], 32.0)
    # interp frame is halfway between ref and src translations
    np.testing.assert_allclose(batch["interp_pose"][0, 0, 3], -0.05,
                               atol=1e-6)
    np.testing.assert_allclose(
        batch["ref_pose_inv"][0] @ batch["interp_pose"][0], np.eye(4),
        atol=1e-5)


def test_pp_train_step(tmp_path):
    """End-to-end PP (homography MPI) training step on fixture data."""
    import jax
    import jax.numpy as jnp
    from matryodshka_tpu.data.loader import ReplicaPerspectiveLoader
    from matryodshka_tpu.training import state as state_lib
    from matryodshka_tpu.training.step import make_train_step

    glob_pat = synthetic.make_perspective_fixture(str(tmp_path),
                                                  height=32, width=64)
    cfg = MatryConfig(height=32, width=64, batch_size=1, input_type="PP",
                      num_psv_planes=3, num_msi_planes=3, ngf=8,
                      compute_dtype="float32", cameras_glob=glob_pat,
                      image_dir=os.path.join(str(tmp_path), "images"),
                      ).validate()
    loader = ReplicaPerspectiveLoader(cfg, training=True)
    batch = next(loader.batches())
    arrays = {k: jnp.asarray(v) for k, v in batch.items()
              if isinstance(v, np.ndarray)}
    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    tx = state_lib.build_optimizer(cfg)
    step_fn = make_train_step(cfg, model.apply, tx, donate=False)
    losses = []
    for i in range(3):
        state, metrics = step_fn(state, arrays, jax.random.PRNGKey(i))
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0]
