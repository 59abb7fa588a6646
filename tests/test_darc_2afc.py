"""darc archive + 2AFC training harness tests."""

import os
import warnings

import numpy as np
import pytest

from matryodshka_tpu.losses.elpips.darc import DataArchive
from matryodshka_tpu.losses.elpips import train_2afc


def test_darc_roundtrip(tmp_path):
    path = str(tmp_path / "test.darc")
    rng = np.random.RandomState(0)
    arrays = [rng.rand(4, 5).astype(np.float32),
              rng.randint(0, 255, (3, 2, 2), dtype=np.uint8),
              np.asarray(0.75, np.float32)]
    with DataArchive(path, "w") as db:
        for i, a in enumerate(arrays):
            db.append(a, f"item/{i}")
    with DataArchive(path, "r") as db:
        assert len(db) == 3
        assert db.keys() == [f"item/{i}" for i in range(3)]
        for i, a in enumerate(arrays):
            np.testing.assert_array_equal(db.read(f"item/{i}"), a)
            np.testing.assert_array_equal(db[i], a)


def test_darc_append_mode(tmp_path):
    path = str(tmp_path / "test.darc")
    with DataArchive(path, "w") as db:
        db.append(np.zeros(3, np.float32), "a")
    with DataArchive(path, "a") as db:
        db.append(np.ones(3, np.float32), "b")
    with DataArchive(path, "r") as db:
        assert db.keys() == ["a", "b"]
        np.testing.assert_array_equal(db.read("b"), np.ones(3))


def test_darc_repair_torn_write(tmp_path):
    path = str(tmp_path / "torn.darc")
    with DataArchive(path, "w") as db:
        db.append(np.arange(6, dtype=np.float32), "x")
        db.append(np.arange(4, dtype=np.float32), "y")
    # chop off the directory (simulate crash before close)
    size = os.path.getsize(path)
    with open(path, "r+b") as fh:
        fh.truncate(size - 40)
    with DataArchive(path, "r") as db:
        assert "x" in db.keys()
        np.testing.assert_array_equal(db.read("x"),
                                      np.arange(6, dtype=np.float32))


def test_2afc_training_learns_ranking(tmp_path):
    """With judgements following true L2-closeness, training must beat
    chance accuracy even from random VGG features."""
    rng = np.random.RandomState(0)
    triplets = []
    for i in range(16):
        ref = rng.rand(32, 32, 3).astype(np.float32)
        n0 = rng.randn(32, 32, 3).astype(np.float32)
        n1 = rng.randn(32, 32, 3).astype(np.float32)
        # p0 mildly distorted, p1 heavily -> judges prefer p0 (judge=0)
        p0 = np.clip(ref + 0.05 * n0, 0, 1)
        p1 = np.clip(ref + 0.4 * n1, 0, 1)
        if i % 2 == 0:
            p0, p1 = p1, p0
            judge = 1.0
        else:
            judge = 0.0
        triplets.append((ref, p0, p1, judge))
    path = str(tmp_path / "2afc.darc")
    train_2afc.make_archive(path, triplets)

    cfg = train_2afc.TrainConfig(batch_size=8, steps=60,
                                 learning_rate=3e-3)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        lin, head, metrics = train_2afc.train(
            cfg, train_2afc.archive_batches(path, cfg.batch_size),
            verbose=False)
    assert metrics["accuracy"] > 0.7, metrics
    assert "lin0.model.1.weight" in lin
    assert all(v.min() >= 0 for v in lin.values())
