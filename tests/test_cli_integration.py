"""End-to-end CLI integration: train -> resume -> test -> eval -> export
on synthetic fixtures, exactly as a user would run them."""

import json
import os

import numpy as np
import pytest

from matryodshka_tpu.data import synthetic


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("clifix")
    glob_pat = synthetic.make_ods_fixture(str(root), num_scenes=2,
                                          height=32, width=64)
    return str(root), glob_pat


def common_flags(root, glob_pat, ckpt):
    return ["--image_dir", os.path.join(root, "images"),
            "--cameras_glob", glob_pat,
            "--height", "32", "--width", "64",
            "--num_psv_planes", "3", "--num_msi_planes", "3",
            "--ngf", "8", "--compute_dtype", "float32",
            "--checkpoint_dir", ckpt, "--experiment_name", "cli"]


def test_full_cli_lifecycle(fixture, tmp_path):
    root, glob_pat = fixture
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    flags = common_flags(root, glob_pat, ckpt)

    from matryodshka_tpu.cli.train import main as train_main
    train_main(flags + ["--max_steps", "4", "--summary_freq", "2",
                        "--save_latest_freq", "100"])
    # resume
    train_main(flags + ["--max_steps", "6", "--summary_freq", "2",
                        "--save_latest_freq", "100",
                        "--continue_train", "true"])

    from matryodshka_tpu.cli.test import main as test_main
    test_main(flags + ["--output_root", out, "--num_runs", "2",
                       "--test_outputs",
                       "tgt_image_blend_weights_alphas_rgba_layers"])
    dirs = [d for d in os.listdir(os.path.join(out, "cli"))
            if os.path.isdir(os.path.join(out, "cli", d))]
    assert len(dirs) == 2
    assert os.path.exists(os.path.join(out, "cli", dirs[0],
                                       "blend_weights.npy"))

    from matryodshka_tpu.cli.evaluate import main as eval_main
    eval_main(["--result_root", os.path.join(out, "cli")])
    table = json.load(open(os.path.join(out, "cli", "eval_reg.json")))
    assert "avg_psnr" in table and np.isfinite(table["avg_psnr"])

    from matryodshka_tpu.cli.export import main as export_main
    export_main(flags + ["--export_dir", str(tmp_path / "exp"),
                         "--platform", "cpu"])
    artifact = str(tmp_path / "exp" / "msi_model.stablehlo")
    assert os.path.exists(artifact)

    # external-consumer check: a clean process (no matryodshka_tpu
    # imports) deserializes and runs the artifact from the blob +
    # meta.json alone — the TPU-native analogue of loading the ONNX
    # export in TensorRT (scripts/export/pb2onnx.sh).
    import subprocess, sys as _sys
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [_sys.executable, os.path.join(repo, "tools", "consume_export.py"),
         artifact], capture_output=True, text=True, env=env, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "finite=True" in proc.stdout, proc.stdout


def test_pp_cli_lifecycle(tmp_path):
    """Perspective (PP) input type: train -> test -> eval end-to-end,
    exercising the loader dispatch (reference test.py:51) and the MPI
    perspective render in the test flow."""
    root = str(tmp_path / "ppdata")
    glob_pat = synthetic.make_perspective_fixture(root, height=32,
                                                  width=64)
    ckpt = str(tmp_path / "ckpt_pp")
    out = str(tmp_path / "out_pp")
    flags = common_flags(root, glob_pat, ckpt) + ["--input_type", "PP"]

    from matryodshka_tpu.cli.train import main as train_main
    train_main(flags + ["--max_steps", "2", "--summary_freq", "1",
                        "--save_latest_freq", "100"])

    from matryodshka_tpu.cli.test import main as test_main
    test_main(flags + ["--output_root", out, "--num_runs", "2",
                       "--test_outputs",
                       "tgt_image_blend_weights_alphas"])
    dirs = [d for d in os.listdir(os.path.join(out, "cli"))
            if os.path.isdir(os.path.join(out, "cli", d))]
    assert len(dirs) == 2
    files = os.listdir(os.path.join(out, "cli", dirs[0]))
    assert any(f.startswith("output_tgt_") for f in files), files
    assert "blend_weights.npy" in files

    from matryodshka_tpu.cli.evaluate import main as eval_main
    eval_main(["--result_root", os.path.join(out, "cli")])
    table = json.load(open(os.path.join(out, "cli", "eval_reg.json")))
    assert "avg_psnr" in table and np.isfinite(table["avg_psnr"])


def test_cli_data_parallel_training(fixture, tmp_path):
    """--num_data_shards 2 on the virtual CPU mesh."""
    root, glob_pat = fixture
    ckpt = str(tmp_path / "ckpt_dp")
    flags = common_flags(root, glob_pat, ckpt)
    from matryodshka_tpu.cli.train import main as train_main
    train_main(flags + ["--max_steps", "2", "--summary_freq", "1",
                        "--save_latest_freq", "100",
                        "--batch_size", "2", "--num_data_shards", "2"])
    metrics = open(os.path.join(ckpt, "cli", "logs",
                                "metrics.jsonl")).read().strip()
    assert metrics, "no metrics written"


def test_cli_video_mode_and_temporal_eval(fixture, tmp_path):
    """on_video test naming + video-mode temporal-consistency eval."""
    root, glob_pat = fixture
    ckpt = str(tmp_path / "ckpt_v")
    out = str(tmp_path / "out_v")
    flags = common_flags(root, glob_pat, ckpt)

    from matryodshka_tpu.cli.train import main as train_main
    train_main(flags + ["--max_steps", "2", "--summary_freq", "1",
                        "--save_latest_freq", "100"])
    from matryodshka_tpu.cli.test import main as test_main
    test_main(flags + ["--output_root", out, "--num_runs", "3",
                       "--test_type", "on_video",
                       "--test_outputs", "tgt_image"])
    dirs = sorted(d for d in os.listdir(os.path.join(out, "cli"))
                  if d.startswith("video_"))
    assert len(dirs) == 3

    from matryodshka_tpu.cli.evaluate import main as eval_main
    eval_main(["--result_root", os.path.join(out, "cli"),
               "--eval_type", "video"])
    table = json.load(open(os.path.join(out, "cli", "eval_video.json")))
    assert table["avg_rgb_diff"] is not None
    assert np.isfinite(table["avg_rgb_diff"])
