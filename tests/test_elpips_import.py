"""E-LPIPS weight-import golden: the one external step (converting a
torchvision VGG16 state_dict + elpips lin .npy into this package's .npz)
verified in advance with synthetic weights, so a future real blob is one
command away from a working calibrated metric (VERDICT round-2 item 9).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tools")
from import_elpips_weights import load_lin, load_net

from matryodshka_tpu.losses.elpips import api as elpips_api
from matryodshka_tpu.losses.elpips.networks import (VGG16_CONVS,
                                                    VGG16_FULL_AVG_CHANNELS)


def _synthetic_torch_state(tmp_path):
    """A torchvision-vgg16-shaped features state_dict saved with torch."""
    import torch
    rng = np.random.RandomState(0)
    sd = {}
    for idx, cin, cout in VGG16_CONVS:
        sd[f"features.{idx}.weight"] = torch.tensor(
            rng.randn(cout, cin, 3, 3).astype(np.float32) * 0.05)
        sd[f"features.{idx}.bias"] = torch.tensor(
            rng.randn(cout).astype(np.float32) * 0.01)
    sd["classifier.0.weight"] = torch.tensor(
        np.zeros((10, 10), np.float32))        # must be skipped
    path = str(tmp_path / "vgg16_synth.pth")
    torch.save(sd, path)
    return path


def _synthetic_lin_npy(tmp_path):
    rng = np.random.RandomState(1)
    d = {f"lin{i}.model.1.weight":
         np.abs(rng.randn(1, 1, c, 1).astype(np.float32))
         for i, c in enumerate(VGG16_FULL_AVG_CHANNELS)}
    path = str(tmp_path / "vgg_full_avg.npy")
    np.save(path, np.asarray(d, dtype=object), allow_pickle=True)
    return path


def test_import_layout_and_metric_runs(tmp_path):
    net = load_net(_synthetic_torch_state(tmp_path))
    lin = load_lin(_synthetic_lin_npy(tmp_path))
    # layout contract: exactly the keys the loader strips and the
    # networks consume, weights in HWIO
    for idx, cin, cout in VGG16_CONVS:
        assert net[f"net/{idx}.weight"].shape == (3, 3, cin, cout)
        assert net[f"net/{idx}.bias"].shape == (cout,)
    assert "net/classifier.0.weight" not in net
    assert len(lin) == len(VGG16_FULL_AVG_CHANNELS)

    out = str(tmp_path / "weights.npz")
    np.savez(out, **{**lin, **net})

    metric = elpips_api.Metric(
        elpips_api.elpips_vgg(batch_size=1, n=1), weight_path=out)
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    d_ab = float(np.asarray(metric.forward(a, b, jax.random.PRNGKey(0)))[0])
    d_aa = float(np.asarray(metric.forward(a, a, jax.random.PRNGKey(0)))[0])
    assert np.isfinite(d_ab) and d_ab > 0.0
    assert abs(d_aa) < 1e-6
    # deterministic under a fixed key (the transform ensemble is seeded)
    d_ab2 = float(np.asarray(metric.forward(a, b, jax.random.PRNGKey(0)))[0])
    assert d_ab == d_ab2
