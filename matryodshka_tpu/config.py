"""Typed configuration for the whole framework.

Replaces the reference's process-wide ``tf.app.flags`` singleton (defined
piecemeal across train.py:32-95, test.py:36-84, matryodshka/loader.py:30-43,
export.py:33-115, eval.py:35-48 and even read deep inside geometry code).
Here every knob lives in one frozen dataclass that is passed explicitly, so
functions stay pure and jit-friendly.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Enumerated string options (kept as plain strings for CLI friendliness).
# ---------------------------------------------------------------------------

INPUT_TYPES = ("ODS", "PP", "REALESTATE_PP")
COLOR_PREDS = ("blend_psv", "blend_bg", "blend_bg_psv", "alpha_only")
LOSSES = ("pixel", "elpips")
OPERATIONS = ("train", "export")


@dataclass(frozen=True)
class MatryConfig:
    """Every tunable of the MSI pipeline, in one immutable record.

    Field names and defaults mirror the reference flags (train.py:32-95) so
    users of the original can map their shell scripts 1:1.
    """

    # --- i/o -------------------------------------------------------------
    cameras_glob: str = "glob/train/ods/*.txt"
    image_dir: str = "train_640x320"
    hres_image_dir: str = "train_4096x2048"
    checkpoint_dir: str = "checkpoints"
    experiment_name: str = ""
    output_root: str = "./test"
    shuffle_seq_length: int = 3

    # --- image geometry ---------------------------------------------------
    height: int = 320
    width: int = 640
    hres_height: int = 2048
    hres_width: int = 4096
    batch_size: int = 1

    # --- training hyper-parameters ----------------------------------------
    learning_rate: float = 2e-4
    beta1: float = 0.9
    random_seed: int = 8964
    max_steps: int = 10_000_000
    summary_freq: int = 50
    save_latest_freq: int = 2000
    continue_train: bool = False

    # --- model ------------------------------------------------------------
    operation: str = "train"            # train | export
    input_type: str = "ODS"             # ODS | PP | REALESTATE_PP
    coord_net: bool = False
    transform_inverse_reg: bool = False
    which_color_pred: str = "blend_psv"
    ngf: int = 64
    min_depth: float = 1.0
    max_depth: float = 100.0
    num_psv_planes: int = 32
    num_msi_planes: int = 32

    # --- loss ---------------------------------------------------------------
    which_loss: str = "pixel"           # pixel | elpips
    spherical_attention: bool = False
    wreg: bool = False
    supervision: str = "tgt"            # '_'-joined: tgt, ref, src, hrestgt
    rot_factor: float = 1.0
    tr_factor: float = 1.0

    # --- GCN variant --------------------------------------------------------
    gcn: bool = False
    subdiv: int = 7
    mesh_dir: str = "glob/train/gcn"

    # --- numerics / TPU -------------------------------------------------------
    compute_dtype: str = "bfloat16"     # dtype for CNN compute (MXU-friendly)
    param_dtype: str = "float32"
    use_pallas: bool = True             # Pallas fused resample where available
    remat_network: bool = False         # jax.checkpoint over the U-Net

    # --- parallelism ---------------------------------------------------------
    num_data_shards: int = 1            # data-parallel mesh axis size
    shard_shells: bool = False          # shard MSI shells across devices (hres)

    # --- elpips -------------------------------------------------------------
    elpips_weight_path: Optional[str] = None  # npz with vgg + lin weights
    elpips_average_over: int = 1
    # Draw the ensemble's (scale, swap) on the HOST per dispatch and jit
    # one single-branch step per combination (<= 2*num_scales cache
    # entries) instead of an in-graph lax.switch over every scale. Same
    # per-step distribution; avoids the switch tower's pathological
    # backward on TPU (measured 16.7 s/step, STATUS round 4).
    elpips_host_scale: bool = False

    # --- export -------------------------------------------------------------
    net_only: bool = False
    smoothed: bool = False

    # ------------------------------------------------------------------------
    @property
    def supervise_tgt(self) -> bool:
        return "tgt" in self.supervision

    @property
    def supervise_hrestgt(self) -> bool:
        return "hrestgt" in self.supervision

    @property
    def supervise_src(self) -> bool:
        return "src" in self.supervision

    @property
    def supervise_ref(self) -> bool:
        return "ref" in self.supervision

    @property
    def jnp_compute_dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def jnp_param_dtype(self):
        return jnp.dtype(self.param_dtype)

    def num_net_outputs(self, num_planes: Optional[int] = None) -> int:
        """Channels the CNN must predict for the configured color scheme.

        Mirrors the scheme table at matryodshka/msi.py:108-118.
        """
        n = self.num_msi_planes if num_planes is None else num_planes
        if self.which_color_pred == "blend_psv":
            return n * 2
        if self.which_color_pred == "blend_bg":
            return n * 2 + 3
        if self.which_color_pred == "blend_bg_psv":
            return n * 3 + 3
        if self.which_color_pred == "alpha_only":
            return n
        raise ValueError(f"unknown which_color_pred {self.which_color_pred!r}")

    def num_net_inputs(self) -> int:
        """Input channels of the double sphere-sweep volume."""
        if self.input_type == "REALESTATE_PP":
            # ref image + 2 plane sweeps (msi.py:1024-1059)
            return 3 + 2 * self.num_psv_planes * 3
        return 2 * self.num_psv_planes * 3

    def validate(self) -> "MatryConfig":
        assert self.input_type in INPUT_TYPES, self.input_type
        assert self.which_color_pred in COLOR_PREDS, self.which_color_pred
        assert self.which_loss in LOSSES, self.which_loss
        assert self.height % 8 == 0 and self.width % 8 == 0, (
            "U-Net has 3 stride-2 stages; H and W must be multiples of 8"
        )
        return self

    def replace(self, **kw) -> "MatryConfig":
        return dataclasses.replace(self, **kw)


def enable_compilation_cache(path: str = "/tmp/matry_jax_cache_tpu"):
    """Persistent XLA compilation cache — load-bearing when compiles are
    remote (minutes each); harmless elsewhere."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def add_config_args(parser: argparse.ArgumentParser) -> None:
    """Register one --flag per MatryConfig field."""
    for f in dataclasses.fields(MatryConfig):
        name = "--" + f.name
        if f.type == "bool" or isinstance(f.default, bool):
            parser.add_argument(
                name, type=lambda s: s.lower() in ("1", "true", "yes"),
                default=f.default, metavar="BOOL")
        elif f.default is None:
            parser.add_argument(name, type=str, default=None)
        else:
            parser.add_argument(name, type=type(f.default), default=f.default)


def config_from_args(args: argparse.Namespace) -> MatryConfig:
    names = {f.name for f in dataclasses.fields(MatryConfig)}
    kw = {k: v for k, v in vars(args).items() if k in names}
    return MatryConfig(**kw).validate()


def parse_config(argv: Optional[Sequence[str]] = None,
                 description: str = "matryodshka-tpu") -> MatryConfig:
    parser = argparse.ArgumentParser(description=description)
    add_config_args(parser)
    return config_from_args(parser.parse_args(argv))
