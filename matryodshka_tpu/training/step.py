"""The jitted training step: forward, synthesis, loss, Adam update.

Mirrors the loss structure of MSI.build_train_graph
(matryodshka/msi.py:550-733):

  supervision 'tgt'     : render at tgt offset, weight 1
  supervision 'hrestgt' : high-res render, weight 1
  supervision 'src'/'ref': ODS eye re-render, weight 1e-4
  transform_inverse_reg : second forward with a random jitter pose and
      SHARED weights; total += reg_reconstruction + 10 * enforcement,
      where enforcement = d(render(jittered MSI @ jitter pose),
                            render(unjittered MSI)); in this branch the
      src/ref terms have weight 1 (the reference drops the 1e-4 there,
      msi.py:682-687 — reproduced faithfully)
  wreg                  : + 0.001 * sum_v l2(v)  (msi.py:721-725)

The pixel loss is 0.5*sum(sq) (see losses/basic.py). Spherical attention
multiplies both images by the latitude map before the distance.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from matryodshka_tpu.config import MatryConfig
from matryodshka_tpu.geometry import cameras, sweep as sweep_lib
from matryodshka_tpu.losses.basic import l2_loss, spherical_weights
from matryodshka_tpu.models import msi as msi_lib

Array = jax.Array


def make_loss_fn(cfg: MatryConfig, model_apply: Callable,
                 elpips_fn: Optional[Callable] = None,
                 gcn_inputs=None, n_shards: int = 1) -> Callable:
    """Build loss_fn(params, batch, rng) -> (total_loss, aux dict).

    gcn_inputs: (mesh_coords, p2v) when cfg.gcn (see state.build_gcn).

    n_shards: number of data-parallel shards this loss runs under
    (parallel/dp.py shard_map). Mean-type terms — elpips distances
    (jnp.mean over the batch) and the weight reg (batch-independent) —
    are scaled by 1/n_shards so ONE psum of the local totals/grads
    reproduces the global-batch loss exactly; the sum-type pixel loss
    (0.5*sum of squares, losses/basic.py) rides the psum unscaled.
    """

    psv_depths = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_psv_planes))
    msi_depths = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_msi_planes))

    sph_w = (spherical_weights(cfg.height, cfg.width)[None, :, :, None]
             if cfg.spherical_attention else None)

    def distance(pred, target, rng):
        if cfg.which_loss == "elpips":
            assert elpips_fn is not None, "elpips loss requested but no fn"
            p, t = pred, target
            if sph_w is not None:
                p, t = p * sph_w, t * sph_w
            # batch-mean term: global mean == psum of local mean / K
            return jnp.mean(elpips_fn(p, t, rng)) / n_shards
        return l2_loss(pred, target, sph_w)

    def loss_fn(params, batch: Dict[str, Array], rng: Array
                ) -> Tuple[Array, Dict[str, Array]]:
        aux: Dict[str, Array] = {}
        rng_jit, rng_l1, rng_l2, rng_l3, rng_l4, rng_l5 = \
            jax.random.split(rng, 6)
        if cfg.remat_network:
            # rematerialize U-Net activations in the backward pass
            # (jax.checkpoint trades FLOPs for HBM at high resolutions)
            apply = jax.checkpoint(lambda p, x: model_apply(p, x))
        else:
            apply = lambda p, x: model_apply(p, x)

        if cfg.gcn:
            assert gcn_inputs is not None, "cfg.gcn needs gcn_inputs"
            assert not cfg.transform_inverse_reg, (
                "the GCN path does not support transform-inverse reg "
                "(reference: build_train_graph only jitters the CNN path)")
            mesh_coords, p2v = gcn_inputs
            outputs = msi_lib.infer_gcn_msi(apply, params, cfg, batch,
                                            psv_depths, mesh_coords, p2v)
        else:
            outputs = msi_lib.infer_msi(apply, params, cfg, batch,
                                        psv_depths,
                                        with_hres=cfg.supervise_hrestgt)
        rgba = outputs["rgba_layers"]
        aux["rgba_layers"] = rgba

        if cfg.transform_inverse_reg:
            jitter_pose = cameras.random_jitter_pose(
                rng_jit, cfg.rot_factor, cfg.tr_factor)
            jitter_pose_inv = jnp.linalg.inv(jitter_pose)
            jitter_b = jnp.tile(jitter_pose[None],
                                (rgba.shape[0], 1, 1))
            jitter_inv_b = jnp.tile(jitter_pose_inv[None],
                                    (rgba.shape[0], 1, 1))
            outputs_j = msi_lib.infer_msi(apply, params, cfg, batch,
                                          psv_depths,
                                          jitter_pose_inv=jitter_inv_b)
            rgba_j = outputs_j["rgba_layers"]
            aux["rgba_layers_jitter"] = rgba_j

        tgt_image = msi_lib.preprocess_image(batch["tgt_image"])
        src_image = msi_lib.preprocess_image(batch["src_image"])
        ref_image = msi_lib.preprocess_image(batch["ref_image"])

        b = rgba.shape[0]
        eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
        tgt_pos = batch["tgt_pose"]  # [B, 3] offset vector (ODS)
        intr = batch["intrinsics"]

        total = 0.0
        if cfg.input_type == "ODS":
            if cfg.supervise_tgt:
                out_img = msi_lib.render_equirect_view(rgba, eye, tgt_pos,
                                                       msi_depths)
                aux["output_image"] = out_img
                rec = distance(out_img, tgt_image, rng_l1)
                aux["reconstruction_loss"] = rec
                total += rec
            if cfg.supervise_hrestgt:
                hres_tgt = msi_lib.preprocess_image(batch["hres_tgt_image"])
                hres_out = msi_lib.render_equirect_view(
                    outputs["hres_rgba_layers"], eye, tgt_pos, msi_depths)
                total += distance(hres_out, hres_tgt, rng_l2)
            src_w = 1.0 if cfg.transform_inverse_reg else 1e-4
            if cfg.supervise_src:
                src_out = msi_lib.render_ods_view(rgba, -1, eye, tgt_pos,
                                                  msi_depths, intr)
                total += src_w * distance(src_out, src_image, rng_l3)
            if cfg.supervise_ref:
                ref_out = msi_lib.render_ods_view(rgba, 1, eye, tgt_pos,
                                                  msi_depths, intr)
                total += src_w * distance(ref_out, ref_image, rng_l4)

            if cfg.transform_inverse_reg:
                if cfg.supervise_tgt:
                    jit_out = msi_lib.render_equirect_view(
                        rgba_j, jitter_b, tgt_pos, msi_depths)
                    aux["jitter_output_image"] = jit_out
                    enforcement = distance(jit_out, out_img, rng_l5)
                    aux["enforcement_loss"] = enforcement
                    total += 10.0 * enforcement
                if cfg.supervise_src:
                    jsrc = msi_lib.render_ods_view(rgba, -1, jitter_b,
                                                   tgt_pos, msi_depths,
                                                   intr)
                    total += distance(jsrc, src_image, rng_l3)
                if cfg.supervise_ref:
                    jref = msi_lib.render_ods_view(rgba, 1, jitter_b,
                                                   tgt_pos, msi_depths,
                                                   intr)
                    total += distance(jref, ref_image, rng_l4)
        else:
            # PP / REALESTATE_PP: perspective MPI render via homography.
            rel_pose = jnp.einsum("bij,bjk->bik", batch["tgt_pose"],
                                  batch["ref_pose_inv"])
            out_img = msi_lib.render_mpi_view(rgba, rel_pose, msi_depths,
                                              intr)
            aux["output_image"] = out_img
            rec = distance(out_img, tgt_image, rng_l1)
            aux["reconstruction_loss"] = rec
            total += rec
            if cfg.transform_inverse_reg:
                rel_pose_j = jnp.einsum(
                    "bij,bjk->bik", batch["tgt_pose"],
                    jnp.einsum("bij,bjk->bik", batch["ref_pose_inv"],
                               jitter_inv_b))
                jit_out = msi_lib.render_mpi_view(rgba_j, rel_pose_j,
                                                  msi_depths, intr)
                enforcement = distance(jit_out, out_img, rng_l5)
                aux["enforcement_loss"] = enforcement
                total += 10.0 * enforcement

        if cfg.wreg:
            # batch-independent (replicated) term: psum of /K == itself
            wsum = 0.5 * sum(jnp.sum(jnp.square(p))
                             for p in jax.tree.leaves(params)) / n_shards
            aux["weight_reg_loss"] = 0.001 * wsum
            total += 0.001 * wsum

        aux["total_loss"] = total
        return total, aux

    return loss_fn


def make_train_step(cfg: MatryConfig, model_apply: Callable, tx,
                    elpips_fn: Optional[Callable] = None,
                    gcn_inputs=None,
                    donate: bool = True) -> Callable:
    """Returns jitted train_step(state, batch, rng) -> (state, metrics)."""
    from matryodshka_tpu.training.state import TrainState

    loss_fn = make_loss_fn(cfg, model_apply, elpips_fn, gcn_inputs)

    def train_step(state: TrainState, batch: Dict[str, Array], rng: Array):
        # Per-step decorrelation happens IN-GRAPH off state.step, so the
        # host loop passes one constant base key and runs zero per-step
        # host-side key ops. (Host-side per-step key derivation was
        # measured catastrophically slow through the remote-TPU relay:
        # fold_in(key, python_int) / presplit keys[i] cost a fresh tiny
        # compile+dispatch per step — 4.2-5.7 s/step vs 0.14 s;
        # tools/train_probe2.py.)
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, aux), grads = grad_fn(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {k: v for k, v in aux.items()
                   if isinstance(v, jax.Array) and v.ndim == 0}
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
