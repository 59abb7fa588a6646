"""Inference entry point (the reference's test.py).

Runs batch-1 inference over test camera globs, renders the requested
outputs and writes PNGs + blend_weights.npy / alphas.npy per example
(test.py:87-281). `--test_type high_res` re-renders at hres_height x
hres_width by streaming MSI shells through a lax.scan (the memory-bounded
TPU equivalent of the per-plane numpy loop at test.py:284-394).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from matryodshka_tpu.config import MatryConfig, add_config_args
from matryodshka_tpu.data.images import write_image
from matryodshka_tpu.data.loader import OdsLoader, make_loader
from matryodshka_tpu.geometry import render as render_lib
from matryodshka_tpu.geometry import sweep as sweep_lib
from matryodshka_tpu.models import msi as msi_lib
from matryodshka_tpu.training import state as state_lib
from matryodshka_tpu.training.checkpoint import CheckpointManager


def fused_net_available(cfg: MatryConfig, model, params) -> bool:
    """Probe-compile the whole-net Pallas kernel (TPU only); callers
    keep the XLA net when Mosaic rejects anything. Coord configs (the
    released checkpoints) probe the coord kernel variant."""
    if cfg.gcn or jax.default_backend() != "tpu":
        return False
    try:
        from matryodshka_tpu.ops import pallas_net
        fused = msi_lib.fused_net_ops(model, params, cfg)
        if fused is None:
            return False
        xp = jnp.zeros((cfg.height, 2 * cfg.num_psv_planes * 3,
                        cfg.width), cfg.jnp_compute_dtype)
        jax.block_until_ready(pallas_net.unet_forward(
            xp, fused[0], fused[1], fused[2], flipped=fused[3],
            variant=fused[4]))
        return True
    except Exception:  # noqa: BLE001
        return False


def build_infer_fn(cfg: MatryConfig, model, test_outputs: str,
                   allow_fused: bool = True):
    psv_depths = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_psv_planes))
    msi_depths = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_msi_planes))

    gcn_inputs = None
    if cfg.gcn:
        from matryodshka_tpu.training import state as state_lib
        _, mesh_coords, p2v = state_lib.build_gcn(cfg)
        gcn_inputs = (mesh_coords, p2v)

    spherical = cfg.input_type == "ODS"

    @jax.jit
    def infer(params, batch):
        if cfg.gcn:
            outputs = msi_lib.infer_gcn_msi(
                lambda p, x: model.apply(p, x), params, cfg, batch,
                psv_depths, *gcn_inputs)
        else:
            outputs = msi_lib.infer_msi(lambda p, x: model.apply(p, x),
                                        params, cfg, batch, psv_depths)
        rgba = outputs["rgba_layers"]
        b = rgba.shape[0]
        eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
        # outs holds only what test_outputs asks for, so XLA DCEs the
        # standard assemble/net when the fused path below covers the
        # requested outputs (the video flow: tgt_image only).
        outs = {}
        if "rgba_layers" in test_outputs:
            outs["rgba_layers"] = rgba
        for k in ("blend_weights", "alphas"):
            if k in outputs and k in test_outputs:
                outs[k] = outputs[k]
        if "psv" in test_outputs:
            outs["psv"] = outputs["psv"]
        if spherical:
            if "tgt_image" in test_outputs:
                # target poses are dataset translation offsets — the
                # fused product path: sweep kernel -> whole-net kernel
                # -> prepared assemble -> ladder render, with the
                # runtime pose-contract gather fallback inside.
                pouts = None
                if cfg.use_pallas and not cfg.gcn:
                    fused = (msi_lib.fused_net_ops(model, params, cfg)
                             if allow_fused else None)
                    pouts = msi_lib.infer_msi_prepared(
                        lambda p, x: model.apply(p, x), params, cfg,
                        batch, psv_depths, fused_net=fused)
                if pouts is not None:
                    outs["output_image"] = msi_lib.deprocess_image(
                        msi_lib.render_equirect_view_from_prepared(
                            pouts, eye, batch["tgt_pose"], msi_depths,
                            cfg.height))
                    outs["output_depth"] = (
                        msi_lib.render_equirect_depth_from_prepared(
                            pouts, eye, batch["tgt_pose"], msi_depths,
                            cfg.height))
                else:
                    popts = ({"dtype": cfg.jnp_compute_dtype}
                             if cfg.use_pallas else None)
                    outs["output_image"] = msi_lib.deprocess_image(
                        msi_lib.render_equirect_view(
                            rgba, eye, batch["tgt_pose"], msi_depths,
                            use_pallas=cfg.use_pallas,
                            pallas_opts=popts))
                    outs["output_depth"] = msi_lib.render_equirect_depth(
                        rgba, eye, batch["tgt_pose"], msi_depths)
            if "psp" in test_outputs:
                for win in range(4):
                    outs[f"output_psp{win}"] = msi_lib.deprocess_image(
                        msi_lib.render_perspective_view(
                            rgba, batch["tgt_pose"], msi_depths,
                            viewing_window=win))
            if "src_output_image" in test_outputs:
                outs["output_src"] = msi_lib.deprocess_image(
                    msi_lib.render_ods_view(
                        rgba, -1, eye, batch["tgt_pose"], msi_depths,
                        batch["intrinsics"]))
            if "ref_output_image" in test_outputs:
                outs["output_ref"] = msi_lib.deprocess_image(
                    msi_lib.render_ods_view(
                        rgba, 1, eye, batch["tgt_pose"], msi_depths,
                        batch["intrinsics"]))
        elif "tgt_image" in test_outputs:
            # PP / REALESTATE_PP: the layers are an MPI — render the
            # perspective target view via the homography path, matching
            # the training supervision (training/step.py). (The reference
            # test.py nominally accepts PP but feeds the 4x4 tgt_pose into
            # its equirect renderer's batch axis; we render the MPI view.)
            rel_pose = jnp.einsum("bij,bjk->bik", batch["tgt_pose"],
                                  batch["ref_pose_inv"])
            outs["output_image"] = msi_lib.deprocess_image(
                msi_lib.render_mpi_view(rgba, rel_pose, msi_depths,
                                        batch["intrinsics"]))
        return outs

    return infer


def _hres_fused_plan(hh: int, hw: int):
    """(cap, render_chunk, sweep_chunk) for the fused high-res path, or
    None when the shape doesn't band cleanly. The pole cap scales with
    resolution (the ladder's horizontal bound is kv / sin(cap*pi/H))."""
    if hw % 128 or hh % 32:
        return None
    cap = max(16, hh // 16)
    hm = hh - 2 * cap
    if hm <= 0 or hm % 32:
        return None
    # Unchunked mid render when the per-plane ladder block fits VMEM
    # comfortably (measured 23.3 vs 30.1 ms at 1024x512, chunk=64):
    # chunking exists for the 4096x2048 shape whose [4, H+2pad, W]
    # block alone is ~70 MB.
    if 4 * (hh + 64) * hw * 2 <= 20 * 1024 * 1024:
        render_chunk = 0   # 0 = unchunked (None means "plan failed")
    else:
        render_chunk = next((c for c in (128, 96, 64, 32)
                             if hm % c == 0), None)
    sweep_chunk = next((c for c in (128, 64, 32, 16) if hh % c == 0),
                       None)
    if render_chunk is None or sweep_chunk is None:
        return None
    return cap, render_chunk, sweep_chunk


def build_hres_render_fn_fused(cfg: MatryConfig, interpret: bool = False):
    """High-res re-render through the fused kernels: row-chunked dual
    sweep -> hres prepared assembly -> row-chunked ladder render (+ the
    runtime pose-contract gather fallback inside). Replaces the
    per-plane gather scan (~270M gathered rows/frame at 4096x2048) for
    blend_psv ODS configs; returns None when the fused path doesn't
    apply and the caller keeps the scan."""
    from matryodshka_tpu.ops import pallas_sweep
    hh, hw = cfg.hres_height, cfg.hres_width
    plan = _hres_fused_plan(hh, hw)
    if (plan is None or cfg.which_color_pred != "blend_psv"
            or cfg.input_type != "ODS" or not cfg.use_pallas
            or not (interpret or jax.default_backend() == "tpu")):
        return None
    cap, render_chunk, sweep_chunk = plan
    render_chunk = render_chunk or None   # 0 = unchunked ladder
    psv_depths = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_psv_planes))
    p = cfg.num_psv_planes

    @jax.jit
    def render(hres_ref, hres_src, blend_weights, alphas, ref_pose,
               src_pose, ref_pose_inv, intrinsics, tgt_pose):
        from matryodshka_tpu.geometry import render as render_geo
        from matryodshka_tpu.ops import pallas_render
        ref = msi_lib.preprocess_image(hres_ref)
        src = msi_lib.preprocess_image(hres_src)
        u_ba = msi_lib.upsample_align_corners(
            jnp.concatenate([blend_weights, alphas], axis=-1), hh, hw)
        fgF, bgF = pallas_sweep.ods_sweep_identity_chunked(
            ref, src, psv_depths, intrinsics, chunk_rows=sweep_chunk,
            out_dtype=cfg.jnp_compute_dtype, interpret=interpret)
        cap_pad = render_geo._cap_band_pad(hh, hw, cap)
        kv = pallas_render.default_bounds(hh, hw, cap)[1]
        b = fgF.shape[0]
        per = [msi_lib.assemble_hres_prepared(
            cfg.which_color_pred, u_ba[i, ..., :p], u_ba[i, ..., p:],
            fgF[i], bgF[i], None, cap, pallas_render.ROW_BLOCK,
            cap_pad, kv, dtype=cfg.jnp_compute_dtype) for i in range(b)]
        outs = {k: jnp.stack([d[k] for d in per])
                for k in ("prepared", "cap_top", "cap_bot")}
        eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
        rgb = msi_lib.deprocess_image(
            msi_lib.render_equirect_view_from_prepared(
                outs, eye, tgt_pose, psv_depths, hh, cap=cap,
                chunk_rows=render_chunk, interpret=interpret))
        depth1 = msi_lib.render_equirect_depth_from_prepared(
            outs, eye, tgt_pose, psv_depths, hh, cap=cap,
            chunk_rows=render_chunk, interpret=interpret)
        return rgb, depth1

    return render


def build_hres_render_fn(cfg: MatryConfig, mesh=None):
    """Shell-streamed high-res re-render.

    Given low-res blend weights/alphas and the hres image pair, scans over
    shells: each iteration builds a ONE-plane hres PSV, assembles its RGBA,
    reprojects it into the target view and over-composites incrementally
    (front accumulation), so peak memory is one hres shell
    (test.py:306-394 semantics, compiled into a single lax.scan).

    With a mesh whose 'shell' axis is >1 (cfg.shard_shells), the plane
    axis is SPLIT ACROSS DEVICES: each device streams its contiguous
    back-to-front block of shells, accumulating a partial premultiplied
    color and group transmittance; one all_gather of the tiny partials
    over ICI and the closed-form combine (parallel/sharded_render.py)
    finish the view. Peak per-device memory is one hres shell; wall
    clock divides by the shard count.
    """
    psv_depths = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_psv_planes))
    hh, hw = cfg.hres_height, cfg.hres_width
    num_planes = cfg.num_psv_planes
    n_shards = mesh.shape["shell"] if mesh is not None else 1

    def plane_proj(p, ref, src, u_blend, u_alpha, ref_pose, src_pose,
                   ref_pose_inv, intrinsics, tgt_pose):
        """One plane's hres PSV -> RGBA -> reprojection. p is traced."""
        depth = jax.lax.dynamic_slice_in_dim(psv_depths, p, 1)
        net_in = sweep_lib.format_network_input(
            ref, src, ref_pose, src_pose, ref_pose_inv, depth,
            intrinsics, input_type=cfg.input_type)
        fg = net_in[..., 0:3]
        bg = net_in[..., 3:6]
        wgt = jax.lax.dynamic_slice_in_dim(u_blend, p, 1, axis=3)
        alpha = jax.lax.dynamic_slice_in_dim(u_alpha, p, 1, axis=3)
        rgb = wgt * fg + (1.0 - wgt) * bg
        rgba = jnp.concatenate([rgb, alpha], -1)[:, :, :, None, :]
        proj = jax.vmap(
            lambda L, c: render_lib.reproject_equirect(
                L, jnp.eye(4), c, depth)
        )(rgba, tgt_pose)[:, 0]  # [B, H, W, 4]
        return proj[..., :3], proj[..., 3:]

    def stream_block(p0, n_local, args):
        """Back-to-front partial composite of planes [p0, p0+n_local).

        Returns (C_rgb [B,H,W,3], C_depth [B,H,W,1], T [B,H,W,1]) with
        the global plane-0 alpha-ignored convention (a_0 := 1) baked in,
        so partials combine exactly (parallel/sharded_render.py)."""
        b = args[0].shape[0]

        def body(carry, i):
            c_rgb, c_depth, t = carry
            p = p0 + i
            prgb, palpha = plane_proj(p, *args)
            palpha = jnp.where(p == 0, jnp.ones_like(palpha), palpha)
            c_rgb = prgb * palpha + c_rgb * (1.0 - palpha)
            c_depth = (p / num_planes) * palpha + c_depth * (1.0 - palpha)
            t = t * (1.0 - palpha)
            return (c_rgb, c_depth, t), None

        init = (jnp.zeros((b, hh, hw, 3)), jnp.zeros((b, hh, hw, 1)),
                jnp.ones((b, hh, hw, 1)))
        (c_rgb, c_depth, t), _ = jax.lax.scan(body, init,
                                              jnp.arange(n_local))
        return c_rgb, c_depth, t

    @jax.jit
    def render(hres_ref, hres_src, blend_weights, alphas, ref_pose,
               src_pose, ref_pose_inv, intrinsics, tgt_pose):
        ref = msi_lib.preprocess_image(hres_ref)
        src = msi_lib.preprocess_image(hres_src)
        u_blend = msi_lib.upsample_align_corners(blend_weights, hh, hw)
        u_alpha = msi_lib.upsample_align_corners(alphas, hh, hw)
        args = (ref, src, u_blend, u_alpha, ref_pose, src_pose,
                ref_pose_inv, intrinsics, tgt_pose)

        if n_shards == 1:
            rgb, depth1, _ = stream_block(0, num_planes, args)
            depth = jnp.broadcast_to(depth1, depth1.shape[:-1] + (3,))
            return msi_lib.deprocess_image(rgb), depth

        from jax.sharding import PartitionSpec as P
        from matryodshka_tpu.parallel.sharded_render import \
            combine_partials
        n_local = num_planes // n_shards

        def shard_fn(*a):
            d = jax.lax.axis_index("shell")
            c_rgb, c_depth, t = stream_block(d * n_local, n_local, a)
            Cg = jax.lax.all_gather(c_rgb, "shell")     # [G, B, H, W, 3]
            Dg = jax.lax.all_gather(c_depth, "shell")
            Tg = jax.lax.all_gather(t, "shell")
            return combine_partials(Cg, Tg), combine_partials(Dg, Tg)

        fn = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=tuple(P() for _ in args), out_specs=P(),
            check_vma=False)
        rgb, depth1 = fn(*args)
        depth = jnp.broadcast_to(depth1, depth1.shape[:-1] + (3,))
        return msi_lib.deprocess_image(rgb), depth

    return render


def save_outputs(cfg: MatryConfig, out_dir: str, dirname: str, batch,
                 outs, test_outputs: str):
    os.makedirs(out_dir, exist_ok=True)
    if "tgt_image" in test_outputs:
        write_image(f"{out_dir}/tgt_image_{dirname}.png",
                    np.asarray(batch["tgt_image"][0]) * 255.0)
        write_image(f"{out_dir}/output_tgt_{dirname}.png",
                    np.asarray(outs["output_image"][0]) * 255.0)
        if "output_depth" in outs:
            write_image(f"{out_dir}/output_depth_{dirname}.png",
                        np.asarray(outs["output_depth"][0]) * 255.0)
    if "src_image" in test_outputs:
        write_image(f"{out_dir}/src_image_{dirname}.png",
                    np.asarray(batch["src_image"][0]) * 255.0)
    if "ref_image" in test_outputs:
        write_image(f"{out_dir}/ref_image_{dirname}.png",
                    np.asarray(batch["ref_image"][0]) * 255.0)
    if "psp" in test_outputs:
        for win in range(4):
            write_image(f"{out_dir}/output_ptgt{win}_{dirname}.png",
                        np.asarray(outs[f"output_psp{win}"][0]) * 255.0)
    if "src_output_image" in test_outputs:
        write_image(f"{out_dir}/output_src_{dirname}.png",
                    np.asarray(outs["output_src"][0]) * 255.0)
    if "ref_output_image" in test_outputs:
        write_image(f"{out_dir}/output_ref_{dirname}.png",
                    np.asarray(outs["output_ref"][0]) * 255.0)
    if "psv" in test_outputs and "psv" in outs:
        psv = np.asarray(outs["psv"][0])
        for j in range(cfg.num_psv_planes):
            write_image(f"{out_dir}/psv_plane_{j:03d}.png",
                        (psv[:, :, j * 3:(j + 1) * 3] + 1) / 2 * 255)
    if "blend_weights" in test_outputs and "blend_weights" in outs:
        np.save(f"{out_dir}/blend_weights.npy",
                np.asarray(outs["blend_weights"]))
        for i in range(cfg.num_msi_planes):
            write_image(f"{out_dir}/blend_weight_{i:03d}.png",
                        np.asarray(outs["blend_weights"][0, :, :, i])
                        * 255.0)
    if "alphas" in test_outputs and "alphas" in outs:
        np.save(f"{out_dir}/alphas.npy", np.asarray(outs["alphas"]))
    if "rgba_layers" in test_outputs:
        rgba = np.asarray(outs["rgba_layers"][0])
        for i in range(cfg.num_msi_planes):
            write_image(f"{out_dir}/msi_alpha_{i:02d}.png",
                        rgba[:, :, i, 3] * 255.0)
            write_image(f"{out_dir}/msi_rgb_{i:02d}.png",
                        (rgba[:, :, i, :3] + 1) / 2 * 255.0)


def example_dirname(cfg, batch, video: bool, prefix: str) -> str:
    dirname = ""
    if video:
        dirname += "video_"
        if prefix:
            dirname += f"{prefix}_"
    dirname += batch["scene_id"][0]
    dirname += "_" + "".join(batch["image_ids"][0])
    return dirname


def main(argv=None):
    import argparse
    parser = argparse.ArgumentParser(description="matryodshka-tpu test")
    add_config_args(parser)
    parser.add_argument("--test_type", type=str, default="")
    parser.add_argument("--prefix", type=str, default="")
    parser.add_argument(
        "--test_outputs", type=str,
        default="rgba_layers_src_image_ref_image_tgt_image_"
                "blend_weights_alphas")
    parser.add_argument("--num_runs", type=int, default=-1)
    args = parser.parse_args(argv)
    from matryodshka_tpu.config import config_from_args
    from matryodshka_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    cfg = config_from_args(args)
    assert cfg.batch_size == 1, "batch_size must be 1 when testing"

    ckpt_dir = os.path.join(cfg.checkpoint_dir, cfg.experiment_name)
    manager = CheckpointManager(ckpt_dir)
    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    params, step = manager.restore_params()
    print(f"[test] restored checkpoint @ step {step}")

    out_root = os.path.join(cfg.output_root, cfg.experiment_name)
    os.makedirs(out_root, exist_ok=True)
    with open(os.path.join(out_root, "step.txt"), "w") as fh:
        fh.write(str(step))

    video = "on_video" in args.test_type

    if "high_res_only" not in args.test_type:
        loader = make_loader(cfg, training=False)
        infer = build_infer_fn(
            cfg, model, args.test_outputs,
            allow_fused=fused_net_available(cfg, model, params))
        for run, batch in enumerate(loader.batches()):
            if 0 <= args.num_runs <= run:
                break
            arrays = {k: jnp.asarray(v) for k, v in batch.items()
                      if isinstance(v, np.ndarray)}
            outs = jax.device_get(infer(params, arrays))
            dirname = example_dirname(cfg, batch, video, args.prefix)
            out_dir = os.path.join(out_root, dirname)
            print(f"[test] saving to {out_dir}")
            save_outputs(cfg, out_dir, dirname, batch, outs,
                         args.test_outputs)

    if "high_res" in args.test_type:
        assert cfg.input_type == "ODS", (
            "high_res re-rendering is an ODS (spherical MSI) feature")
        hres_cfg = cfg.replace(supervision=cfg.supervision + "_hrestgt")
        loader = OdsLoader(hres_cfg, training=False)
        mesh = None
        if cfg.shard_shells and jax.device_count() > 1:
            from matryodshka_tpu.parallel.mesh import make_mesh
            n = jax.device_count()
            while cfg.num_psv_planes % n:
                n -= 1
            if n > 1:
                mesh = make_mesh(shell=n)
                print(f"[test] sharding {cfg.num_psv_planes} shells over "
                      f"{n} devices")
        render = None
        if mesh is None:
            render = build_hres_render_fn_fused(cfg)
            if render is not None:
                print("[test] high-res re-render via the fused "
                      "chunked kernels")
        if render is None:
            render = build_hres_render_fn(cfg, mesh=mesh)
        for run, batch in enumerate(loader.batches()):
            if 0 <= args.num_runs <= run:
                break
            dirname = example_dirname(cfg, batch, video, args.prefix)
            out_dir = os.path.join(out_root, dirname)
            bw = np.load(os.path.join(out_dir, "blend_weights.npy"))
            al = np.load(os.path.join(out_dir, "alphas.npy"))
            rgb, depth = jax.device_get(render(
                jnp.asarray(batch["hres_ref_image"]),
                jnp.asarray(batch["hres_src_image"]),
                jnp.asarray(bw), jnp.asarray(al),
                jnp.asarray(batch["ref_pose"]),
                jnp.asarray(batch["src_pose"]),
                jnp.asarray(batch["ref_pose_inv"]),
                jnp.asarray(batch["intrinsics"]),
                jnp.asarray(batch["tgt_pose"])))
            print(f"[test] saving hres render to {out_dir}")
            write_image(f"{out_dir}/output_hrestgt_{dirname}.png",
                        np.asarray(rgb[0]) * 255.0)
            write_image(f"{out_dir}/output_hresdepth_{dirname}.png",
                        np.asarray(depth[0]) * 255.0)


if __name__ == "__main__":
    main()
