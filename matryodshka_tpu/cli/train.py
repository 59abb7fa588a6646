"""Training entry point (the reference's train.py, flags included).

Example (mirrors scripts/train/ods-wotemp-elpips-coord.sh):
  python train.py --cameras_glob 'glob/train/ods/*.txt' \
      --image_dir train_640x320 --experiment_name ods-run \
      --which_loss elpips --coord_net true --max_steps 140000
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from matryodshka_tpu.config import MatryConfig, parse_config
from matryodshka_tpu.data.loader import device_prefetch, make_loader
from matryodshka_tpu.geometry import sweep as sweep_lib
from matryodshka_tpu.models import msi as msi_lib
from matryodshka_tpu.training import loop as loop_lib
from matryodshka_tpu.training import state as state_lib
from matryodshka_tpu.training.step import make_loss_fn, make_train_step


def build_elpips_fn(cfg: MatryConfig, static_scale_swap=None,
                    _metric=None):
    if cfg.which_loss != "elpips":
        return None
    from matryodshka_tpu.losses.elpips import api as elpips_api
    metric = _metric or elpips_api.Metric(elpips_api.elpips_vgg(
        batch_size=cfg.batch_size, n=cfg.elpips_average_over),
        weight_path=cfg.elpips_weight_path)
    return lambda p, t, rng: metric.forward(
        p, t, rng, static_scale_swap=static_scale_swap)


def build_host_scale_step(cfg: MatryConfig, model_apply, tx, mesh,
                          steps_per_call: int = 1, _metric=None,
                          gcn_inputs=None, max_programs: int = 4):
    """A train_step(state, batch, rng) that draws the E-LPIPS ensemble's
    (scale, swap) on the HOST per dispatch and routes to one cached
    jitted step per combination (single-branch grad path — the in-graph
    16-way lax.switch backward measured 16.7 s/step on TPU, STATUS r4).

    With steps_per_call > 1, each of the K chained steps gets its OWN
    host-drawn (scale, swap) — the reference's per-step ensemble
    distribution (elpips.py:59-118) — by compiling an UNROLLED K-step
    program per drawn K-tuple (dp.make_dp_train_multi_step elpips_fns).
    Compile cost is bounded by `max_programs`: the first draws populate
    a pool of iid reference-distributed K-tuples; once full, dispatches
    sample uniformly from the pool. Pool tuples are themselves iid from
    the product distribution, so reuse keeps every step's marginal
    (scale, swap) distribution exactly the reference's in expectation
    over the pool draw; only cross-window repetition is introduced.
    Every other ensemble draw (offsets, flips, colors, dropout) still
    varies per step in-graph off state.step."""
    from matryodshka_tpu.losses.elpips import api as elpips_api
    from matryodshka_tpu.parallel import dp

    metric = _metric or elpips_api.Metric(elpips_api.elpips_vgg(
        batch_size=cfg.batch_size, n=cfg.elpips_average_over),
        weight_path=cfg.elpips_weight_path)
    host_rng = np.random.RandomState(cfg.random_seed + 1)
    cache = {}

    def draw():
        return elpips_api.sample_scale_swap_host(host_rng,
                                                 metric.config)

    def step(state, batch, rng):
        if steps_per_call > 1:
            if len(cache) < max_programs:
                key = tuple(draw() for _ in range(steps_per_call))
                if key not in cache:
                    e_fns = [build_elpips_fn(cfg, static_scale_swap=ss,
                                             _metric=metric)
                             for ss in key]
                    cache[key] = dp.make_dp_train_multi_step(
                        cfg, model_apply, tx, mesh,
                        elpips_fns=e_fns, gcn_inputs=gcn_inputs,
                        steps_per_call=steps_per_call)
            else:
                key = list(cache)[host_rng.randint(len(cache))]
        else:
            key = draw()
            if key not in cache:
                e_fn = build_elpips_fn(cfg, static_scale_swap=key,
                                       _metric=metric)
                cache[key] = dp.make_dp_train_step(
                    cfg, model_apply, tx, mesh, elpips_fn=e_fn,
                    gcn_inputs=gcn_inputs)
        return cache[key](state, batch, rng)

    return step


def make_image_summary_fn(cfg: MatryConfig, model_apply):
    psv_depths = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_psv_planes))
    msi_depths = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_msi_planes))

    @jax.jit
    def summarize(params, batch):
        outputs = msi_lib.infer_msi(lambda p, x: model_apply(p, x), params,
                                    cfg, batch, psv_depths)
        rgba = outputs["rgba_layers"]
        imgs = {}
        if cfg.input_type == "ODS":
            b = rgba.shape[0]
            eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
            out = msi_lib.render_equirect_view(rgba, eye,
                                               batch["tgt_pose"],
                                               msi_depths)
            imgs["output_image"] = msi_lib.deprocess_image(out[0])
        for i in (0, rgba.shape[3] // 2, rgba.shape[3] - 1):
            imgs[f"rgb_layer_{i}"] = msi_lib.deprocess_image(
                rgba[0, :, :, i, :3])
            imgs[f"alpha_layer_{i}"] = rgba[0, :, :, i, 3:]
        imgs["tgt_image"] = batch["tgt_image"][0]
        return imgs

    def fn(state, batch):
        return jax.device_get(summarize(state.params, batch))

    return fn


def run_dry_run(cfg: MatryConfig, loader, state, model, with_inference,
                dryrun_dir=None):
    """Sanity-check dumps (msi.py:776-967): save src/ref/tgt + every
    formatted PSV plane; with_inference additionally restores the latest
    checkpoint and dumps the predicted RGBA layers and re-renders."""
    import os

    import numpy as np

    from matryodshka_tpu.data.images import write_image
    from matryodshka_tpu.training.checkpoint import CheckpointManager

    dryrun_dir = dryrun_dir or os.path.join("dryrun", cfg.experiment_name)
    os.makedirs(dryrun_dir, exist_ok=True)
    batch = next(loader.batches())
    arrays = {k: jnp.asarray(v) for k, v in batch.items()
              if not isinstance(v, (list, str))}

    for name in ("tgt", "src", "ref"):
        write_image(f"{dryrun_dir}/{name}.png",
                    np.asarray(batch[f"{name}_image"][0]) * 255.0)
        if cfg.supervise_hrestgt:
            write_image(f"{dryrun_dir}/hres_{name}.png",
                        np.asarray(batch[f"hres_{name}_image"][0]) * 255.0)

    psv_depths = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_psv_planes))
    msi_depths = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_msi_planes))
    params = state.params
    if with_inference:
        ckpt_dir = os.path.join(cfg.checkpoint_dir, cfg.experiment_name)
        manager = CheckpointManager(ckpt_dir)
        params, step = manager.restore_params()
        print(f"[dry_run] restored checkpoint @ step {step}")

    outputs = jax.jit(lambda p, b: msi_lib.infer_msi(
        lambda pp, x: model.apply(pp, x), p, cfg, b, psv_depths))(
            params, arrays)
    psv = np.asarray(outputs["psv"][0])
    for i in range(2 * cfg.num_psv_planes):
        write_image(f"{dryrun_dir}/formatInput_{i}.png",
                    (psv[:, :, i * 3:(i + 1) * 3] + 1) / 2 * 255)

    if with_inference:
        rgba = np.asarray(outputs["rgba_layers"][0])
        for i in range(cfg.num_msi_planes):
            write_image(f"{dryrun_dir}/msi_alpha_{i:02d}.png",
                        rgba[:, :, i, 3] * 255.0)
            write_image(f"{dryrun_dir}/msi_rgb_{i:02d}.png",
                        (rgba[:, :, i, :3] + 1) / 2 * 255.0)
        if cfg.input_type == "ODS":
            b = outputs["rgba_layers"].shape[0]
            eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
            out = msi_lib.render_equirect_view(
                outputs["rgba_layers"], eye, arrays["tgt_pose"],
                msi_depths)
            write_image(f"{dryrun_dir}/tgt_rendered.png",
                        np.asarray(msi_lib.deprocess_image(out[0])) * 255.0)
            depth = msi_lib.render_equirect_depth(
                outputs["rgba_layers"], eye, arrays["tgt_pose"],
                msi_depths)
            write_image(f"{dryrun_dir}/depth_rendered.png",
                        np.asarray(depth[0]) * 255.0)
    print(f"[dry_run] wrote sanity dumps to {dryrun_dir}")


def main(argv=None):
    import argparse

    from matryodshka_tpu.config import add_config_args, config_from_args
    parser = argparse.ArgumentParser(
        description="matryodshka-tpu training")
    add_config_args(parser)
    parser.add_argument("--dry_run", action="store_true")
    parser.add_argument("--dry_run_inference", action="store_true")
    parser.add_argument("--profile_steps", type=str, default=None,
                        help="'start,stop' step window for jax.profiler")
    parser.add_argument("--steps_per_call", type=int, default=1,
                        help="chain K train steps per dispatch via an "
                        "on-device lax.scan (amortizes dispatch "
                        "overhead; bit-identical to K=1)")
    args = parser.parse_args(argv)
    from matryodshka_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    cfg = config_from_args(args)
    print(f"[train] devices: {jax.devices()}")

    loader = make_loader(cfg, training=True)
    print(f"[train] {len(loader.sequences)} sequences")

    rng = jax.random.PRNGKey(cfg.random_seed)
    state, model = state_lib.init_state(cfg, rng)

    if args.dry_run or args.dry_run_inference:
        run_dry_run(cfg, loader, state, model,
                    with_inference=args.dry_run_inference)
        return

    tx = state_lib.build_optimizer(cfg)
    gcn_inputs = None
    if cfg.gcn:
        _, mesh_coords, p2v = state_lib.build_gcn(cfg)
        gcn_inputs = (mesh_coords, p2v)
    steps_per_call = max(1, int(args.steps_per_call))
    host_scale = cfg.which_loss == "elpips" and cfg.elpips_host_scale
    elpips_metric = None
    static_log_fields = None
    if cfg.which_loss == "elpips":
        from matryodshka_tpu.losses.elpips import api as elpips_api
        elpips_metric = elpips_api.Metric(elpips_api.elpips_vgg(
            batch_size=cfg.batch_size, n=cfg.elpips_average_over),
            weight_path=cfg.elpips_weight_path)
        # Stamp calibration state into every metrics.jsonl record:
        # training on random conv features is runnable but its loss
        # values are NOT comparable to calibrated E-LPIPS numbers.
        static_log_fields = {
            "elpips_calibrated": bool(elpips_metric.calibrated)}
        if not elpips_metric.calibrated:
            print("[train] WARNING: E-LPIPS running with RANDOM conv "
                  "features (no elpips_weight_path) — loss values are "
                  "not the calibrated perceptual distance; metrics "
                  "records carry elpips_calibrated=false")
    if steps_per_call > 1:
        from matryodshka_tpu.parallel import dp, mesh as mesh_lib
        assert cfg.batch_size % cfg.num_data_shards == 0, (
            "batch_size must divide evenly across data shards")
        dmesh = mesh_lib.make_mesh(data=cfg.num_data_shards)
        if host_scale:
            step_fn = build_host_scale_step(
                cfg, model.apply, tx, dmesh,
                steps_per_call=steps_per_call, _metric=elpips_metric,
                gcn_inputs=gcn_inputs)
        else:
            step_fn = dp.make_dp_train_multi_step(
                cfg, model.apply, tx, dmesh,
                elpips_fn=build_elpips_fn(cfg, _metric=elpips_metric),
                gcn_inputs=gcn_inputs,
                steps_per_call=steps_per_call)
        batch_sharding = None  # the loop stacks K host batches per call
        print(f"[train] {steps_per_call} steps/dispatch, data-parallel "
              f"over {cfg.num_data_shards} devices"
              + (" (host-drawn elpips scale)" if host_scale else ""))
    elif cfg.num_data_shards > 1 or host_scale:
        from matryodshka_tpu.parallel import dp, mesh as mesh_lib
        assert cfg.batch_size % cfg.num_data_shards == 0, (
            "batch_size must divide evenly across data shards")
        dmesh = mesh_lib.make_mesh(data=cfg.num_data_shards)
        if host_scale:
            step_fn = build_host_scale_step(cfg, model.apply, tx, dmesh,
                                            _metric=elpips_metric,
                                            gcn_inputs=gcn_inputs)
        else:
            step_fn = dp.make_dp_train_step(
                cfg, model.apply, tx, dmesh,
                elpips_fn=build_elpips_fn(cfg, _metric=elpips_metric),
                gcn_inputs=gcn_inputs)
        batch_sharding = mesh_lib.batch_sharding(dmesh)
        print(f"[train] data-parallel over {cfg.num_data_shards} devices"
              + (" (host-drawn elpips scale)" if host_scale else ""))
    else:
        batch_sharding = None
        step_fn = make_train_step(cfg, model.apply, tx,
                                  elpips_fn=build_elpips_fn(
                                      cfg, _metric=elpips_metric),
                                  gcn_inputs=gcn_inputs)

    image_fn = None if cfg.gcn else make_image_summary_fn(cfg, model.apply)
    profile_steps = None
    if args.profile_steps:
        a, b = args.profile_steps.split(",")
        profile_steps = (int(a), int(b))
    if steps_per_call > 1:
        batches = loader.batches()  # host batches; loop stacks K/call
    else:
        batches = device_prefetch(loader.batches(), size=2,
                                  sharding=batch_sharding)
    loop_lib.train(cfg, state, step_fn, batches,
                   image_summary_fn=image_fn,
                   profile_steps=profile_steps,
                   steps_per_call=steps_per_call,
                   static_log_fields=static_log_fields)


if __name__ == "__main__":
    main()
