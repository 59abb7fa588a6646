#!/usr/bin/env python3
"""Round-4 TPU measurement session: the numbers VERDICT r3 asked for.

One process batches (the axon tunnel allows a single JAX client and
costs minutes of init/compile):

  1. training throughput — jitted DP train step at 640x320x32, L2 and
     E-LPIPS, batch 1 (the reference budget: 140k steps,
     scripts/train/ods-wotemp-elpips-coord.sh)
  2. CoordNet fused-net timing at 640x320 (the released checkpoints'
     variant)
  3. high-res fused render: 1024x512 and the chunked 4096x2048 path

Run:  python tools/r4_hw_session.py [phase ...]
(no args = all phases)
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def phase(name, fn):
    print(f"\n===== {name} =====", flush=True)
    t0 = time.perf_counter()
    try:
        fn()
        print(f"===== {name}: done ({time.perf_counter() - t0:.0f}s) =====",
              flush=True)
    except Exception:  # noqa: BLE001 — keep later phases alive
        print(f"===== {name}: FAILED ({time.perf_counter() - t0:.0f}s) =====",
              flush=True)
        traceback.print_exc(limit=8)


def _ods_batch(cfg, seed=0):
    import jax.numpy as jnp
    rng = np.random.RandomState(seed)
    b, h, w = cfg.batch_size, cfg.height, cfg.width
    eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
    intr = np.tile(np.eye(3, dtype=np.float32)[None], (b, 1, 1))
    intr[:, 0, 0] = 0.032
    return {
        "ref_image": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
        "src_image": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
        "tgt_image": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
        "ref_pose": eye, "src_pose": eye, "ref_pose_inv": eye,
        "tgt_pose": jnp.tile(jnp.asarray([0.05, 0.0, 0.0])[None], (b, 1)),
        "intrinsics": jnp.asarray(intr),
    }


def train_throughput():
    """Steady-state DP train-step time at the production shape, both
    loss variants. The reference trains 140k steps at batch 1
    (scripts/train/ods-wotemp-elpips-coord.sh:7)."""
    import jax

    from matryodshka_tpu.cli.train import build_elpips_fn
    from matryodshka_tpu.config import MatryConfig
    from matryodshka_tpu.parallel import dp, mesh as mesh_lib
    from matryodshka_tpu.training import state as state_lib

    for loss in ("pixel", "elpips"):
        cfg = MatryConfig(height=320, width=640, num_psv_planes=32,
                          num_msi_planes=32, ngf=64, batch_size=1,
                          which_loss=loss, coord_net=True,
                          compute_dtype="bfloat16").validate()
        mesh = mesh_lib.make_mesh(data=1)
        state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
        tx = state_lib.build_optimizer(cfg)
        elpips_fn = build_elpips_fn(cfg) if loss == "elpips" else None
        step_fn = dp.make_dp_train_step(cfg, model.apply, tx, mesh,
                                        elpips_fn=elpips_fn)
        batch = dp.shard_batch(
            {k: np.asarray(v) for k, v in _ods_batch(cfg).items()}, mesh)
        key = jax.random.PRNGKey(1)
        t0 = time.time()
        state, metrics = step_fn(state, batch, key)
        jax.block_until_ready(metrics["total_loss"])
        compile_s = time.time() - t0
        # The production pattern (loop.py): ONE constant base key, the
        # per-step fold_in happens in-graph off state.step. Any
        # host-side per-step key derivation (fold_in(key, i) with a
        # python int, pre-split key slicing) costs a fresh tiny
        # compile+dispatch per step through the relay — measured
        # 4.2-5.7 s/step vs 0.14 (train_probe2, r4c session).
        n = 10 if loss == "pixel" else 6
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step_fn(state, batch, key)
        jax.block_until_ready(metrics["total_loss"])
        ms = (time.perf_counter() - t0) / n * 1000.0
        hours_140k = ms / 1000.0 * 140_000 / 3600.0
        print(f"[train] loss={loss}: {ms:.1f} ms/step "
              f"({1000.0 / ms:.2f} steps/s), compile {compile_s:.0f}s, "
              f"140k steps = {hours_140k:.1f} h "
              f"(loss={float(metrics['total_loss']):.4f})", flush=True)


def net_x2_ab():
    """Planar net kernel: single-slot vs double-buffered conv1_1 x
    window (profile r4: net_planar 4.73 ms vs row-major-x 4.30 ms —
    the planar window is the only non-double-buffered DMA). Arms
    perf_flags 'net_x2' when the 2-slot build wins >2% and matches."""
    import jax
    import jax.numpy as jnp

    from matryodshka_tpu.config import MatryConfig
    from matryodshka_tpu.models import msi as msi_lib
    from matryodshka_tpu.ops import pallas_net
    from matryodshka_tpu.training import state as state_lib
    from tools.r3_hw_session import _arm_flag

    CHAIN = 20
    h, w = 320, 640
    cfg = MatryConfig(height=h, width=w, num_psv_planes=32,
                      num_msi_planes=32, ngf=64, batch_size=1,
                      compute_dtype="bfloat16").validate()
    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    net_ops, ngf, k, flipped, variant = msi_lib.fused_net_ops(
        model, state.params, cfg)
    pad = pallas_net.X_ROW_PAD
    pc = cfg.num_psv_planes * 3
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(pc, h + 2 * pad, w).astype(np.float32),
                     cfg.jnp_compute_dtype)
    x1 = jnp.asarray(rng.rand(pc, h + 2 * pad, w).astype(np.float32),
                     cfg.jnp_compute_dtype)

    res, outs = {}, {}
    for slots in (1, 2):
        @jax.jit
        def chain(a, b, slots=slots):
            def body(_, xs):
                aa, bb = xs
                y = pallas_net.unet_forward((aa, bb), net_ops, ngf, k,
                                            flipped=flipped,
                                            variant=variant,
                                            x_slots=slots)
                dep = (y.astype(jnp.float32).mean() * 1e-6).astype(
                    aa.dtype)
                return (aa * 0.999 + dep, bb)
            return jax.lax.fori_loop(0, CHAIN, body, (a, b))
        try:
            for _ in range(2):
                jax.block_until_ready(chain(x0, x1))
            t0 = time.perf_counter()
            out = None
            for _ in range(3):
                out = chain(x0, x1)
            jax.block_until_ready(out)
            res[slots] = (time.perf_counter() - t0) / (3 * CHAIN) * 1e3
            outs[slots] = jax.jit(
                lambda a, b, s=slots: pallas_net.unet_forward(
                    (a, b), net_ops, ngf, k, flipped=flipped,
                    variant=variant, x_slots=s))(x0, x1)
            print(f"[net_x2] x_slots={slots}: {res[slots]:.2f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[net_x2] x_slots={slots}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    if 1 in res and 2 in res:
        err = float(jnp.max(jnp.abs(outs[1] - outs[2])))
        win = res[2] < 0.98 * res[1]
        print(f"[net_x2] exactness {err:.2e}; win={win}", flush=True)
        _arm_flag("net_x2", bool(win and err == 0.0))


def coordnet_net():
    """The CoordNet whole-net kernel (the released checkpoints'
    variant) vs the wrap variant, chained, production shape."""
    import jax
    import jax.numpy as jnp

    from matryodshka_tpu.config import MatryConfig
    from matryodshka_tpu.models import msi as msi_lib
    from matryodshka_tpu.ops import pallas_net
    from matryodshka_tpu.training import state as state_lib

    CHAIN = 20
    h, w = 320, 640
    for coord in (False, True):
        cfg = MatryConfig(height=h, width=w, num_psv_planes=32,
                          num_msi_planes=32, ngf=64, batch_size=1,
                          coord_net=coord,
                          compute_dtype="bfloat16").validate()
        state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
        fused = msi_lib.fused_net_ops(model, state.params, cfg)
        net_ops, ngf, k, flipped, variant = fused
        pad = pallas_net.X_ROW_PAD
        pc = cfg.num_psv_planes * 3
        x0 = jnp.zeros((pc, h + 2 * pad, w), cfg.jnp_compute_dtype)

        @jax.jit
        def chain(a, b):
            def body(_, xs):
                aa, bb = xs
                y = pallas_net.unet_forward((aa, bb), net_ops, ngf, k,
                                            flipped=flipped,
                                            variant=variant)
                dep = (y.astype(jnp.float32).mean() * 1e-6).astype(
                    aa.dtype)
                return (aa * 0.999 + dep, bb)
            return jax.lax.fori_loop(0, CHAIN, body, (a, b))

        for _ in range(2):
            jax.block_until_ready(chain(x0, x0))
        t0 = time.perf_counter()
        out = None
        for _ in range(3):
            out = chain(x0, x0)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / (3 * CHAIN) * 1000.0
        print(f"[coordnet] variant={variant}: net_fused {ms:.2f} ms",
              flush=True)


def hres_fps():
    """High-res fused re-render (the cli/test.py --test_type high_res
    flow): chunked dual sweep + hres assembly + chunked ladder.
    Reference: test.py:284-394 (4096x2048 supervision images)."""
    import jax
    import jax.numpy as jnp

    from matryodshka_tpu.cli.test import build_hres_render_fn_fused
    from matryodshka_tpu.config import MatryConfig

    for hh, hw in ((512, 1024), (2048, 4096)):
        cfg = MatryConfig(height=320, width=640, num_psv_planes=32,
                          num_msi_planes=32, ngf=64, batch_size=1,
                          hres_height=hh, hres_width=hw,
                          compute_dtype="bfloat16").validate()
        fn = build_hres_render_fn_fused(cfg)
        if fn is None:
            print(f"[hres] {hw}x{hh}: fused plan unavailable", flush=True)
            continue
        rng = np.random.RandomState(0)
        b, h, w, p = 1, cfg.height, cfg.width, cfg.num_msi_planes
        eye = jnp.eye(4)[None]
        intr = np.eye(3, dtype=np.float32)[None].copy()
        intr[:, 0, 0] = 0.032
        args = (
            jnp.asarray(rng.rand(b, hh, hw, 3).astype(np.float32)),
            jnp.asarray(rng.rand(b, hh, hw, 3).astype(np.float32)),
            jnp.asarray(rng.rand(b, h, w, p).astype(np.float32)),
            jnp.asarray(rng.rand(b, h, w, p).astype(np.float32)),
            eye, eye, eye, jnp.asarray(intr),
            jnp.asarray([[0.02, 0.01, -0.015]]),
        )
        jfn = jax.jit(fn)
        t0 = time.time()
        jax.block_until_ready(jfn(*args))
        compile_s = time.time() - t0
        iters = 5
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = jfn(*args)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / iters * 1000.0
        print(f"[hres] {hw}x{hh}: {ms:.1f} ms/frame "
              f"({1000.0 / ms:.1f} fps), compile {compile_s:.0f}s",
              flush=True)


def ladder_parts():
    from tools import exp_ladder_parts
    exp_ladder_parts.main()


def vtap_ab():
    """vtap rung form (vertical pre-blend once per rung, one FMA per
    active tile) vs the per-tile (k, m) branch cascade — on the tiled
    prepared kernel AND the production blend-fused kernel. Arms
    perf_flags 'vtap' when both win and match."""
    import jax
    import jax.numpy as jnp

    from matryodshka_tpu.geometry import intersect
    from matryodshka_tpu.geometry import sweep as sweep_lib
    from matryodshka_tpu.ops import pallas_render as pr
    from tools.r3_hw_session import _arm_flag

    H, W, P = 320, 640, 32
    CAP, RB = pr.CAP_ROWS, pr.ROW_BLOCK
    rng = np.random.RandomState(0)
    radii = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, P))
    pose = jnp.eye(4)
    kh, kv = pr.default_bounds(H, W, CAP)
    wb = pr.default_wb(W)
    CHAIN = 20

    rgba = np.asarray(rng.rand(H, W, P, 4), np.float32)
    wins, matches = [], []

    def timeit(fn, *args, iters=3, warmup=2):
        for _ in range(warmup):
            jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / (iters * CHAIN) * 1000.0

    # --- tiled prepared kernel ---
    for tname, tgt in (("bench", jnp.asarray([0.05, 0.0, 0.0])),
                       ("diag", jnp.asarray([0.05, 0.05, 0.05]))):
        u, v = intersect.intersect_sphere_uv(pose, tgt, radii, W, H)
        um = jax.block_until_ready(u[:, CAP:H - CAP].astype(jnp.float32))
        vm = jax.block_until_ready(v[:, CAP:H - CAP].astype(jnp.float32))
        layers = jax.block_until_ready(pr.prepare_layers(
            jnp.asarray(rgba), CAP, RB, kv, jnp.bfloat16))

        res, outs = {}, {}
        for vt in (False, True):
            @jax.jit
            def chain(lay, vt=vt):
                def body(_, l):
                    o = pr._ladder_render_mid_uv(
                        l, um, vm, CAP, RB, kh, kv, wb=wb, vtap=vt)
                    return l + o.mean().astype(l.dtype) * 1e-6
                return jax.lax.fori_loop(0, CHAIN, body, lay)
            try:
                res[vt] = timeit(chain, layers)
                outs[vt] = jax.jit(
                    lambda l, vt=vt: pr._ladder_render_mid_uv(
                        l, um, vm, CAP, RB, kh, kv, wb=wb,
                        vtap=vt))(layers)
                print(f"[vtap] tiled/{tname} vtap={vt}: "
                      f"{res[vt]:.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"[vtap] tiled/{tname} vtap={vt}: FAIL "
                      f"{type(e).__name__}: {str(e)[:150]}", flush=True)
        if False in res and True in res:
            err = float(jnp.max(jnp.abs(outs[False] - outs[True])))
            wins.append(res[True] < res[False])
            matches.append(err < 1e-4)
            print(f"[vtap] tiled/{tname}: err {err:.2e}", flush=True)

    # --- production blend-fused e2e (bench operands) ---
    from matryodshka_tpu.config import MatryConfig
    from matryodshka_tpu.models import msi as msi_lib
    from matryodshka_tpu.training import state as state_lib
    from tools.r4_hw_session import _ods_batch

    cfg = MatryConfig(height=H, width=W, num_psv_planes=P,
                      num_msi_planes=P, ngf=64, batch_size=1,
                      compute_dtype="bfloat16").validate()
    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    batch = _ods_batch(cfg)
    psv_depths = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_psv_planes))
    fused = msi_lib.fused_net_ops(model, state.params, cfg)

    res, outs = {}, {}
    for vt in (False, True):
        pr.DEFAULT_VTAP = vt    # resolved in the non-jitted wrappers

        def e2e(params, batch):
            o = msi_lib.infer_msi_prepared(
                lambda p_, x: model.apply(p_, x), params, cfg, batch,
                psv_depths, fused_net=fused, blend_fused=True)
            eye = jnp.tile(jnp.eye(4)[None],
                           (o["msi_pred"].shape[0], 1, 1))
            return msi_lib.render_equirect_view_from_prepared(
                o, eye, batch["tgt_pose"], psv_depths, cfg.height)

        @jax.jit
        def chain(params, batch):
            def body(_, ref):
                b2 = dict(batch)
                b2["ref_image"] = ref
                return jnp.clip(e2e(params, b2), 0.0, 1.0)
            return jax.lax.fori_loop(0, CHAIN, body,
                                     batch["ref_image"])
        try:
            res[vt] = timeit(chain, state.params, batch)
            outs[vt] = jax.jit(e2e)(state.params, batch)
            print(f"[vtap] ftbb-e2e vtap={vt}: {res[vt]:.2f} ms "
                  f"({1000.0 / res[vt]:.1f} fps)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[vtap] ftbb-e2e vtap={vt}: FAIL "
                  f"{type(e).__name__}: {str(e)[:150]}", flush=True)
    pr.DEFAULT_VTAP = bool(pr._PERF_FLAGS.get("vtap", False))
    if False in res and True in res:
        err = float(jnp.max(jnp.abs(outs[False] - outs[True])))
        wins.append(res[True] < res[False])
        matches.append(err < 2e-3)
        print(f"[vtap] ftbb-e2e: err {err:.2e}", flush=True)
        arm = bool(all(matches) and wins.count(True) >= 2
                   and wins[-1])     # e2e must win, >=2 of 3 overall
        print(f"[vtap] wins={wins} matches={matches} -> arm={arm}",
              flush=True)
        _arm_flag("vtap", arm)


def roll16_ab():
    """roll16 (bf16 rolled band): the roll chain is the ladder's
    largest cost (parts split: 1.53 ms of 4.75) and scales with band
    bytes; bf16 halves them, the tap FMA pays an exact bf16->f32
    promote. Bit-exact on the bf16 prepared stack. A/B on the tiled
    prepared kernel (bench + diag poses) AND the production blend-fused
    e2e; arms perf_flags 'roll16' when e2e wins and everything
    matches."""
    import jax
    import jax.numpy as jnp

    from matryodshka_tpu.geometry import intersect
    from matryodshka_tpu.geometry import sweep as sweep_lib
    from matryodshka_tpu.ops import pallas_render as pr
    from tools.r3_hw_session import _arm_flag

    H, W, P = 320, 640, 32
    CAP, RB = pr.CAP_ROWS, pr.ROW_BLOCK
    rng = np.random.RandomState(0)
    radii = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, P))
    pose = jnp.eye(4)
    kh, kv = pr.default_bounds(H, W, CAP)
    wb = pr.default_wb(W)
    CHAIN = 20

    rgba = np.asarray(rng.rand(H, W, P, 4), np.float32)
    wins, matches = [], []

    def timeit(fn, *args, iters=3, warmup=2):
        for _ in range(warmup):
            jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / (iters * CHAIN) * 1000.0

    for tname, tgt in (("bench", jnp.asarray([0.05, 0.0, 0.0])),
                       ("diag", jnp.asarray([0.05, 0.05, 0.05]))):
        u, v = intersect.intersect_sphere_uv(pose, tgt, radii, W, H)
        um = jax.block_until_ready(u[:, CAP:H - CAP].astype(jnp.float32))
        vm = jax.block_until_ready(v[:, CAP:H - CAP].astype(jnp.float32))
        layers = jax.block_until_ready(pr.prepare_layers(
            jnp.asarray(rgba), CAP, RB, kv, jnp.bfloat16))

        res, outs = {}, {}
        for r16 in (False, True):
            @jax.jit
            def chain(lay, r16=r16):
                def body(_, l):
                    o = pr._ladder_render_mid_uv(
                        l, um, vm, CAP, RB, kh, kv, wb=wb, roll16=r16)
                    return l + o.mean().astype(l.dtype) * 1e-6
                return jax.lax.fori_loop(0, CHAIN, body, lay)
            try:
                res[r16] = timeit(chain, layers)
                outs[r16] = jax.jit(
                    lambda l, r16=r16: pr._ladder_render_mid_uv(
                        l, um, vm, CAP, RB, kh, kv, wb=wb,
                        roll16=r16))(layers)
                print(f"[roll16] tiled/{tname} roll16={r16}: "
                      f"{res[r16]:.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"[roll16] tiled/{tname} roll16={r16}: FAIL "
                      f"{type(e).__name__}: {str(e)[:150]}", flush=True)
        if False in res and True in res:
            err = float(jnp.max(jnp.abs(outs[False] - outs[True])))
            wins.append(res[True] < res[False])
            matches.append(err == 0.0)     # bit-exact on bf16 layers
            print(f"[roll16] tiled/{tname}: err {err:.2e}", flush=True)

    # --- production blend-fused e2e (bench operands) ---
    from matryodshka_tpu.config import MatryConfig
    from matryodshka_tpu.models import msi as msi_lib
    from matryodshka_tpu.training import state as state_lib

    cfg = MatryConfig(height=H, width=W, num_psv_planes=P,
                      num_msi_planes=P, ngf=64, batch_size=1,
                      compute_dtype="bfloat16").validate()
    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    batch = _ods_batch(cfg)
    psv_depths = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_psv_planes))
    fused = msi_lib.fused_net_ops(model, state.params, cfg)

    res, outs = {}, {}
    for r16 in (False, True):
        pr.DEFAULT_ROLL16 = r16    # resolved in the non-jitted wrappers

        def e2e(params, batch):
            o = msi_lib.infer_msi_prepared(
                lambda p_, x: model.apply(p_, x), params, cfg, batch,
                psv_depths, fused_net=fused, blend_fused=True)
            eye = jnp.tile(jnp.eye(4)[None],
                           (o["msi_pred"].shape[0], 1, 1))
            return msi_lib.render_equirect_view_from_prepared(
                o, eye, batch["tgt_pose"], psv_depths, cfg.height)

        @jax.jit
        def chain(params, batch):
            def body(_, ref):
                b2 = dict(batch)
                b2["ref_image"] = ref
                return jnp.clip(e2e(params, b2), 0.0, 1.0)
            return jax.lax.fori_loop(0, CHAIN, body,
                                     batch["ref_image"])
        try:
            res[r16] = timeit(chain, state.params, batch)
            outs[r16] = jax.jit(e2e)(state.params, batch)
            print(f"[roll16] ftbb-e2e roll16={r16}: {res[r16]:.2f} ms "
                  f"({1000.0 / res[r16]:.1f} fps)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[roll16] ftbb-e2e roll16={r16}: FAIL "
                  f"{type(e).__name__}: {str(e)[:150]}", flush=True)
    pr.DEFAULT_ROLL16 = bool(pr._PERF_FLAGS.get("roll16", False))
    if False in res and True in res:
        # the blend-fused band is rounded to bf16 under roll16 — gate at
        # the bf16 storage-noise tolerance the bench itself uses
        err = float(jnp.max(jnp.abs(outs[False] - outs[True])))
        wins.append(res[True] < res[False])
        matches.append(err < 2e-2)
        print(f"[roll16] ftbb-e2e: err {err:.2e}", flush=True)
        arm = bool(all(matches) and wins[-1])     # e2e must win
        print(f"[roll16] wins={wins} matches={matches} -> arm={arm}",
              flush=True)
        _arm_flag("roll16", arm)


def bf16_roll_probe():
    """Minimal Mosaic lowering probe: does pltpu.roll compile on a bf16
    ref on this toolchain? (roll16's hardware A/B failed with an opaque
    compile-helper crash; this isolates whether the bf16 lane rotate
    itself is the unsupported op.)"""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        def kern(x_ref, o_ref):
            o_ref[:, :] = pltpu.roll(x_ref[:, :], 1, axis=1)
        x = jnp.arange(8 * 256, dtype=jnp.float32).reshape(8, 256)
        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((8, 256), dt),
            )(x.astype(dt))
            ok = bool(jnp.all(out[:, 1:] == x.astype(dt)[:, :-1]))
            print(f"[bf16roll] {name}: compiled, shift-correct={ok}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[bf16roll] {name}: FAIL {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


PHASES = {
    "bf16roll": bf16_roll_probe,
    "net_x2": net_x2_ab,
    "ladder_parts": ladder_parts,
    "vtap": vtap_ab,
    "roll16": roll16_ab,
    "coordnet": coordnet_net,
    "train": train_throughput,
    "hres": hres_fps,
}


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/matry_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        list(PHASES)
    for n in names:
        phase(n, PHASES[n])


if __name__ == "__main__":
    main()
