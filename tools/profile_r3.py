#!/usr/bin/env python3
"""Round-3 fine-grained profile of the prepared (fused) pipeline.

Times every sub-stage of the hot path on the real TPU, chained inside
one jit (per-dispatch relay RTT ~25-35 ms would otherwise swamp the
numbers):

  sweep kernel | rm-layout fix | net kernel | assemble | uv+tables |
  ladder mid | pole caps | full assemble+render | e2e

Run:  python tools/profile_r3.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/matry_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from matryodshka_tpu.geometry import intersect
    from matryodshka_tpu.geometry import render as render_geo
    from matryodshka_tpu.geometry import sweep as sweep_lib
    from matryodshka_tpu.models import msi as msi_lib
    from matryodshka_tpu.ops import pallas_net, pallas_render, pallas_sweep
    from matryodshka_tpu.training import state as state_lib

    cfg = _flagship_cfg()
    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    batch = _synthetic_batch(cfg)
    psv_depths = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_psv_planes))
    msi_depths = jnp.asarray(sweep_lib.inv_depths(
        cfg.min_depth, cfg.max_depth, cfg.num_msi_planes))
    h, w, p = cfg.height, cfg.width, cfg.num_msi_planes
    cap = pallas_render.CAP_ROWS
    cap_pad = render_geo._cap_band_pad(h, w, cap)

    fused = msi_lib.fused_net_ops(model, state.params, cfg)
    net_ops, ngf, k, net_flipped = fused[:4]
    net_ops = [jnp.asarray(o) for o in net_ops]

    CHAIN = 20

    def timeit(fn, *args, iters=3, warmup=2):
        for _ in range(warmup):
            jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / (iters * CHAIN) * 1000.0

    ref = msi_lib.preprocess_image(batch["ref_image"])
    src = msi_lib.preprocess_image(batch["src_image"])
    intr = batch["intrinsics"]

    # ---- stage inputs (computed once, outside timing) ----
    _, fgF, bgF = jax.jit(lambda r, s: pallas_sweep.ods_sweep_identity_prepared(
        r, s, psv_depths, intr, out_dtype=cfg.jnp_compute_dtype))(ref, src)
    fgF = jax.block_until_ready(fgF)

    def _rm(v):
        p_, c_, hh, ww = v.shape
        u = v if net_flipped else jnp.flip(v, axis=3)
        u = u.reshape(p_ * c_, hh, ww)
        return jnp.transpose(u, (1, 0, 2))

    x_rm = jax.jit(lambda a, b: jnp.concatenate(
        [_rm(a[0]), _rm(b[0])], axis=1).astype(cfg.jnp_compute_dtype))(
            fgF, bgF)
    x_rm = jax.block_until_ready(x_rm)

    pred_rm = jax.jit(lambda x: pallas_net.unet_forward(
        x, net_ops, ngf, k, flipped=net_flipped))(x_rm)
    pred_rm = jax.block_until_ready(pred_rm)

    prep = jax.jit(lambda pr, a, b: msi_lib.assemble_rgba_prepared(
        cfg.which_color_pred, pr, a[0], b[0], p, cap_pad=cap_pad,
        dtype=cfg.jnp_compute_dtype, pred_layout="hkwF" if net_flipped else "hkw"))(pred_rm, fgF, bgF)
    prep = jax.block_until_ready(prep)

    pose = jnp.eye(4)
    tgt = batch["tgt_pose"][0]
    radii = msi_depths

    uv_full = jax.jit(lambda t: intersect.intersect_sphere(
        pose, t, radii, w, h))(tgt)
    uv_full = jax.block_until_ready(uv_full)
    geom = pallas_render.prepared_geometry(h, w)
    uvm = jax.block_until_ready(
        jnp.transpose(uv_full[:, cap:h - cap], (0, 3, 1, 2)).astype(
            jnp.float32))

    # ---- chained stage timers ----
    def chain(body, x0):
        @jax.jit
        def c(x):
            return jax.lax.fori_loop(0, CHAIN, lambda _, v: body(v), x)
        return c, x0

    # 1. sweep kernel (image -> fgF/bgF + perturb feedback)
    @jax.jit
    def sweep_chain(r):
        def body(_, rr):
            _, fg, bg = pallas_sweep.ods_sweep_identity_prepared(
                rr, src, psv_depths, intr, out_dtype=cfg.jnp_compute_dtype)
            return rr * 0.999 + jnp.mean(fg.astype(jnp.float32)) * 1e-6
        return jax.lax.fori_loop(0, CHAIN, body, r)
    ms_sweep = timeit(sweep_chain, ref)

    # 1b. planar sweep (padded plane-major, the fused-net production path)
    @jax.jit
    def sweep_planar_chain(r):
        def body(_, rr):
            fg, bg = pallas_sweep.ods_sweep_identity_planar(
                rr, src, psv_depths, intr, out_dtype=cfg.jnp_compute_dtype)
            return rr * 0.999 + jnp.mean(fg.astype(jnp.float32)) * 1e-6
        return jax.lax.fori_loop(0, CHAIN, body, r)
    ms_sweep_planar = timeit(sweep_planar_chain, ref)

    # 2. rm layout fix alone
    @jax.jit
    def rm_chain(a):
        def body(_, aa):
            x = jnp.concatenate([_rm(aa[0]), _rm(bgF[0])],
                                axis=1).astype(cfg.jnp_compute_dtype)
            return aa + x.astype(jnp.float32).mean() * 1e-6
        return jax.lax.fori_loop(0, CHAIN, body, a)
    ms_rm = timeit(rm_chain, fgF.astype(jnp.float32))

    # 3. net kernel alone (bf16 row-major in)
    @jax.jit
    def net_chain(x):
        def body(_, xx):
            y = pallas_net.unet_forward(xx, net_ops, ngf, k,
                                        flipped=net_flipped)
            x2 = jnp.tile(y[:, :64, :], (1, 3, 1)).astype(x.dtype)
            return x2 * 0.1 + xx * 0.9
        return jax.lax.fori_loop(0, CHAIN, body, x)
    ms_net = timeit(net_chain, x_rm)

    # 3b. net kernel, PLANAR operands (production path: no rm pass)
    pad = pallas_sweep.NET_ROW_PAD
    pcp = p * 3

    @jax.jit
    def net_planar_chain(x0, x1):
        def body(_, xs):
            a, bb = xs
            y = pallas_net.unet_forward((a, bb), net_ops, ngf, k,
                                        flipped=net_flipped)
            dep = (y.astype(jnp.float32).mean() * 1e-6).astype(a.dtype)
            return (a * 0.999 + dep, bb)
        return jax.lax.fori_loop(0, CHAIN, body, (x0, x1))
    fgP0 = jnp.zeros((pcp, h + 2 * pad, w), cfg.jnp_compute_dtype)
    ms_net_planar = timeit(net_planar_chain, fgP0, fgP0)

    # 4. assemble alone (pred -> prepared + caps)
    @jax.jit
    def asm_chain(pr):
        def body(_, pp):
            d = msi_lib.assemble_rgba_prepared(
                cfg.which_color_pred, pp, fgF[0], bgF[0], p,
                cap_pad=cap_pad, dtype=cfg.jnp_compute_dtype,
                pred_layout="hkwF" if net_flipped else "hkw")
            return pp * 0.999 + d["prepared"].astype(
                jnp.float32).mean() * 1e-6
        return jax.lax.fori_loop(0, CHAIN, body, pr)
    ms_asm = timeit(asm_chain, pred_rm.astype(jnp.float32))

    # 5. uv + residual tables
    @jax.jit
    def uv_chain(t):
        def body(_, tt):
            uv = intersect.intersect_sphere(pose, tt, radii, w, h)
            um = jnp.transpose(uv[:, cap:h - cap], (0, 3, 1, 2))
            tabs = pallas_render._residual_tables(
                um[:, 0], um[:, 1], cap, geom["row_block"],
                geom["kh_max"], geom["kv_max"])
            s = sum(x.sum() for x in tabs).astype(jnp.float32)
            return tt + s * 1e-20
        return jax.lax.fori_loop(0, CHAIN, body, t)
    ms_uv = timeit(uv_chain, tgt)

    # 6. ladder mid kernel alone (full-width and hybrid column-tiled)
    def make_mid_chain(wb):
        @jax.jit
        def mid_chain(lay):
            def body(_, ll):
                o = pallas_render._ladder_render_mid(
                    ll, uvm, cap, geom["row_block"], geom["kh_max"],
                    geom["kv_max"], wb=wb)
                return ll + o.mean().astype(ll.dtype) * 1e-6
            return jax.lax.fori_loop(0, CHAIN, body, lay)
        return mid_chain
    ms_mid = timeit(make_mid_chain(None), prep["prepared"])
    wb_def = pallas_render.default_wb(w)
    ms_mid_wb = (timeit(make_mid_chain(wb_def), prep["prepared"])
                 if wb_def else ms_mid)

    # 7. pole caps alone
    @jax.jit
    def caps_chain(ct):
        def body(_, cc):
            top = render_geo._cap_over_band(
                cc, uv_full[:, :cap], float(cap_pad))
            bot = render_geo._cap_over_band(
                prep["cap_bot"], uv_full[:, h - cap:],
                float(cap_pad + cap - h))
            return cc * 0.999 + (top.mean() + bot.mean()).astype(
                cc.dtype) * 1e-6
        return jax.lax.fori_loop(0, CHAIN, body, ct)
    ms_caps = timeit(caps_chain, prep["cap_top"])

    # 8. full assemble+render from pred
    outs_all = {kk: jnp.stack([vv]) for kk, vv in prep.items()}

    @jax.jit
    def ar_chain(pr):
        def body(_, pp):
            d = msi_lib.assemble_rgba_prepared(
                cfg.which_color_pred, pp, fgF[0], bgF[0], p,
                cap_pad=cap_pad, dtype=cfg.jnp_compute_dtype,
                pred_layout="hkwF" if net_flipped else "hkw")
            outs = {kk: vv[None] for kk, vv in d.items()}
            eye = jnp.eye(4)[None]
            img = msi_lib.render_equirect_view_from_prepared(
                outs, eye, batch["tgt_pose"], msi_depths, h)
            return pp * 0.999 + img.mean().astype(pp.dtype) * 1e-6
        return jax.lax.fori_loop(0, CHAIN, body, pr)
    ms_ar = timeit(ar_chain, pred_rm.astype(jnp.float32))

    print(f"[prof] sweep_kernel={ms_sweep:.2f} "
          f"sweep_planar={ms_sweep_planar:.2f} rm_layout={ms_rm:.2f} "
          f"net_kernel={ms_net:.2f} net_planar={ms_net_planar:.2f} "
          f"assemble={ms_asm:.2f} "
          f"uv+tables={ms_uv:.2f} ladder_mid={ms_mid:.2f} "
          f"ladder_mid_wb={ms_mid_wb:.2f} "
          f"caps={ms_caps:.2f} assemble+render={ms_ar:.2f}")
    total = ms_sweep_planar + ms_net_planar + ms_ar
    print(f"[prof] stage sum (sweep_planar+net_planar+ar) = "
          f"{total:.2f} ms")


if __name__ == "__main__":
    main()
