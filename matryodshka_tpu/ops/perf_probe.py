"""Probe-and-arm backend-sensitive kernel flags (VERDICT r4 item 5).

Some perf flags gate kernels that a given TPU compile-helper build may
simply REJECT (observed: the 2026-08-19 backend swap started refusing
the net kernel's 2-slot double-buffered x window that compiled fine
hours earlier, and bf16 pltpu.roll lowering has never compiled on v5e).
A static perf_flags.json armed against backend A silently forfeits
measured wins — or worse, crashes compiles — on backend B.

`ensure_armed()` fixes that: it fingerprints the live backend and, when
the fingerprint differs from the one recorded in perf_flags.json,
compile-probes each backend-sensitive flag at production shape, rewrites
the file (flags + new fingerprint), and refreshes the already-imported
module globals so the current process picks the result up immediately.
Matching fingerprint = cached = no compile cost.

Flag classes:
  * COMPILE-SENSITIVE (probed here): net_x2, roll16 — their measured
    wins (net 4.84->4.52 ms bit-exact; roll chain is the ladder's
    largest slab) apply whenever the backend accepts the kernel, so
    compile success IS the arming decision.
  * MEASURED A/B (not probed): ftb, ftbb, vtap — any backend compiles
    them; whether they win is a content/pose question settled by the
    hardware sessions (tools/r3_hw_session.py, r4). Their stored values
    are preserved across re-arms.
"""

from __future__ import annotations

import json
from typing import Optional

import jax
import jax.numpy as jnp

from matryodshka_tpu.ops import pallas_net, pallas_render

#: flags ensure_armed() probes; everything else in PERF_FLAG_SCHEMA is
#: a measured A/B result that re-arming must not clobber.
COMPILE_SENSITIVE = ("net_x2", "roll16", "sdyn")


def backend_fingerprint() -> str:
    """Identity of the live compile backend, coarse enough to be stable
    across processes but fine enough to catch relay backend swaps."""
    dev = jax.devices()[0]
    parts = [
        jax.default_backend(),
        getattr(dev, "device_kind", "?"),
        f"jax-{jax.__version__}",
    ]
    pv = getattr(getattr(dev, "client", None), "platform_version", None)
    if pv:
        parts.append(str(pv).replace("\n", " ").strip())
    return "|".join(parts)


def _probe_net_x2(fused_net, height: int, width: int, psv_planes: int,
                  dtype) -> bool:
    """Compile (and run once) the whole-net kernel with the 2-slot
    double-buffered x window at the production shape. fused_net is the
    (ops, ngf, k_out, flipped, variant) tuple from
    models.msi.fused_net_ops; net_x2 only applies to the wrap variant
    (the coord build's extra scratch exceeds Mosaic's scoped-VMEM
    budget at 2 slots — pallas_net.py)."""
    ops, ngf, k_out, flipped, variant = fused_net
    if variant == "coord":
        return False
    pc = psv_planes * 3
    xp = jnp.zeros((pc, height + 2 * pallas_net.X_ROW_PAD, width), dtype)
    try:
        jax.block_until_ready(pallas_net.unet_forward(
            (xp, xp), ops, ngf, k_out, flipped=flipped, variant=variant,
            x_slots=2))
        return True
    except Exception:  # noqa: BLE001 — any Mosaic/helper rejection
        return False


def _probe_roll16(height: int, width: int, psv_planes: int) -> bool:
    """Compile the tiled ladder with the bf16 rolled band at the
    production geometry (bf16 pltpu.roll lowering is the
    backend-sensitive piece)."""
    cap, rb = pallas_render.CAP_ROWS, pallas_render.ROW_BLOCK
    kh, kv = pallas_render.default_bounds(height, width, cap)
    _, _, pad = pallas_render._band_geometry(cap, rb, kv)
    hm = height - 2 * cap
    layers = jnp.zeros((psv_planes, 4, height + 2 * pad, width),
                       jnp.bfloat16)
    u = jnp.tile(
        (width - 1.0)
        - jax.lax.broadcasted_iota(jnp.float32, (1, hm, width), 2),
        (psv_planes, 1, 1))
    v = jnp.tile(
        jax.lax.broadcasted_iota(jnp.float32, (1, hm, width), 1) + cap,
        (psv_planes, 1, 1))
    try:
        jax.block_until_ready(pallas_render._ladder_render_mid_uv(
            layers, u, v, cap, rb, kh, kv,
            wb=pallas_render.default_wb(width), roll16=True))
        return True
    except Exception:  # noqa: BLE001
        return False


def _probe_sdyn(height: int, width: int, psv_planes: int) -> bool:
    """Compile (and run once) the dual-eye sweep kernel with the
    dynamic-base barrel (tpu.dynamic_rotate lowering is the
    backend-sensitive piece). Its win is structural — ~10 barrel
    passes collapse to 1 dynamic rotate + the residual's live bits —
    so compile success is the arming decision (measured A/B:
    tools/exp_sdyn.py)."""
    from matryodshka_tpu.ops import pallas_sweep
    img = jnp.zeros((height, width, 3), jnp.float32)
    depths = jnp.linspace(100.0, 1.0, psv_planes)
    intr = jnp.asarray([[0.032, 0, 0], [0, 1, 0], [0, 0, 1]])
    try:
        jax.block_until_ready(pallas_sweep._ods_sweep_dual_stack(
            img, img, depths, intr, height, width,
            out_dtype=jnp.bfloat16, out_row_pad=pallas_sweep.NET_ROW_PAD,
            dynshift=True))
        return True
    except Exception:  # noqa: BLE001
        return False


def _probe_dyn_m(height: int, width: int, psv_planes: int) -> bool:
    """Compile the tiled ladder with the runtime-sized vertical-tap
    loop (dynamic sublane band slices are the backend-sensitive
    piece)."""
    cap, rb = pallas_render.CAP_ROWS, pallas_render.ROW_BLOCK
    kh, kv = pallas_render.default_bounds(height, width, cap)
    _, _, pad = pallas_render._band_geometry(cap, rb, kv)
    hm = height - 2 * cap
    layers = jnp.zeros((psv_planes, 4, height + 2 * pad, width),
                       jnp.float32)
    u = jnp.tile(
        (width - 1.0)
        - jax.lax.broadcasted_iota(jnp.float32, (1, hm, width), 2),
        (psv_planes, 1, 1))
    v = jnp.tile(
        jax.lax.broadcasted_iota(jnp.float32, (1, hm, width), 1) + cap,
        (psv_planes, 1, 1))
    try:
        jax.block_until_ready(pallas_render._ladder_render_mid_uv(
            layers, u, v, cap, rb, kh, kv,
            wb=pallas_render.default_wb(width), dyn_m=True))
        return True
    except Exception:  # noqa: BLE001
        return False


def _refresh_module_globals(flags: dict) -> None:
    """Point the already-imported flag bindings at the new values so
    arming takes effect in-process (pallas_net reads _PERF_FLAGS at
    call time; pallas_render's DEFAULT_* are module globals read by the
    dispatch wrappers)."""
    pallas_render._PERF_FLAGS = dict(flags)
    pallas_render.DEFAULT_FTB = bool(flags.get("ftb", False))
    pallas_render.DEFAULT_FTBB = bool(flags.get("ftbb", False))
    pallas_render.DEFAULT_VTAP = bool(flags.get("vtap", False))
    pallas_render.DEFAULT_ROLL16 = bool(flags.get("roll16", False))
    pallas_render.DEFAULT_DYN_M = bool(flags.get("dyn_m", False))
    pallas_render.DEFAULT_MPAIR = bool(flags.get("mpair", False))
    pallas_render.DEFAULT_KPAIR = bool(flags.get("kpair", False))
    from matryodshka_tpu.ops import pallas_sweep
    pallas_sweep.DEFAULT_SDYN = bool(flags.get("sdyn", False))
    pallas_sweep.DEFAULT_XRM = bool(flags.get("xrm", False))


def ensure_armed(fused_net=None, height: int = 320, width: int = 640,
                 psv_planes: int = 32, dtype=jnp.bfloat16,
                 path: Optional[str] = None, force: bool = False,
                 write: bool = True, _log=print) -> dict:
    """Re-arm compile-sensitive flags iff the backend changed.

    Returns the effective flag dict. No-op (beyond a file read) when
    the stored fingerprint matches the live backend, or when not on
    TPU. Probing costs one Mosaic compile per flag per new backend —
    amortized by the persistent compile cache and the fingerprint.
    """
    flags, fpath = pallas_render._read_perf_flags(path)
    if jax.default_backend() != "tpu":
        return flags
    fp = backend_fingerprint()
    if not force and flags.get("_backend") == fp:
        return flags

    _log(f"[perf_probe] backend fingerprint changed "
         f"(stored={flags.get('_backend')!r}) — probing "
         f"{COMPILE_SENSITIVE} at {width}x{height}x{psv_planes}")
    if fused_net is not None:
        flags["net_x2"] = _probe_net_x2(fused_net, height, width,
                                        psv_planes, dtype)
        _log(f"[perf_probe] net_x2: "
             f"{'armed' if flags['net_x2'] else 'rejected by backend'}")
    else:
        _log("[perf_probe] net_x2: skipped (no fused_net ops provided)")
    flags["roll16"] = _probe_roll16(height, width, psv_planes)
    _log(f"[perf_probe] roll16: "
         f"{'armed' if flags['roll16'] else 'rejected by backend'}")
    flags["sdyn"] = _probe_sdyn(height, width, psv_planes)
    _log(f"[perf_probe] sdyn: "
         f"{'armed' if flags['sdyn'] else 'rejected by backend'}")
    # dyn_m is a measured A/B (the hardware session arms it), but its
    # dynamic sublane slices are also backend-sensitive: VALIDATE a
    # stored-true value on the new backend, disarm if rejected.
    if flags.get("dyn_m"):
        flags["dyn_m"] = _probe_dyn_m(height, width, psv_planes)
        _log(f"[perf_probe] dyn_m: "
             f"{'kept armed' if flags['dyn_m'] else 'rejected by new backend — disarmed'}")
    flags["_backend"] = fp

    if write:
        try:
            with open(fpath, "w") as f:
                json.dump(flags, f, indent=1)
            _log(f"[perf_probe] wrote {fpath}")
        except OSError as e:
            _log(f"[perf_probe] could not write {fpath}: {e} "
                 f"(flags armed in-process only)")
    _refresh_module_globals(flags)
    return flags
