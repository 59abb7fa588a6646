"""Shell-sharded MSI rendering: the TPU equivalent of per-plane streaming.

The reference fits high-resolution rendering in memory by a Python loop
that re-renders ONE shell at a time and over-composites on the host
(test.py:306-394). On a TPU mesh we instead shard the 32 shells across
devices and exploit the associativity of the `over` operator:

For a contiguous group g of shells (back-to-front), define the partial
premultiplied color C_g = sum_{i in g} rgb_i * a_i * prod_{j in g, j>i}
(1 - a_j) and the group transmittance T_g = prod_{i in g} (1 - a_i).
Then `over` of all groups back-to-front is

    out = sum_g C_g * prod_{g' > g} T_{g'}

so each device composites its local shells, and one tiny all_gather of
(C_g, T_g) image pairs over ICI finishes the view. No shell ever leaves
its device; per-device memory is P/n_shells of the full volume.

Note layer 0's alpha-ignored convention lives only in the FIRST group's
partial (handled by compositing the gathered partials with the same
closed form, treating group transmittances as "alphas").
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from matryodshka_tpu.geometry import intersect
from matryodshka_tpu.geometry.render import _gather_layers, _transmittance
from matryodshka_tpu.ops.resample import bilinear_wrap_resample

Array = jax.Array


def partial_composite(rgba: Array) -> Tuple[Array, Array]:
    """Per-group partial over-composite.

    rgba: [..., P_local, 4] back-to-front. Returns (C, T):
      C: [..., 3] premultiplied partial color (every local alpha applied),
      T: [..., 1] group transmittance prod(1 - a).
    """
    rgb = rgba[..., :3]
    alpha = rgba[..., 3:]
    trans = _transmittance(alpha)
    C = jnp.sum(rgb * alpha * trans, axis=-2)
    T = jnp.prod(1.0 - alpha, axis=-2)
    return C, T


def combine_partials(C: Array, T: Array) -> Array:
    """Combine per-group partials back-to-front along axis 0.

    C: [G, ..., 3], T: [G, ..., 1]:  out = sum_g C_g * prod_{g'>g} T_{g'}.

    The over operator's layer-0-alpha-ignored convention is handled by
    setting a_0 := 1 BEFORE partial_composite of the first group (the
    sharded renderer does this), which makes the formula exact.
    """
    # transmittance ladder over groups (exclusive, from the front).
    # reverse-form cumprod, NOT flip/cumprod/flip: XLA-TPU miscompiles
    # the fused transpose+flip+cumprod+reduce graph (geometry/render.py
    # _transmittance has the full story).
    rcp = jax.lax.cumprod(T, axis=0, reverse=True)
    lad = jnp.concatenate([rcp[1:], jnp.ones_like(rcp[:1])], axis=0)
    return jnp.sum(C * lad, axis=0)


def render_equirect_view_sharded(rgba_layers: Array, tgt_pose: Array,
                                 tgt_pos: Array, radii: Array,
                                 mesh: Mesh) -> Array:
    """ERP render with the shell axis sharded over mesh axis 'shell'.

    rgba_layers: [H, W, P, 4] (single example), P divisible by the shell
    axis size. Returns [H, W, 3] fully replicated.
    """
    h, w, p, _ = rgba_layers.shape
    n_shards = mesh.shape["shell"]
    assert p % n_shards == 0, (p, n_shards)

    # Layer 0's alpha is ignored by the over operator; bake that in before
    # sharding so every group composites uniformly.
    rgba_layers = rgba_layers.at[:, :, 0, 3].set(1.0)

    def shard_fn(rgba_local: Array, radii_local: Array) -> Tuple[Array,
                                                                 Array]:
        uv = intersect.intersect_sphere(tgt_pose, tgt_pos, radii_local,
                                        w, h)
        proj = _gather_layers(rgba_local, uv)       # [P/n, H, W, 4]
        C, T = partial_composite(jnp.moveaxis(proj, 0, 2))
        # gather every group's partial over ICI
        Cg = jax.lax.all_gather(C, "shell")          # [G, H, W, 3]
        Tg = jax.lax.all_gather(T, "shell")          # [G, H, W, 1]
        return combine_partials(Cg, Tg)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, None, "shell", None), P("shell")),
        out_specs=P(),
        # the all_gather + reduce makes the output replicated over 'shell',
        # but the checker can't infer that statically
        check_vma=False,
    )
    return fn(rgba_layers, radii)
