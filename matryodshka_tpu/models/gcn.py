"""Graph-convolution MSI head on an icosphere (Pixel2Mesh-derived).

Covers the reference's gcn_net (matryodshka/nets.py:722-732): 14 graph
convolutions — in->ngf, 12x ngf->ngf (relu), ngf->out (tanh) — where each
layer computes sum_i support_i @ (x @ W_i) + b over a 2-support stack.

Sparse support matmuls are segment-sums over the COO edge list (the
TPU-friendly lowering of tf.sparse_tensor_dense_matmul): the MXU handles
x @ W_i, the VPU the gather + segment-sum.

Also mesh_to_equirect (projector.py:293-332): barycentric gather of
per-vertex outputs onto the ERP grid via the precomputed p2v table.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class SparseSupport:
    """COO sparse matrix with a segment-sum matmul."""

    def __init__(self, rows: np.ndarray, cols: np.ndarray,
                 vals: np.ndarray, num_verts: int):
        rows = np.asarray(rows)
        cols = np.asarray(cols)
        vals = np.asarray(vals)
        # decided eagerly (host-side) so it stays a static Python bool
        self.is_identity = bool(
            rows.shape[0] == num_verts and np.array_equal(rows, cols)
            and np.allclose(vals, 1.0))
        self.rows = jnp.asarray(rows, jnp.int32)
        self.cols = jnp.asarray(cols, jnp.int32)
        self.vals = jnp.asarray(vals, jnp.float32)
        self.num_verts = num_verts

    def matmul(self, x: Array) -> Array:
        """[V, F] -> [V, F]: out[r] += vals[e] * x[cols[e]]."""
        gathered = jnp.take(x, self.cols, axis=0) * self.vals[:, None]
        return jax.ops.segment_sum(gathered, self.rows,
                                   num_segments=self.num_verts)


class GraphConv(nn.Module):
    """One graph conv: sum_i support_i @ (x @ W_i) + b
    (nets.py:650-679; glorot-uniform init :704-708, zero bias)."""
    output_dim: int
    supports: Sequence[SparseSupport]
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        input_dim = x.shape[-1]
        out = 0.0
        for i, support in enumerate(self.supports):
            init_range = np.sqrt(6.0 / (input_dim + self.output_dim))
            W = self.param(f"weights_{i}",
                           nn.initializers.uniform(scale=2 * init_range),
                           (input_dim, self.output_dim))
            # uniform(scale) samples [0, scale); recenter to +-init_range
            W = W - init_range
            pre = x @ W
            if support.is_identity:
                out = out + pre
            else:
                out = out + support.matmul(pre)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.output_dim,))
            out = out + b
        return out


class GCNNet(nn.Module):
    """The 14-layer MSI GCN head (nets.py:722-732)."""
    num_outputs: int
    supports: Sequence[SparseSupport]
    ngf: int = 64

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.relu(GraphConv(self.ngf, self.supports,
                              name="conv1_1")(x))
        for i in range(12):
            x = nn.relu(GraphConv(self.ngf, self.supports,
                                  name=f"conv2_{i}")(x))
        x = GraphConv(self.num_outputs, self.supports, name="conv3_1")(x)
        return jnp.tanh(x)


def mesh_to_equirect(mesh_colors: Array, p2v: Array) -> Array:
    """Barycentric scatter of per-vertex values to the ERP image.

    mesh_colors: [V, C]; p2v: [W, H, 3, 2] with (vertex id, weight) pairs
    (the reference layout). Returns [1, H, W, C]
    (projector.py:293-332, including its transposed-table convention).
    """
    w, h, _, _ = p2v.shape
    ids = p2v[..., 0].astype(jnp.int32).reshape(-1, 3)     # [W*H, 3]
    wts = p2v[..., 1].reshape(-1, 3)
    vals = jnp.take(mesh_colors, ids, axis=0)              # [W*H, 3, C]
    out = jnp.sum(vals * wts[..., None], axis=1)           # [W*H, C]
    out = out.reshape(1, w, h, -1)
    return jnp.transpose(out, (0, 2, 1, 3))
