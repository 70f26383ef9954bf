"""Residual as a GN block: r = b - A @ x.

Reference semantics: /root/reference/pytorch/GNNResidual.py
  * edge update    c_ij = A_ij * x_j        (GNNResidual.py:64-86)
  * vertex update  r_i = b_i - cbar_i       (GNNResidual.py:88-118)
Vertex features on input: [b, x]; on output: [b, x, r].
"""

from __future__ import annotations

import jax.numpy as jnp

from gnnla_tpu.core import GNBlock, GraphState
from gnnla_tpu.ops.sparse import SparseOperator


def _edge_fn(v_i, v_j, e, g):
    a_ij = e[:, :1]
    x_j = v_j[:, 1:2]
    return jnp.concatenate([a_ij, a_ij * x_j], axis=1)


def _vertex_fn(v, e, agg, g):
    b = v[:, 0]
    cbar = agg.sum(e[:, 1])
    r = b - cbar
    return jnp.concatenate([v[:, :2], r[:, None]], axis=1)


ResidualBlock = GNBlock(edge_fn=_edge_fn, vertex_fn=_vertex_fn)


def residual_gnn(op: SparseOperator, b, x) -> jnp.ndarray:
    """Explicit GN-block form; returns r = b - A x as [N]."""
    b, x = jnp.ravel(b), jnp.ravel(x)
    state = GraphState(vertices=jnp.stack([b, x], axis=1),
                       edges=op.vals[:, None])
    out = ResidualBlock(op, state)
    return out.vertices[:, 2]


def residual(op: SparseOperator, b, x) -> jnp.ndarray:
    """Production path: r = b - A @ x (fused)."""
    return b - op.matvec(x)
