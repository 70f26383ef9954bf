"""Matrix-weighted norm as a GN block: g = sqrt(x^T W x).

Reference semantics: /root/reference/pytorch/MatrixWeightedNorm.py
  * edge update    c_ij = W_ij * x_j            (:49-69)
  * vertex update  y_i = x_i * cbar_i           (:91-118)
  * v->g aggregate ybar = sum_i y_i             (:147-161)
  * global update  g = sqrt(ybar)               (:120-145)

The v->g sum is the global-reduction point: under a sharded vertex axis it is
a `psum` (see gnnla_tpu.parallel.collectives).
"""

from __future__ import annotations

import jax.numpy as jnp

from gnnla_tpu.core import GNBlock, GraphState
from gnnla_tpu.ops.sparse import SparseOperator


def _edge_fn(v_i, v_j, e, g):
    w_ij = e[:, :1]
    x_j = v_j[:, :1]
    return jnp.concatenate([w_ij, w_ij * x_j], axis=1)


def _vertex_fn(v, e, agg, g):
    x = v[:, 0]
    cbar = agg.sum(e[:, 1])
    y = x * cbar
    return jnp.stack([x, y], axis=1)


def _global_fn(v, e, g, vagg, eagg):
    ybar = vagg.sum(v[:, 1])
    return jnp.sqrt(ybar)


WeightedNormBlock = GNBlock(edge_fn=_edge_fn, vertex_fn=_vertex_fn,
                            global_fn=_global_fn)


def matrix_weighted_norm_gnn(op: SparseOperator, x) -> jnp.ndarray:
    """Explicit GN-block form; returns the scalar sqrt(x^T W x)."""
    x = jnp.ravel(x)
    state = GraphState(vertices=x[:, None], edges=op.vals[:, None],
                       globals_=jnp.zeros((1,), op.vals.dtype))
    out = WeightedNormBlock(op, state)
    return out.globals_


def matrix_weighted_norm(op: SparseOperator, x) -> jnp.ndarray:
    """Production path: sqrt(x . (W x)) fused."""
    x = jnp.ravel(x)
    return jnp.sqrt(jnp.dot(x, op.matvec(x)))
