"""SpMV as a GN block: y = A @ x.

Reference semantics: /root/reference/pytorch/MatVecGNN.py
  * edge update    c_ij = A_ij * x_j                  (MatVecGNN.py:64-84)
  * e->v aggregate cbar_i = sum_j c_ij  (row-wise)    (MatVecGNN.py:43-62)
  * vertex update  y_i = cbar_i                       (MatVecGNN.py:86-114)
Works for multi-column X ([N, K]) like the reference demo (:128-129,155-161).

Here the GN-block form exists for structural parity/testing; `matvec` is just
`SparseOperator.matvec` (gather -> multiply -> segment-sum), which XLA fuses.
"""

from __future__ import annotations

import jax.numpy as jnp

from gnnla_tpu.core import GNBlock, GraphState
from gnnla_tpu.ops.sparse import SparseOperator


def _edge_fn(v_i, v_j, e, g):
    # v_j[:, :K] is X at the column vertex; e[:, 0] is A_ij. Multi-column X
    # flows through the block as K vertex features, like the reference demo
    # runs [N, 2] X through the MetaLayer itself (MatVecGNN.py:128-129).
    a_ij = e[:, :1]
    x_j = v_j
    c_ij = a_ij * x_j
    return jnp.concatenate([a_ij, c_ij], axis=1)


def _vertex_fn(v, e, agg, g):
    cbar = agg.sum(e[:, 1:])
    return jnp.concatenate([v, cbar], axis=1)


MatVecBlock = GNBlock(edge_fn=_edge_fn, vertex_fn=_vertex_fn)


def matvec_gnn(op: SparseOperator, x) -> jnp.ndarray:
    """Run the explicit GN-block form; y = A @ X for X of shape [N] or
    [N, K] (multi-column, reference MatVecGNN.py:128-129,155-161)."""
    x = jnp.asarray(x)
    squeeze = x.ndim == 1
    x2 = x[:, None] if squeeze else x
    k = x2.shape[1]
    state = GraphState(vertices=x2, edges=op.vals[:, None])
    out = MatVecBlock(op, state)
    y = out.vertices[:, k:]
    return y[:, 0] if squeeze else y


def matvec(op: SparseOperator, x) -> jnp.ndarray:
    """Production path: fused SpMV/SpMM. x may be [N] or [N, K]."""
    return op.matvec(x)
