"""AMG direct interpolation as GN blocks.

Reference semantics: /root/reference/pytorch/DirectInterpGNN.py.
Inputs (diagonal-removed pattern): vertex v = [A_ii, C_i] (C_i = 1 for coarse
points), edge e = [A_ij, S_ij] (S_ij in {0,1} marks strong connections).

  * layer 1 edge:   w_ij = C_j (the coarse flag of the *column* vertex)  (:50-69)
  * layer 1 e->v:   gammabar_i = sum_k A_ik / sum_k (A_ik S_ik C_k)      (:71-97)
  * layer 1 vertex: alpha_i = gammabar_i / A_ii                          (:99-131)
  * layer 2 edge:   w_ij = (1 - C_i) * (-A_ij * alpha_i)                 (:133-152)

The output w_ij are the off-diagonal entries of the prolongation weights;
P = (I + W)[:, coarse] is assembled sparsely in `gnnla_tpu.amg.interp`
(fixing the reference's `to_dense()` escape at VCycle.py:126-137).
"""

from __future__ import annotations

import jax.numpy as jnp

from gnnla_tpu.core import GNBlock, GraphState
from gnnla_tpu.ops.sparse import SparseOperator

_AII, _C, _ALPHA = 0, 1, 2
_A, _S, _W = 0, 1, 2


def _layer1_edge(v_i, v_j, e, g):
    c_j = v_j[:, _C:_C + 1]
    return jnp.concatenate([e[:, :2], c_j], axis=1)


def _layer1_vertex(v, e, agg, g):
    a_ii = v[:, _AII]
    a_ik, s_ik, w_ik = e[:, _A], e[:, _S], e[:, _W]
    numerator = agg.sum(a_ik)
    denominator = agg.sum(a_ik * s_ik * w_ik)
    alpha = (numerator / denominator) / a_ii
    return jnp.stack([a_ii, v[:, _C], alpha], axis=1)


def _layer2_edge(v_i, v_j, e, g):
    a_ij = e[:, _A:_A + 1]
    s_ij = e[:, _S:_S + 1]
    c_i = v_i[:, _C:_C + 1]
    alpha_i = v_i[:, _ALPHA:_ALPHA + 1]
    w_ij = (1.0 - c_i) * (-a_ij * alpha_i)
    return jnp.concatenate([a_ij, s_ij, w_ij], axis=1)


DirectInterpLayer1 = GNBlock(edge_fn=_layer1_edge, vertex_fn=_layer1_vertex)
DirectInterpLayer2 = GNBlock(edge_fn=_layer2_edge)


def direct_interp(op_nodiag: SparseOperator, diag, coarse_flags,
                  strong_flags) -> jnp.ndarray:
    """Run the two-layer direct-interpolation GNN.

    op_nodiag    : diagonal-removed operator (edges = off-diag A_ij)
    diag         : [N] A_ii
    coarse_flags : [N] 1.0 for C points, 0.0 for F points
    strong_flags : [E] 1.0 where the connection is strong

    Returns w_ij per edge [E] — interpolation weights (0 on C-point rows).
    """
    dtype = op_nodiag.vals.dtype
    v = jnp.stack([jnp.ravel(diag).astype(dtype),
                   jnp.ravel(coarse_flags).astype(dtype)], axis=1)
    e = jnp.stack([op_nodiag.vals,
                   jnp.ravel(strong_flags).astype(dtype)], axis=1)
    state = GraphState(vertices=v, edges=e)
    state = DirectInterpLayer1(op_nodiag, state)
    state = DirectInterpLayer2(op_nodiag, state)
    return state.edges[:, _W]
