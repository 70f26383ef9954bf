"""Strength-of-connection GN blocks (classical and smoothed-aggregation).

Classical SOC — reference /root/reference/pytorch/SOCClassicGNN.py:
  * layer 1: vertex v_i = max_{j != i} (-A_ij)   (scatter-max, :50-72)
  * layer 2: edge  S_ij = relu(-A_ij / v_i - theta)   (:104-129)
  Operates on the *diagonal-removed* pattern (:153-154).

SA SOC — reference /root/reference/pytorch/SOCSAGNN.py:
  * single edge update S_ij = A_ij^2 / (A_ii * A_jj)  (:49-71)
  with the diagonal provided as the vertex feature (:85).
"""

from __future__ import annotations

import jax.numpy as jnp

from gnnla_tpu.core import GNBlock, GraphState
from gnnla_tpu.ops.sparse import SparseOperator


def _classic_vertex(v, e, agg, g):
    return agg.max(-e[:, 0])[:, None]


def _classic_edge(theta: float):
    def fn(v_i, v_j, e, g):
        a_ij = e[:, :1]
        v_row = v_i[:, :1]
        s_ij = jnp.maximum(-a_ij / v_row - theta, 0.0)
        return jnp.concatenate([a_ij, s_ij], axis=1)
    return fn


def soc_classic_blocks(theta: float):
    return [GNBlock(vertex_fn=_classic_vertex),
            GNBlock(edge_fn=_classic_edge(theta))]


def soc_classic(op_nodiag: SparseOperator, theta: float) -> jnp.ndarray:
    """Classical SOC over the diagonal-removed operator.

    Returns S_ij per edge ([E]); S_ij > 0 marks a strong connection.
    """
    state = GraphState(
        vertices=jnp.zeros((op_nodiag.n_rows, 1), op_nodiag.vals.dtype),
        edges=op_nodiag.vals[:, None],
    )
    for blk in soc_classic_blocks(theta):
        state = blk(op_nodiag, state)
    return state.edges[:, 1]


def _sa_edge(v_i, v_j, e, g):
    a_ij = e[:, :1]
    a_ii = v_i[:, :1]
    a_jj = v_j[:, :1]
    s_ij = (a_ij * a_ij) / (a_ii * a_jj)
    return jnp.concatenate([a_ij, s_ij], axis=1)


SOCSABlock = GNBlock(edge_fn=_sa_edge)


def soc_sa(op_nodiag: SparseOperator, diag) -> jnp.ndarray:
    """Smoothed-aggregation SOC: S_ij = A_ij^2 / (A_ii A_jj), per edge [E]."""
    state = GraphState(vertices=jnp.ravel(diag)[:, None],
                       edges=op_nodiag.vals[:, None])
    state = SOCSABlock(op_nodiag, state)
    return state.edges[:, 1]
