"""Power method for lambda_max as GN blocks.

Reference semantics: /root/reference/pytorch/PowerMethodGNN.py. Each power
iteration is three MetaLayers (:296-316):
  1. edge c_ij = A_ij b_j ; vertex b <- cbar           (:86-106, :129-158)
  2. vertex y = b^2 ; global n = sqrt(sum y)           (:108-126, :160-185)
  3. vertex b <- b / n                                  (:187-207)
followed by a two-layer Rayleigh-quotient block (:209-294):
  1. edge c_ij = A_ij b_j ; vertex y = b*cbar ; global n_A = sum y
  2. vertex y = b^2 ; global lambda_max = n_A / sum y

State: v = [b, y]; e = [A_ij, c_ij]; g = [n, n_A, lambda_max]. The global
sums are full-graph reductions — `psum` points under sharding.

The reference rebuilds global tensors with `torch.tensor([...])`
(:185,266,294), which severs autograd; here the globals are pure jnp stacks,
so the whole estimator is differentiable for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gnnla_tpu.core import GNBlock, GraphState
from gnnla_tpu.ops.sparse import SparseOperator


def _edge_ab(v_i, v_j, e, g):
    a_ij = e[:, :1]
    return jnp.concatenate([a_ij, a_ij * v_j[:, :1]], axis=1)


def _iter_vertex_matvec(v, e, agg, g):
    cbar = agg.sum(e[:, 1])
    return jnp.stack([cbar, v[:, 1]], axis=1)


def _vertex_square(v, e, agg, g):
    b = v[:, 0]
    return jnp.stack([b, b * b], axis=1)


def _iter_global_norm(v, e, g, vagg, eagg):
    n = jnp.sqrt(vagg.sum(v[:, 1]))
    return jnp.stack([n, g[1], g[2]])


def _iter_vertex_normalize(v, e, agg, g):
    return jnp.stack([v[:, 0] / g[0], v[:, 1]], axis=1)


def _rayleigh_vertex(v, e, agg, g):
    b = v[:, 0]
    cbar = agg.sum(e[:, 1])
    return jnp.stack([b, b * cbar], axis=1)


def _rayleigh_global_na(v, e, g, vagg, eagg):
    return jnp.stack([g[0], vagg.sum(v[:, 1]), g[2]])


def _rayleigh_global_lambda(v, e, g, vagg, eagg):
    return jnp.stack([g[0], g[1], g[1] / vagg.sum(v[:, 1])])


_ITER_BLOCKS = [
    GNBlock(edge_fn=_edge_ab, vertex_fn=_iter_vertex_matvec),
    GNBlock(vertex_fn=_vertex_square, global_fn=_iter_global_norm),
    GNBlock(vertex_fn=_iter_vertex_normalize),
]
_RAYLEIGH_BLOCKS = [
    GNBlock(edge_fn=_edge_ab, vertex_fn=_rayleigh_vertex,
            global_fn=_rayleigh_global_na),
    GNBlock(vertex_fn=_vertex_square, global_fn=_rayleigh_global_lambda),
]


def power_method_gnn(op: SparseOperator, b0, *, n_iters: int):
    """Explicit GN-block form. Returns (lambda_max, b) after n_iters."""
    b0 = jnp.ravel(b0)
    state = GraphState(
        vertices=jnp.stack([b0, jnp.zeros_like(b0)], axis=1),
        edges=jnp.stack([op.vals, jnp.zeros_like(op.vals)], axis=1),
        globals_=jnp.zeros((3,), op.vals.dtype),
    )

    def step(s, _):
        for blk in _ITER_BLOCKS:
            s = blk(op, s)
        return s, None

    state, _ = jax.lax.scan(step, state, None, length=n_iters)
    for blk in _RAYLEIGH_BLOCKS:
        state = blk(op, state)
    return state.globals_[2], state.vertices[:, 0]


def power_method(op: SparseOperator, b0, *, n_iters: int):
    """Production path: scanned power iteration + Rayleigh quotient.

    Matches the reference's estimator exactly: after normalising iterates,
    lambda = (b . A b) / (b . b).
    """
    b = jnp.ravel(b0)

    def step(b, _):
        ab = op.matvec(b)
        return ab / jnp.linalg.norm(ab), None

    b, _ = jax.lax.scan(step, b, None, length=n_iters)
    lam = jnp.dot(b, op.matvec(b)) / jnp.dot(b, b)
    return lam, b
