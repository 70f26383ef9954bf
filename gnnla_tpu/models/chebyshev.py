"""Chebyshev relaxation (degree-d semi-iteration) as GN blocks.

Reference semantics: /root/reference/pytorch/ChebyGNN.py. Per iteration the
reference runs two MetaLayers; the recurrences live in the global updates:

  iteration 1 (ChebyGNN.py:49-163):
      z_ij = A_ij x_j ; r = b - zbar ; alpha = 1/d ; p = r ; x += alpha p
  iteration 2 (ChebyGNN.py:166-265):
      z_ij = A_ij p_j ; r -= alpha_old zbar ;
      beta = 0.5 (c alpha_old)^2 ; alpha = 1/(d - beta/alpha_old) ;
      p = r + beta p ; x += alpha p
  iterations > 2 (ChebyGNN.py:269-285): same with beta = ((c alpha_old)/2)^2

State: v = [b, x, r, p], e = [A_ij, z_ij], g = [c, d, alpha, beta]
(ChebyGNN.py:334-344). MetaLayer ordering matters: the vertex update consumes
the *old* alpha before the global update refreshes it.

The degree is static, so both forms unroll at trace time (the reference
unrolls its layer list the same way, ChebyGNN.py:287-322).
"""

from __future__ import annotations

import jax.numpy as jnp

from gnnla_tpu.core import GNBlock, GraphState
from gnnla_tpu.ops.sparse import SparseOperator

_B, _X, _R, _P = 0, 1, 2, 3  # vertex feature columns


def _edge_ax(col):
    """Edge update z_ij = A_ij * (v_j[col]); keeps A_ij in slot 0."""
    def fn(v_i, v_j, e, g):
        a_ij = e[:, :1]
        return jnp.concatenate([a_ij, a_ij * v_j[:, col:col + 1]], axis=1)
    return fn


def _iter1_vertex(v, e, agg, g):
    b = v[:, _B]
    zbar = agg.sum(e[:, 1])
    r = b - zbar
    return jnp.stack([b, v[:, _X], r], axis=1)


def _iter1_global(v, e, g, vagg, eagg):
    c, d = g[0], g[1]
    return jnp.stack([c, d, 1.0 / d])


def _iter1_layer2_vertex(v, e, agg, g):
    b, x, r = v[:, _B], v[:, _X], v[:, _R]
    alpha = g[2]
    p = r
    x = x + alpha * p
    return jnp.stack([b, x, r, p], axis=1)


def _later_vertex(v, e, agg, g):
    b, x, r, p = v[:, _B], v[:, _X], v[:, _R], v[:, _P]
    alpha = g[2]  # old alpha — global update runs after this
    zbar = agg.sum(e[:, 1])
    r = r - alpha * zbar
    return jnp.stack([b, x, r, p], axis=1)


def _beta_global(beta_fn):
    def fn(v, e, g, vagg, eagg):
        c, d, alpha = g[0], g[1], g[2]
        beta = beta_fn(c, alpha)
        alpha = 1.0 / (d - beta / alpha)
        return jnp.stack([c, d, alpha, beta])
    return fn


def _later_layer2_vertex(v, e, agg, g):
    b, x, r, p = v[:, _B], v[:, _X], v[:, _R], v[:, _P]
    alpha, beta = g[2], g[3]
    p = r + beta * p
    x = x + alpha * p
    return jnp.stack([b, x, r, p], axis=1)


def _build_layers(deg: int):
    iter1 = [
        GNBlock(edge_fn=_edge_ax(_X), vertex_fn=_iter1_vertex,
                global_fn=_iter1_global),
        GNBlock(vertex_fn=_iter1_layer2_vertex),
    ]
    iter2 = [
        GNBlock(edge_fn=_edge_ax(_P), vertex_fn=_later_vertex,
                global_fn=_beta_global(lambda c, a: 0.5 * (c * a) ** 2)),
        GNBlock(vertex_fn=_later_layer2_vertex),
    ]
    later = [
        GNBlock(edge_fn=_edge_ax(_P), vertex_fn=_later_vertex,
                global_fn=_beta_global(lambda c, a: ((c * a) / 2.0) ** 2)),
        GNBlock(vertex_fn=_later_layer2_vertex),
    ]
    layers = []
    if deg > 0:
        layers.extend(iter1)
    if deg > 1:
        layers.extend(iter2)
    for _ in range(deg - 2):
        layers.extend(later)
    return layers


def chebyshev_gnn(op: SparseOperator, b, x, *, c: float, d: float,
                  deg: int) -> jnp.ndarray:
    """Explicit GN-block form; returns relaxed x."""
    b, x = jnp.ravel(b), jnp.ravel(x)
    state = GraphState(
        vertices=jnp.stack([b, x], axis=1),
        edges=jnp.stack([op.vals, jnp.zeros_like(op.vals)], axis=1),
        globals_=jnp.asarray([c, d], dtype=op.vals.dtype),
    )
    for layer in _build_layers(deg):
        state = layer(op, state)
    return state.vertices[:, _X]


def chebyshev(op: SparseOperator, b, x, *, c: float, d: float,
              deg: int) -> jnp.ndarray:
    """Production path: same recurrence on fused SpMVs."""
    b, x = jnp.ravel(b), jnp.ravel(x)
    if deg <= 0:
        return x
    r = b - op.matvec(x)
    alpha = 1.0 / d
    p = r
    x = x + alpha * p
    for k in range(2, deg + 1):
        z = op.matvec(p)
        r = r - alpha * z
        beta = 0.5 * (c * alpha) ** 2 if k == 2 else ((c * alpha) / 2.0) ** 2
        alpha = 1.0 / (d - beta / alpha)
        p = r + beta * p
        x = x + alpha * p
    return x
