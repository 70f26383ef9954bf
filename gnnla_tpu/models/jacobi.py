"""Weighted Jacobi relaxation as a GN block, iterated with `lax.scan`.

Reference semantics: /root/reference/pytorch/JacobiGNN.py
  * edge update    c_ij = A_ij * x_j                         (:71-89)
  * vertex update  x_i <- x_i + w * (b_i - cbar_i) / A_ii    (:91-123)
  * iteration      Python loop over MetaLayer                (:138-148)
Vertex features: [A_ii, b, x]; edges: [A_ij, c_ij]; globals: [w].

The reference's Python iteration loop becomes `lax.scan`, so n_iters compiles
to a single fused while-program on TPU instead of n_iters dispatches. A
`diag_update` hook supports the *trained* Jacobi diagonal (train_jacobi
replaces A_ii with a learned D_i, reference TrainableJacobiDiag/loss.py:179-183).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gnnla_tpu.core import GNBlock, GraphState
from gnnla_tpu.ops.sparse import SparseOperator


def _edge_fn(v_i, v_j, e, g):
    a_ij = e[:, :1]
    x_j = v_j[:, 2:3]
    return jnp.concatenate([a_ij, a_ij * x_j], axis=1)


def _vertex_fn(v, e, agg, g):
    a_ii, b, x = v[:, 0], v[:, 1], v[:, 2]
    w = g[0]
    cbar = agg.sum(e[:, 1])
    x = x + w * (b - cbar) / a_ii
    return jnp.stack([a_ii, b, x], axis=1)


JacobiBlock = GNBlock(edge_fn=_edge_fn, vertex_fn=_vertex_fn)


def jacobi_gnn(op: SparseOperator, b, x, *, omega: float,
               n_iters: int) -> jnp.ndarray:
    """Explicit GN-block form, scanned. Returns x after n_iters sweeps."""
    b, x = jnp.ravel(b), jnp.ravel(x)
    diag = op.diagonal()
    g = jnp.asarray([omega], dtype=op.vals.dtype)
    state = GraphState(vertices=jnp.stack([diag, b, x], axis=1),
                       edges=jnp.stack(
                           [op.vals, jnp.zeros_like(op.vals)], axis=1),
                       globals_=g)

    def step(s, _):
        return JacobiBlock(op, s), None

    state, _ = jax.lax.scan(step, state, None, length=n_iters)
    return state.vertices[:, 2]


def jacobi(op: SparseOperator, b, x, *, omega: float, n_iters: int,
           diag: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Production path: x <- x + w D^{-1} (b - A x), scanned.

    `diag` overrides A's diagonal — used by the trained-Jacobi model where
    D_i is a GNN output (must stay differentiable w.r.t. diag).

    WARNING (trained diagonals): the learned D of the trainable-Jacobi
    family is optimized as a SMOOTHER — it minimizes damping on the
    high-frequency subspace only (Gelfand spectral loss,
    training/spectral_loss.py). As a *standalone* iteration it diverges:
    the committed artifact measures mean full-spectrum damping 2.19 > 1
    for the learned D vs 0.997 for ω = 2/3
    (artifacts/jacobi/results.json). The committed two-grid closure
    (artifacts/jacobi/smoother_twogrid.json) shows the amplification even
    outruns an exact coarse correction (cycle rho 3.3) — a
    reference-recipe D must NOT be used in a cycle either. Train with
    `TrainJacobiConfig.stability_weight > 0`
    (scripts/reproduce_jacobi_stable.py) for a diagonal whose cycle
    converges (rho 0.666, parity with omega = 2/3).
    """
    b, x = jnp.ravel(b), jnp.ravel(x)
    d = op.diagonal() if diag is None else jnp.ravel(diag)
    w_over_d = omega / d

    def step(x, _):
        return x + w_over_d * (b - op.matvec(x)), None

    x, _ = jax.lax.scan(step, x, None, length=n_iters)
    return x
