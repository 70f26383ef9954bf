"""Matrix <-> graph conversions (the reference's L1 layer).

The reference exposes three conversion idioms, reproduced here as explicit
functions over `SparseOperator` / scipy matrices:

  * `coo_to_gnn_input`   — edge list + edge attributes, diagonal kept
                           (reference pytorch/UtilsGNN.py:74-78)
  * `remove_diag_entries`— drop self-edges from an edge list
                           (reference pytorch/UtilsGNN.py:69-72)
  * `matrix_to_graph`    — diagonal-as-vertex-feature split: vertex attr
                           [A_ii], edges = off-diagonal entries (reference
                           pytorch/TrainableJacobiDiag/Data.py:216-251 and
                           pytorch/DiffCoeffs/data.py:102-127)
  * `graph_to_matrix`    — the inverse (vertex diag + off-diag edges back to
                           one operator)

In this framework `SparseOperator` *is* the graph (rows/cols are the edge
list), so these helpers mostly re-package views; they exist so a user of the
reference finds the same entry points, and so edge ordering — row-sorted,
the framework invariant — is pinned down in one place.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnnla_tpu.core.graph import GraphState
from gnnla_tpu.ops.sparse import SparseOperator

Array = jax.Array


def as_operator(A, *, dtype=jnp.float32) -> SparseOperator:
    """Coerce scipy sparse / dense ndarray / SparseOperator to an operator."""
    if isinstance(A, SparseOperator):
        return A
    if hasattr(A, "tocoo"):  # scipy sparse
        return SparseOperator.from_scipy(A, dtype=dtype)
    return SparseOperator.from_dense(np.asarray(A), dtype=dtype)


def coo_to_gnn_input(A, *, dtype=jnp.float32) -> Tuple[Array, Array]:
    """(edgeij_pair [2, E], edge_attr [E, 1]) with the diagonal kept.

    Mirrors reference UtilsGNN.coo_to_gnn_input (UtilsGNN.py:74-78): edge k
    is the nonzero A[edgeij_pair[0, k], edgeij_pair[1, k]]. Edges are
    row-sorted (the torch `coalesce` order the reference relies on).
    """
    op = as_operator(A, dtype=dtype)
    edgeij = jnp.stack([op.rows, op.cols], axis=0)
    return edgeij, op.vals[:, None]


def remove_diag_entries(edgeij_pair, edge_attr):
    """Drop self-edges (i == j) from an edge list + attributes.

    Host-side (changes array sizes), like reference UtilsGNN.py:69-72.
    """
    ij = np.asarray(edgeij_pair)
    e = np.asarray(edge_attr)
    keep = ij[0] != ij[1]
    return jnp.asarray(ij[:, keep]), jnp.asarray(e[keep])


def matrix_to_graph(A, *, coords: Optional[np.ndarray] = None,
                    dtype=jnp.float32
                    ) -> Tuple[Array, Array, Array, SparseOperator]:
    """Diagonal-as-vertex-feature split.

    Returns (vertex_attr [N, 1] = A_ii, edgeij_pair [2, E], edge_attr, op)
    where op is the diagonal-removed operator whose edges carry the
    off-diagonal A_ij — the input convention of the learned models
    (reference Data.py:216-251: diag -> vertex feature, off-diag -> edges;
    data.py:102-127 additionally appends relative coordinates, which the
    caller does via `training.datasets.periodic_rel_coords`).

    edge_attr is [E, 1] (A_ij) or [E, 3] when `coords` ([N, d]) is given
    (A_ij plus the coordinate difference x_j - x_i per edge).
    """
    full = as_operator(A, dtype=dtype)
    v_attr = full.diagonal()[:, None]
    op = full.remove_diagonal()
    edgeij = jnp.stack([op.rows, op.cols], axis=0)
    e_attr = op.vals[:, None]
    if coords is not None:
        rows_h, cols_h, _ = op.host_coo()
        coords = np.asarray(coords, dtype=np.float64)
        rel = coords[cols_h] - coords[rows_h]
        e_attr = jnp.concatenate(
            [e_attr, jnp.asarray(rel, e_attr.dtype)], axis=1)
    return v_attr, edgeij, e_attr, op


def graph_to_matrix(vertex_diag, op_nodiag: SparseOperator,
                    edge_vals=None) -> SparseOperator:
    """Inverse of `matrix_to_graph`: re-attach the diagonal to the
    off-diagonal pattern, producing the full operator (host-side)."""
    rows, cols, vals = op_nodiag.host_coo()
    if edge_vals is not None:
        vals = np.asarray(edge_vals, dtype=np.float64).ravel()
    d = np.asarray(vertex_diag, dtype=np.float64).ravel()
    n = d.shape[0]
    return SparseOperator.from_coo(
        np.concatenate([rows, np.arange(n)]),
        np.concatenate([cols, np.arange(n)]),
        np.concatenate([vals, d]),
        (n, max(op_nodiag.shape[1], n)),
        dtype=op_nodiag.vals.dtype)


def graph_state_from_matrix(A, *, n_vertex_features: int = 1,
                            dtype=jnp.float32
                            ) -> Tuple[SparseOperator, GraphState]:
    """Operator + a GraphState seeded with the edge values (A_ij) and zeroed
    vertex features — the common starting point of the fixed kernels."""
    op = as_operator(A, dtype=dtype)
    state = GraphState(
        vertices=jnp.zeros((op.n_rows, n_vertex_features), op.vals.dtype),
        edges=op.vals[:, None])
    return op, state
