"""Block-diagonal batching parity (reference PyG Batch/batch-vector,
MatVecGNN.py:140, loss.py:196-199)."""

import jax.numpy as jnp
import numpy as np

from gnnla_tpu.core import (GraphState, batch_operators, batch_states,
                            graph_sizes, unbatch_vertices)
from gnnla_tpu.models import matrix_weighted_norm_gnn, matvec
from gnnla_tpu.problems import laplacian_2d, laplacian_nd


def _mixed_ops():
    A1 = laplacian_2d(4)                       # 16 vertices
    A2 = laplacian_2d(5)                       # 25 vertices (different size)
    A3, _, _ = laplacian_nd((3, 3), bcs=(1, 1))  # different pattern family
    return [A1, A2, A3]


def test_batched_matvec_matches_per_graph(rng):
    ops = _mixed_ops()
    big, batch = batch_operators(ops)
    sizes = graph_sizes(ops)
    assert big.n_rows == sum(sizes)
    assert batch.n_graphs == 3

    xs = [jnp.asarray(rng.random(n), jnp.float32) for n in sizes]
    y_big = matvec(big, jnp.concatenate(xs))
    y_parts = unbatch_vertices(y_big, sizes)
    for op, x, y in zip(ops, xs, y_parts):
        np.testing.assert_allclose(np.asarray(y), np.asarray(matvec(op, x)),
                                   rtol=1e-5, atol=1e-5)


def test_batched_edges_row_sorted():
    big, _ = batch_operators(_mixed_ops())
    assert np.all(np.diff(np.asarray(big.rows)) >= 0)


def test_batch_states_globals_stack():
    states = [GraphState(vertices=jnp.ones((4, 2)),
                         globals_=jnp.asarray([float(k)]))
              for k in range(3)]
    s = batch_states(states)
    assert s.vertices.shape == (12, 2)
    np.testing.assert_allclose(np.asarray(s.globals_),
                               [[0.0], [1.0], [2.0]])


def test_per_graph_global_aggregation(rng):
    """Weighted norm over a batch: per-graph sqrt(x^T W x) via the batch
    ids must equal the per-graph single computations."""
    ops = [laplacian_2d(4).scale(-1.0), laplacian_2d(5).scale(-1.0)]
    big, batch = batch_operators(ops)
    sizes = graph_sizes(ops)
    xs = [jnp.asarray(rng.random(n), jnp.float32) for n in sizes]

    from gnnla_tpu.core import GNBlock
    from gnnla_tpu.models.norm import _edge_fn, _vertex_fn

    def global_fn(v, e, g, vagg, eagg):
        return jnp.sqrt(vagg.sum(v[:, 1]))

    blk = GNBlock(edge_fn=_edge_fn, vertex_fn=_vertex_fn,
                  global_fn=global_fn)
    x = jnp.concatenate(xs)
    state = GraphState(vertices=jnp.stack([x, jnp.zeros_like(x)], axis=1),
                       edges=big.vals[:, None])
    out = blk(big, state, batch)
    expected = [float(matrix_weighted_norm_gnn(op, x_k))
                for op, x_k in zip(ops, xs)]
    np.testing.assert_allclose(np.ravel(np.asarray(out.globals_)), expected,
                               rtol=1e-4)
