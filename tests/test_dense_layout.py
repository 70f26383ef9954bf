"""DenseRowLayout (the 4-way aggregation fast path) vs the segment path.

Semantics contract: identical results (incl. empty-row fill-with-0 and
mean-over-real-edges) to EdgeAggregator / segment_* for any fixed pattern,
plus identical gradients (the shared-gather VJP is one scatter-add).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnla_tpu.core.block import EdgeAggregator, make_edge_aggregator
from gnnla_tpu.ops.segment import DenseRowLayout
from gnnla_tpu.ops.sparse import SparseOperator

AGGS = ("min", "mean", "sum", "max")


def _random_pattern(n, avg_deg, seed, with_empty=True):
    rng = np.random.default_rng(seed)
    deg = rng.poisson(avg_deg, n)
    if with_empty:
        deg[rng.choice(n, max(1, n // 10), replace=False)] = 0
    rows = np.repeat(np.arange(n), deg)
    return rows, int(rows.shape[0])


@pytest.mark.parametrize("feat", [1, 3])
@pytest.mark.parametrize("seed", [0, 7])
def test_dense_layout_matches_segment(feat, seed):
    n = 50
    rows, e = _random_pattern(n, 4, seed)
    lay = DenseRowLayout(rows, n)
    assert not lay.is_reshape
    data = jnp.asarray(np.random.default_rng(seed + 1)
                       .standard_normal((e, feat)), jnp.float32)
    seg = EdgeAggregator(jnp.asarray(rows), n)
    np.testing.assert_allclose(lay.multi(AGGS, data), seg.multi(AGGS, data),
                               rtol=1e-6, atol=1e-6)
    for r in AGGS:
        np.testing.assert_allclose(getattr(lay, r)(data),
                                   getattr(seg, r)(data),
                                   rtol=1e-6, atol=1e-6)


def test_dense_layout_1d_shape_parity():
    rows, e = _random_pattern(30, 3, 3)
    lay = DenseRowLayout(rows, 30)
    seg = EdgeAggregator(jnp.asarray(rows), 30)
    data = jnp.asarray(np.random.default_rng(0).standard_normal(e),
                       jnp.float32)
    for r in AGGS:
        a, b = getattr(lay, r)(data), getattr(seg, r)(data)
        assert a.shape == b.shape == (30,)
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(lay.multi(AGGS, data), seg.multi(AGGS, data),
                               rtol=1e-6, atol=1e-6)


def test_dense_layout_reshape_path():
    # uniform degree + row-contiguous edges -> pure reshape, no gather
    n, k = 16, 4
    rows = np.repeat(np.arange(n), k)
    lay = DenseRowLayout(rows, n)
    assert lay.is_reshape
    data = jnp.asarray(np.random.default_rng(2)
                       .standard_normal((n * k, 2)), jnp.float32)
    seg = EdgeAggregator(jnp.asarray(rows), n)
    np.testing.assert_allclose(lay.multi(AGGS, data), seg.multi(AGGS, data),
                               rtol=1e-6, atol=1e-6)


def test_dense_layout_unsorted_rows():
    rng = np.random.default_rng(9)
    rows, e = _random_pattern(40, 3, 9)
    perm = rng.permutation(e)
    rows_u = rows[perm]
    lay = DenseRowLayout(rows_u, 40)
    seg = EdgeAggregator(jnp.asarray(rows_u), 40)
    data = jnp.asarray(rng.standard_normal((e, 2)), jnp.float32)
    np.testing.assert_allclose(lay.multi(AGGS, data), seg.multi(AGGS, data),
                               rtol=1e-6, atol=1e-6)


def test_dense_layout_gradient_parity():
    rows, e = _random_pattern(25, 4, 5)
    lay = DenseRowLayout(rows, 25)
    seg = EdgeAggregator(jnp.asarray(rows), 25)
    w = jnp.asarray(np.random.default_rng(6).standard_normal((25, 4)),
                    jnp.float32)
    data = jnp.asarray(np.random.default_rng(7).standard_normal(e),
                       jnp.float32)

    def f_lay(v):
        return jnp.sum(w * lay.multi(AGGS, v))

    def f_seg(v):
        return jnp.sum(w * seg.multi(AGGS, v[:, None]))

    g1, g2 = jax.grad(f_lay)(data), jax.grad(f_seg)(data)
    np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-5)


def test_make_edge_aggregator_dispatch():
    op = SparseOperator.from_dense(
        np.array([[2.0, -1, 0], [-1, 2, -1], [0, -1, 2]]))
    agg = make_edge_aggregator(op, op.n_rows)
    assert isinstance(agg, DenseRowLayout)
    # masked batches stay on the segment path
    agg2 = make_edge_aggregator(op, op.n_rows,
                                mask=jnp.ones(op.nnz, bool))
    assert isinstance(agg2, EdgeAggregator)
    # layout is pattern-cached and survives with_values
    op2 = op.with_values(np.asarray(op.vals) * 2.0)
    assert op2.row_layout() is op.row_layout()


def test_jacobi_features_use_fast_path():
    from gnnla_tpu.models.trainable_jacobi import jacobi_diag_features
    from gnnla_tpu.ops.segment import multi_segment_reduce

    A = np.array([[4.0, -1, 0, -2], [-1, 5, -1, 0],
                  [0, -1, 6, -1], [-2, 0, -1, 7]])
    op = SparseOperator.from_dense(A).remove_diagonal()
    diag = jnp.asarray(np.diag(A), jnp.float32)
    feats = jacobi_diag_features(op, diag)
    ref = multi_segment_reduce(AGGS, op.vals[:, None], op.rows, 4,
                               is_sorted=True)
    np.testing.assert_allclose(feats[:, 0], diag, rtol=1e-6)
    np.testing.assert_allclose(feats[:, 1:], ref, rtol=1e-6, atol=1e-6)
