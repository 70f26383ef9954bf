"""Band-layout aggregation parity vs the segment reducers.

Contract: `band_multi_reduce` on host-packed [K, N] data reproduces
`multi_segment_reduce` on the same edges (torch_scatter semantics:
empty rows 0, mean by max(deg, 1)); the shift/broadcast helpers reproduce
x[cols] / x[rows]; `band_spmv` matches the COO matvec.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gnnla_tpu.ops.band import (BandLayout, band_broadcast, band_multi_reduce,
                                band_neighbor_values, band_spmv)
from gnnla_tpu.ops.segment import multi_segment_reduce
from gnnla_tpu.ops.sparse import SparseOperator
from gnnla_tpu.problems import laplacian_2d

AGGS = ("min", "mean", "sum", "max")


def _random_banded(n, offsets, density, seed):
    """Random pattern on a fixed set of offsets, variable row degree,
    including empty rows."""
    rng = np.random.default_rng(seed)
    rows_, cols_, vals_ = [], [], []
    for off in offsets:
        lo, hi = max(0, -off), n - max(0, off)
        keep = rng.random(hi - lo) < density
        r = np.arange(lo, hi)[keep]
        rows_.append(r)
        cols_.append(r + off)
        vals_.append(rng.standard_normal(r.size))
    rows = np.concatenate(rows_)
    cols = np.concatenate(cols_)
    vals = np.concatenate(vals_)
    return SparseOperator.from_coo(rows, cols, vals, (n, n))


@pytest.mark.parametrize("seed,density", [(0, 0.65), (1, 0.3), (2, 0.95)])
def test_band_multi_reduce_matches_segment(seed, density):
    op = _random_banded(97, (-11, -1, 0, 1, 3, 11), density, seed)
    lay = BandLayout(op)
    rows, _, vals = op.host_coo()

    bands = jnp.asarray(lay.pack(vals), jnp.float32)
    mask = jnp.asarray(lay.mask)
    deg = jnp.asarray(lay.deg, jnp.float32)

    got = band_multi_reduce(AGGS, bands, mask, deg)
    want = multi_segment_reduce(AGGS, jnp.asarray(vals, jnp.float32)[:, None],
                                jnp.asarray(rows), op.n_rows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_band_multi_reduce_multifeature():
    op = _random_banded(64, (-8, 0, 1, 8), 0.7, 3)
    lay = BandLayout(op)
    rows, _, _ = op.host_coo()
    rng = np.random.default_rng(4)
    ef = rng.standard_normal((op.nnz, 3)).astype(np.float32)

    # pack each feature column: [F, K, N] -> [K, N, F]
    bands = jnp.asarray(np.moveaxis(lay.pack(ef.T), 0, -1))
    got = band_multi_reduce(AGGS, bands, jnp.asarray(lay.mask),
                            jnp.asarray(lay.deg, jnp.float32))
    want = multi_segment_reduce(AGGS, jnp.asarray(ef), jnp.asarray(rows),
                                op.n_rows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_pack_unpack_roundtrip_and_duplicate_guard():
    op = _random_banded(50, (-5, 0, 2), 0.8, 5)
    lay = BandLayout(op)
    _, _, vals = op.host_coo()
    b = lay.pack(np.stack([vals, 2 * vals]))          # batched pack
    assert b.shape == (2, lay.k, lay.n)
    np.testing.assert_array_equal(lay.unpack(b)[0], vals)
    np.testing.assert_array_equal(lay.unpack(b)[1], 2 * vals)

    dup = SparseOperator.from_coo(np.array([0, 0]), np.array([1, 1]),
                                  np.array([1.0, 2.0]), (4, 4),
                                  coalesce=False)
    with pytest.raises(ValueError, match="duplicate"):
        BandLayout(dup)


def test_neighbor_values_and_broadcast_match_cols_rows():
    op = laplacian_2d(8).eliminate_zeros()
    lay = BandLayout(op)
    rows, cols, _ = op.host_coo()
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal(op.n_rows), jnp.float32)

    src = band_neighbor_values(x, lay.offsets)     # [K, N]
    dst = band_broadcast(x, lay.k)
    src_e = np.asarray(lay.unpack(np.asarray(src)))
    dst_e = np.asarray(lay.unpack(np.asarray(dst)))
    np.testing.assert_allclose(src_e, np.asarray(x)[cols], rtol=1e-6)
    np.testing.assert_allclose(dst_e, np.asarray(x)[rows], rtol=1e-6)

    # feature-dim variant
    xf = jnp.asarray(rng.standard_normal((op.n_rows, 2)), jnp.float32)
    srcf = band_neighbor_values(xf, lay.offsets)   # [K, N, 2]
    np.testing.assert_allclose(
        np.asarray(lay.unpack(np.moveaxis(np.asarray(srcf), -1, 0))),
        np.asarray(xf)[cols].T, rtol=1e-6)


def test_band_spmv_matches_coo():
    op = _random_banded(120, (-13, -1, 0, 1, 13), 0.85, 7)
    lay = BandLayout(op)
    _, _, vals = op.host_coo()
    bands = jnp.asarray(lay.pack(vals), jnp.float32)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal(op.n_rows), jnp.float32)
    y = band_spmv(bands, lay.offsets, x)
    y_ref = op.matvec(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)

    xm = jnp.asarray(rng.standard_normal((op.n_rows, 3)), jnp.float32)
    ym = band_spmv(bands, lay.offsets, xm)
    np.testing.assert_allclose(np.asarray(ym), np.asarray(op.matvec(xm)),
                               rtol=1e-4, atol=1e-5)
