"""Stream SpMV (general unstructured graphs): builder/layout validation.

The Pallas kernel itself needs real TPU hardware (Mosaic dynamic_gather has
no interpreter-speed path here); CI validates the host-side packing against
a numpy emulator with identical semantics, plus structural invariants the
kernel relies on. On-chip numerics + throughput run in `bench.py general`.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from gnnla_tpu.ops.pallas_stream import (NSUB, TILE, build_stream,
                                         emulate_stream, rcm_csr)


def _random_csr(rng, n, max_deg=12, extra_heavy_row=True):
    deg = rng.integers(1, max_deg + 1, n)
    rows = np.repeat(np.arange(n), deg)
    cols = rng.integers(0, n, rows.size)
    if extra_heavy_row:
        rows = np.concatenate([rows, np.full(60, 7)])
        cols = np.concatenate([cols, rng.integers(0, 900, 60)])
    vals = rng.standard_normal(rows.size).astype(np.float32)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    A.sum_duplicates()
    A.sort_indices()
    return A


@pytest.mark.parametrize("kb", [0, 1, 2, 3, None])
def test_stream_emulator_matches_scipy(rng, kb):
    A = _random_csr(rng, 5000)
    fmt = build_stream(A, kb=kb)
    x = rng.standard_normal(5000).astype(np.float32)
    y = emulate_stream(fmt, x)
    expect = A @ x
    np.testing.assert_allclose(y, expect, rtol=2e-5,
                               atol=2e-5 * np.abs(expect).max())


def test_stream_delaunay_with_rcm(rng):
    from scipy.spatial import Delaunay
    n = 12000
    pts = rng.random((n, 2))
    tri = Delaunay(pts)
    s = tri.simplices
    e = np.concatenate([s[:, [0, 1]], s[:, [1, 2]], s[:, [2, 0]]])
    A = sp.coo_matrix((np.ones(e.shape[0], np.float32), (e[:, 0], e[:, 1])),
                      shape=(n, n)).tocsr()
    A = A + A.T
    A.data[:] = -1.0
    lap = (sp.diags(np.asarray(-A.sum(axis=1)).ravel()) + A).tocsr()
    B, perm = rcm_csr(lap.astype(np.float32))
    fmt = build_stream(B)
    x = rng.standard_normal(n).astype(np.float32)
    np.testing.assert_allclose(emulate_stream(fmt, x), B @ x,
                               rtol=1e-4, atol=1e-4)
    # RCM keeps the window bounded well below the full vector
    assert fmt.w_sc * TILE < n


def test_stream_invariants(rng):
    A = _random_csr(rng, 4096, max_deg=9, extra_heavy_row=False)
    fmt = build_stream(A)
    nb = fmt.nb
    # shapes agree
    assert fmt.word.shape == (fmt.n_units, NSUB, 128)
    assert fmt.n_units == fmt.n_steps * nb
    # every tile owns >= nb units and they are contiguous
    tiles = fmt.tile_of_unit
    assert (np.diff(tiles) >= 0).all()
    _, counts = np.unique(tiles, return_counts=True)
    assert (counts >= nb).min()
    # at most one tile start and one completion per grid step
    firsts = np.flatnonzero(np.concatenate([[1], np.diff(tiles)]) != 0)
    lasts = np.flatnonzero(
        np.concatenate([np.diff(tiles), [1]]) != 0)
    assert np.unique(firsts // nb).size == firsts.size
    assert np.unique(lasts // nb).size == lasts.size
    assert fmt.step_meta[:, 0, 0].sum() == fmt.n_tiles
    assert fmt.step_meta[:, 0, 4].sum() == fmt.n_tiles
    # out_idx covers every tile, non-decreasing
    assert (np.diff(fmt.out_idx) >= 0).all()
    assert np.unique(fmt.out_idx).size == fmt.n_tiles
    # packed word fields in range (cls in bits 26+, dep lane+1 <= 128)
    assert int(fmt.word.max()) < (1 << 29)
    dep1 = (fmt.word >> 10) & 255
    assert int(dep1.max()) <= 128
    # total real value mass preserved
    np.testing.assert_allclose(fmt.vals.sum(), A.data.sum(), rtol=1e-3)
