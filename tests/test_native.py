"""Native C++ runtime (graph builder + CLJP) vs the numpy implementations."""

import subprocess

import numpy as np
import pytest
import scipy.sparse as sp

from gnnla_tpu import native_ext
from gnnla_tpu.amg.splitting import split_cljp
from gnnla_tpu.models import soc_classic
from gnnla_tpu.problems import laplacian_2d


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not native_ext.available():
        try:
            subprocess.run(["make", "-C", "native"], check=True,
                           capture_output=True, cwd="/root/repo")
        except Exception:
            pytest.skip("native toolchain unavailable")
    if not native_ext.available():
        pytest.skip("native library not built")


def test_coalesce_coo_native(rng):
    rows = rng.integers(0, 50, 500)
    cols = rng.integers(0, 50, 500)
    vals = rng.standard_normal(500)
    r, c, v = native_ext.coalesce_coo(rows, cols, vals, 50)
    expected = sp.coo_matrix((vals, (rows, cols)), shape=(50, 50))
    expected.sum_duplicates()
    expected = expected.tocsr().tocoo()
    np.testing.assert_array_equal(r, expected.row)
    np.testing.assert_array_equal(c, expected.col)
    np.testing.assert_allclose(v, expected.data, rtol=1e-12)


def test_csr_row_ptr_native(rng):
    rows = np.sort(rng.integers(0, 20, 100))
    got = native_ext.csr_row_ptr(rows, 20)
    expected = np.zeros(21, dtype=np.int64)
    np.add.at(expected, rows + 1, 1)
    expected = np.cumsum(expected)
    np.testing.assert_array_equal(got, expected)


def _strength(A, theta=0.25):
    nd = A.remove_diagonal()
    s = np.asarray(soc_classic(nd, theta)) > 0
    return sp.coo_matrix(
        (s.astype(float), (np.asarray(nd.rows), np.asarray(nd.cols))),
        shape=A.shape).tocsr()


def test_cljp_native_valid_splitting():
    """Native CLJP must produce a *valid* splitting (every F point strongly
    depends on a C point); bit-parity with the python variant is not
    required (tie-breaking RNG differs), validity is."""
    A = laplacian_2d(8)
    S = _strength(A)
    coarse = native_ext.cljp_split(S, seed=0)
    assert coarse.shape == (64,)
    assert 0 < coarse.sum() < 64
    fine = np.flatnonzero(coarse == 0)
    for i in fine:
        deps = S.indices[S.indptr[i]:S.indptr[i + 1]]
        assert np.any(coarse[deps] == 1), f"F point {i} has no C neighbor"


def test_cljp_native_matches_python_coverage():
    """Same coarse-set *size ballpark* as the python CLJP on the fixture."""
    A = laplacian_2d(10)
    S = _strength(A)
    c_native = native_ext.cljp_split(S, seed=0)
    c_python = split_cljp(S, seed=0)
    assert abs(int(c_native.sum()) - int(c_python.sum())) <= 20


# ---------------------------------------------------------------- stream
def _stream_fixtures():
    from gnnla_tpu.ops.pallas_stream import rcm_csr

    lap = laplacian_2d(48).to_scipy().tocsr()
    lap.sort_indices()
    rng = np.random.default_rng(11)
    n = 2500
    R = sp.random(n, n, density=0.004, random_state=7, format="csr")
    R = (R + R.T + sp.eye(n)).tocsr()
    R.sort_indices()
    R2, _ = rcm_csr(R.astype(np.float32))
    return [("banded", lap), ("rcm_random", R2)]


@pytest.mark.parametrize("name,A", _stream_fixtures())
@pytest.mark.parametrize("kb", [None, 0, 3])
def test_stream_pack_native_bit_identical(name, A, kb):
    """The C++ packer must reproduce the numpy packer's arrays EXACTLY —
    the numpy path is the executable spec (ops/pallas_stream.py)."""
    from gnnla_tpu.ops.pallas_stream import build_stream

    f_np = build_stream(A, kb=kb, use_native=False)
    f_cc = build_stream(A, kb=kb, use_native=True)
    for field in ("meta", "gmeta", "step_meta", "out_idx", "word", "vals",
                  "tile_of_unit", "tile_wstart"):
        a, b = getattr(f_np, field), getattr(f_cc, field)
        assert a.shape == b.shape, (field, a.shape, b.shape)
        np.testing.assert_array_equal(a, b, err_msg=f"{name}/{field}")
    assert (f_np.w_sc, f_np.kb, f_np.n, f_np.nnz, f_np.n_tiles,
            f_np.n_cols) == \
           (f_cc.w_sc, f_cc.kb, f_cc.n, f_cc.nnz, f_cc.n_tiles, f_cc.n_cols)


def test_stream_pack_native_rectangular():
    """Sharded-path inputs: n_cols != n and a forced window width."""
    from gnnla_tpu.ops.pallas_stream import build_stream

    lap = laplacian_2d(40).to_scipy().tocsr()
    n = lap.shape[0]
    block = lap[: n // 2].tocsr()  # rectangular row shard [n/2, n]
    block.sort_indices()
    f_np = build_stream(block, n_cols=n, min_w_sc=2, use_native=False)
    f_cc = build_stream(block, n_cols=n, min_w_sc=2, use_native=True)
    for field in ("meta", "gmeta", "step_meta", "out_idx", "word", "vals"):
        np.testing.assert_array_equal(getattr(f_np, field),
                                      getattr(f_cc, field), err_msg=field)


def test_stream_pack_native_spmv_correct():
    """End-to-end: native-packed format computes the right A @ x."""
    from gnnla_tpu.ops.pallas_stream import build_stream, emulate_stream

    lap = laplacian_2d(48).to_scipy().tocsr()
    lap.sort_indices()
    f = build_stream(lap, use_native=True)
    x = np.random.default_rng(3).standard_normal(lap.shape[0]) \
        .astype(np.float32)
    y = emulate_stream(f, x)
    np.testing.assert_allclose(y, lap @ x, rtol=1e-4, atol=1e-5)


def test_native_rcm_asymmetric_pattern():
    """rcm_order must return a valid permutation on ASYMMETRIC patterns
    (regression: the pseudo-peripheral BFS could wander into finished
    components and corrupt the permutation -> heap corruption in
    csr_permute_sym)."""
    import scipy.sparse as sp

    from gnnla_tpu import native_ext
    if not native_ext.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(3)
    n = 500
    A = sp.random(n, n, density=0.01, random_state=5, format="csr",
                  dtype=np.float32)  # directed: pattern != pattern.T
    A.sort_indices()
    perm = native_ext.rcm_order(A)
    assert np.array_equal(np.sort(perm), np.arange(n))
    B = native_ext.csr_permute_sym(A, perm)
    Bref = A[perm][:, perm].tocsr()
    Bref.sort_indices()
    assert (B != Bref).nnz == 0
    assert B.nnz == A.nnz


def test_native_rcm_matches_scipy_quality():
    """On a symmetric banded-ish pattern the native RCM bandwidth is
    within 2x of scipy's (same algorithm family; exact orders differ)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    from gnnla_tpu import native_ext
    if not native_ext.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(0)
    n = 1000
    rows = np.arange(n - 1)
    r = np.concatenate([rows, rng.integers(0, n, 300)])
    c = np.concatenate([rows + 1, rng.integers(0, n, 300)])
    A = sp.coo_matrix((np.ones(r.size, np.float32), (r, c)),
                      shape=(n, n)).tocsr()
    A = (A + A.T).tocsr()
    A.sort_indices()

    def bw(M):
        Mc = M.tocoo()
        return int(np.abs(Mc.row.astype(np.int64) - Mc.col).max())

    perm = native_ext.rcm_order(A)
    B = native_ext.csr_permute_sym(A, perm)
    ps = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))
    Bs = A[ps][:, ps].tocsr()
    assert bw(B) <= 2 * max(bw(Bs), 1)
