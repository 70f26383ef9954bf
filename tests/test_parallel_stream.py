"""Sharded stream SpMV (general unstructured graphs) on the 8-device mesh.

The distributed twin of ops/pallas_stream — the torch_scatter execution
model (reference MatVecGNN.py:43-62) at scale. Contract (SURVEY.md §4
"Distributed testing"): sharded numerics match the host oracle to fp
tolerance. The kernel runs in Pallas interpret mode here (no TPU in CI);
the identical pallas_call lowers to Mosaic on hardware.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh
from scipy import sparse as sp

from gnnla_tpu.parallel import (build_sharded_stream, stream_scaling_model)


@pytest.fixture(scope="module")
def mesh():
    devices = np.array(jax.devices()[:8])
    return Mesh(devices, axis_names=("rows",))


def _banded_unstructured(n, k, seed, scramble=True):
    """Nonsymmetric random-valued operator with moderate bandwidth, row
    order scrambled so RCM has real work to do."""
    rng = np.random.default_rng(seed)
    idx = np.arange(n)
    rows, cols = [], []
    for off in range(-(k // 2), k // 2 + 1):
        rows.append(idx)
        cols.append(np.clip(idx + off, 0, n - 1))
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = rng.standard_normal(rows.size).astype(np.float32)
    A = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    A.sum_duplicates()
    if scramble:
        p = rng.permutation(n)
        A = A[p][:, p].tocsr()
    A.sort_indices()
    return A


def test_sharded_stream_parity(mesh):
    """8 row-block shards + ppermute halos == scipy, non-tile-multiple n."""
    n = 9000  # pads to 16 tiles -> 2 tiles/shard
    A = _banded_unstructured(n, 9, seed=0)
    kern = build_sharded_stream(A, mesh, "rows", interpret=True)
    assert kern.h_tiles >= 1  # scrambled band: real halo traffic
    assert kern.t_global == 16

    rng = np.random.default_rng(1)
    x = rng.standard_normal(n).astype(np.float32)
    y = kern.matvec(x)
    ref = A @ x
    np.testing.assert_allclose(y, ref, rtol=2e-5, atol=2e-5 * np.abs(ref).max())


def test_sharded_stream_chained_applies(mesh):
    """Iterating apply on the padded sharded layout (the solver pattern)
    stays correct over repeated halo exchanges."""
    n = 8192
    A = _banded_unstructured(n, 5, seed=2)
    # scale to spectral radius < 1 so the iteration stays finite
    A = (A * (0.2 / np.abs(A).sum(axis=1).max())).tocsr()
    kern = build_sharded_stream(A, mesh, "rows", interpret=True)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(n).astype(np.float32)

    x3 = kern.shard(kern.to_padded(x))
    for _ in range(3):
        x3 = kern.apply(kern.packs, x3)
    yk = np.asarray(x3).reshape(-1)[: n]
    y = yk[np.argsort(kern.perm)] if kern.perm is not None else yk

    xp = x.copy()
    for _ in range(3):
        xp = A @ xp
    np.testing.assert_allclose(y, xp, rtol=1e-4, atol=1e-5)


def test_sharded_stream_rejects_wide_bandwidth(mesh):
    """A dense-coupled operator whose RCM bandwidth exceeds one shard must
    fail loudly (the COO sharded path is the fallback)."""
    n = 8192
    rng = np.random.default_rng(4)
    rows = rng.integers(0, n, 40000)
    cols = rng.integers(0, n, 40000)  # uniform random: bandwidth ~ n
    A = sp.csr_matrix((np.ones(40000, np.float32), (rows, cols)),
                      shape=(n, n))
    A = (A + sp.identity(n, np.float32)).tocsr()
    with pytest.raises(ValueError, match="halo reach|column window"):
        build_sharded_stream(A, mesh, "rows", interpret=True)


def test_sharded_stream_vcycle_parity(mesh):
    """Distributed two-grid cycle with stream-kernel smoothing/residual ==
    single-device `vcycle` on the same setup (the fast-path twin of
    make_sharded_vcycle; reference composition VCycle.py:175-237)."""
    from gnnla_tpu.models import residual, setup_twogrid, vcycle
    from gnnla_tpu.parallel import make_sharded_stream_vcycle
    from gnnla_tpu.problems import laplacian_2d

    n_grid = 96  # 9216 rows -> 16 tiles -> 2 tiles/shard on 8 devices
    A = laplacian_2d(n_grid).eliminate_zeros()
    n = A.n_rows
    # scramble the row order so the RCM reorder inside the kernel build
    # does real work (the caller-order contract must hold regardless)
    rng = np.random.default_rng(0)
    p = rng.permutation(n)
    Ah = A.to_scipy().tocsr()[p][:, p].tocsr()
    Ah.sort_indices()
    from gnnla_tpu.ops.sparse import SparseOperator
    A = SparseOperator.from_scipy(Ah)

    setup = setup_twogrid(A, theta=0.25, splitting="pmis", seed=0)
    b = rng.standard_normal(n).astype(np.float32)
    x0 = rng.standard_normal(n).astype(np.float32)

    cycle, kern = make_sharded_stream_vcycle(setup, mesh, "rows",
                                             interpret=True)
    assert kern.h_tiles >= 1  # scrambled Laplacian: real halo traffic

    import jax.numpy as jnp
    x3 = kern.shard(kern.to_padded(x0))
    b3 = kern.shard(kern.to_padded(b))
    for _ in range(2):
        x3 = cycle(b3, x3)
    x_sh = kern.from_padded(x3)

    x_ref = jnp.asarray(x0)
    for _ in range(2):
        x_ref = vcycle(setup, jnp.asarray(b), x_ref)
    x_ref = np.asarray(x_ref)

    np.testing.assert_allclose(x_sh, x_ref, rtol=2e-4,
                               atol=2e-4 * np.abs(x_ref).max())
    # and the cycle reduces the residual (parity, not convergence rate,
    # is the contract here — the PMIS setup on a scrambled Laplacian is a
    # deliberately unflattering fixture)
    r0 = np.linalg.norm(np.asarray(residual(A, jnp.asarray(b),
                                            jnp.asarray(x0))))
    r2 = np.linalg.norm(np.asarray(residual(A, jnp.asarray(b),
                                            jnp.asarray(x_sh))))
    assert r2 < 0.9 * r0, (r0, r2)


def test_stream_scaling_model_fields(mesh):
    n = 9000
    A = _banded_unstructured(n, 9, seed=5)
    kern = build_sharded_stream(A, mesh, "rows", interpret=True)
    m = stream_scaling_model(kern)
    assert m["ndev"] == 8
    assert 0 < m["efficiency_serial"] <= 1
    assert 0 < m["efficiency_overlapped"] <= 1
    assert m["comm_bytes_per_chip"] == 2 * kern.h_tiles * 1024 * 4
    assert m["edges_per_s_aggregate"] > 0


# ------------------------------------------------------------ gradients
def test_sharded_stream_vjp_x_cotangent(mesh):
    """d/dx sum(w * (A x)) == A^T w through the sharded apply — the
    transposed packs + reversed halo scatter-add."""
    import jax.numpy as jnp

    n = 9000
    A = _banded_unstructured(n, 9, seed=2)
    kern = build_sharded_stream(A, mesh, "rows", interpret=True,
                                with_grad=True)
    assert kern.apply_diff is not None and kern.h_tiles >= 1

    rng = np.random.default_rng(3)
    x = rng.standard_normal(n).astype(np.float32)
    w = rng.standard_normal(n).astype(np.float32)
    # weights in KERNEL (RCM) order on the padded layout
    wk = np.zeros(kern.padded_len, np.float32)
    wk[:n] = w[kern.perm] if kern.perm is not None else w
    w3 = jnp.asarray(wk).reshape(-1, 8, 128)

    x3 = kern.shard(kern.to_padded(x))

    # forward parity with the non-diff apply
    y_diff = kern.apply_diff(kern.diff_args, x3)
    y_ref = kern.apply(kern.packs, x3)
    np.testing.assert_allclose(np.asarray(y_diff), np.asarray(y_ref),
                               rtol=1e-6, atol=1e-6)

    def loss(x3):
        return jnp.sum(w3 * kern.apply_diff(kern.diff_args, x3))

    g = jax.grad(loss)(x3)
    got = kern.from_padded(g)
    want = A.T @ w
    np.testing.assert_allclose(got, want, rtol=2e-4,
                               atol=2e-4 * np.abs(want).max())


def test_sharded_stream_vjp_vals_cotangent(mesh):
    """Per-slot vals gradient == ybar[row] * x[col] (dense oracle),
    accumulated back onto the (row, col) pattern."""
    import jax.numpy as jnp

    n = 6000
    A = _banded_unstructured(n, 7, seed=4)
    kern = build_sharded_stream(A, mesh, "rows", interpret=True,
                                with_grad=True)
    ndev = 8
    t_loc = kern.t_global // ndev
    R = t_loc * 1024
    h = kern.h_tiles

    rng = np.random.default_rng(5)
    x = rng.standard_normal(n).astype(np.float32)
    w = rng.standard_normal(n).astype(np.float32)
    wk = np.zeros(kern.padded_len, np.float32)
    wk[:n] = w[kern.perm] if kern.perm is not None else w
    w3 = jnp.asarray(wk).reshape(-1, 8, 128)
    x3 = kern.shard(kern.to_padded(x))

    def loss(diff_args, x3):
        return jnp.sum(w3 * kern.apply_diff(diff_args, x3))

    cot = jax.grad(loss, allow_int=True)(kern.diff_args, x3)
    dvals = np.asarray(cot[0][5])          # [ndev, n_units, 8, 128]
    # only the fwd vals slot carries gradient; every float leaf besides
    # it is zero (int layout leaves carry float0 tangents)
    for c in cot[0][:5] + cot[1] + cot[2]:
        a = np.asarray(c)
        if a.dtype != object and a.dtype.names is None and a.size:
            if np.issubdtype(a.dtype, np.floating):
                assert float(np.abs(a).max()) == 0.0

    # decode slots -> global (row, col); accumulate and compare to the
    # dense oracle grad dL/dA_ij = wk[i] * xk[j] on the pattern
    word = np.asarray(kern.packs[4])       # [ndev, n_units, 8, 128]
    meta = np.asarray(kern.packs[2])
    tou = np.asarray(kern.diff_args[2][0])
    tws = np.asarray(kern.diff_args[2][1])
    gmeta = np.asarray(kern.packs[3])
    xk = np.zeros(kern.padded_len, np.float32)
    xk[:n] = x[kern.perm] if kern.perm is not None else x

    got = {}
    n_units = word.shape[1]
    for d in range(ndev):
        wo = word[d]
        sc = meta[d].reshape(n_units) & 0x7FFF
        rg = gmeta[d].reshape(n_units, 8) & 7
        rowl1 = (wo >> 18) & 255
        m = (wo >> 7) & 7
        lo = wo & 127
        valid = rowl1 >= 1
        row_l = tou[d][:, None, None] * 1024 + rg[:, :, None] * 128 \
            + rowl1 - 1
        col_l = (tws[d][tou[d]] + sc)[:, None, None] * 1024 + m * 128 + lo
        row_g = d * R + row_l
        col_g = d * R - h * 1024 + col_l
        for u, s, l in zip(*np.nonzero(valid)):
            key = (int(row_g[u, s, l]), int(col_g[u, s, l]))
            got[key] = got.get(key, 0.0) + float(dvals[d, u, s, l])

    # oracle over the RCM-permuted padded operator's real entries
    from gnnla_tpu.ops.pallas_stream import rcm_csr
    A2, _ = rcm_csr(A)
    Ak = A2.tocoo()
    checked = 0
    for i, j in zip(Ak.row, Ak.col):
        want = wk[i] * xk[j]
        assert (i, j) in got, (i, j)
        np.testing.assert_allclose(got[(i, j)], want, rtol=2e-4,
                                   atol=2e-4)
        checked += 1
    assert checked == Ak.nnz
