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
