"""Smoothed-aggregation AMG: aggregation validity, hierarchy quality,
and the scalability contract the classical pipeline can't meet."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from gnnla_tpu.amg.aggregation import (aggregate, dinv_a_lmax,
                                       filtered_operator, sa_strength,
                                       smoothed_prolongator,
                                       tentative_prolongator)
from gnnla_tpu.models import (mg_pcg, multigrid_cycle, setup_sa_multigrid)
from gnnla_tpu.problems import laplacian_2d


def _A(n):
    return laplacian_2d(n).to_scipy().tocsr().astype(np.float64)


def test_sa_strength_all_strong_on_laplacian():
    A = _A(8)
    S = sa_strength(A, 0.08)
    Ao = A.copy()
    Ao.setdiag(0)
    Ao.eliminate_zeros()
    assert S.nnz == Ao.nnz  # every 5-point coupling is strong


def test_aggregate_partition_valid():
    A = _A(16)
    S = sa_strength(A, 0.08)
    agg = aggregate(S)
    n = A.shape[0]
    assert agg.shape == (n,)
    assert agg.min() == 0
    n_agg = agg.max() + 1
    sizes = np.bincount(agg, minlength=n_agg)
    assert (sizes > 0).all()          # every id used
    assert n_agg < n / 3              # real coarsening
    # aggregates are connected within the strength graph: each non-root
    # member has a same-aggregate strong neighbor
    G = ((S + S.T) > 0).tocsr()
    for i in range(n):
        nbrs = G.indices[G.indptr[i]:G.indptr[i + 1]]
        assert (agg[nbrs] == agg[i]).any() or sizes[agg[i]] == 1


def test_aggregate_python_fallback_matches_native():
    from gnnla_tpu import native_ext

    A = _A(12)
    S = sa_strength(A, 0.08)
    ref = aggregate(S)
    if not native_ext.available():
        pytest.skip("native library not built; fallback is the only path")
    orig = native_ext.vanek_aggregate
    try:
        native_ext.vanek_aggregate = lambda G: None
        fb = aggregate(S)
    finally:
        native_ext.vanek_aggregate = orig
    np.testing.assert_array_equal(ref, fb)  # same deterministic scan


def test_tentative_prolongator_partition_of_unity():
    agg = np.array([0, 0, 1, 1, 1, 2])
    P = tentative_prolongator(agg)
    assert P.shape == (6, 3)
    # unit columns
    np.testing.assert_allclose((P.T @ P).toarray(), np.eye(3), atol=1e-14)


def test_filtered_operator_preserves_row_sums():
    A = _A(8)
    S = sa_strength(A, 0.9)  # absurd threshold: most couplings weak
    Af = filtered_operator(A, S)
    np.testing.assert_allclose(np.asarray(Af.sum(axis=1)).ravel(),
                               np.asarray(A.sum(axis=1)).ravel(),
                               atol=1e-12)


def test_smoothed_prolongator_keeps_constants():
    """Constants are the near-nullspace: A @ 1 = 0 rows (interior) must
    stay exactly interpolated — P @ (P^T 1-ish) reproduces constants on
    interior nodes because (I - w Dinv A) 1 = 1 there."""
    A = _A(16)
    S = sa_strength(A, 0.08)
    agg = aggregate(S)
    P = smoothed_prolongator(A, S, tentative_prolongator(agg), seed=0)
    sizes = np.bincount(agg)
    c = P @ np.sqrt(sizes)            # P_hat @ sqrt(sizes) = ones
    interior = np.abs(A @ np.ones(A.shape[0])) < 1e-12
    np.testing.assert_allclose(c[interior], 1.0, atol=1e-10)


def test_dinv_a_lmax_matches_dense():
    A = _A(8)
    d = A.diagonal()
    exact = np.max(np.abs(np.linalg.eigvals(A.toarray() / d[:, None])))
    est = dinv_a_lmax(A, n_iters=100)
    assert abs(est - exact) < 0.05 * exact


def test_sa_cycle_rate_size_independent():
    """The scalability contract: asymptotic V(2,2) convergence factor
    must stay bounded (< 0.55) and roughly flat from 24^2 to 48^2 —
    where the classical direct-interp hierarchy degrades towards 1."""
    rates = {}
    for n in (24, 48):
        A = laplacian_2d(n)
        ms = setup_sa_multigrid(A, seed=0)
        rng = np.random.default_rng(0)
        b = jnp.asarray(rng.random(n * n), jnp.float32)
        x = jnp.zeros(n * n, jnp.float32)
        rp = float(jnp.linalg.norm(b))
        last = None
        for _ in range(6):
            x = multigrid_cycle(ms, b, x, n_pre=2, n_post=2)
            r = float(jnp.linalg.norm(b - A.matvec(x)))
            last = r / rp
            rp = r
        rates[n] = last
    assert rates[24] < 0.55 and rates[48] < 0.55, rates
    assert rates[48] < rates[24] + 0.15, rates  # no size blow-up


def test_sa_mg_pcg_iteration_count_flat():
    """mg_pcg on the SA hierarchy reaches 1e-6 (recurrence) in a flat,
    small iteration count across sizes — the production solve contract."""
    iters = {}
    for n in (24, 48):
        A = laplacian_2d(n)
        ms = setup_sa_multigrid(A, seed=0)
        rng = np.random.default_rng(0)
        b = jnp.asarray(rng.random(n * n), jnp.float32)
        x0 = jnp.zeros(n * n, jnp.float32)
        _, hist = mg_pcg(ms, b, x0, n_iters=25, flip_sign=True)
        h = np.asarray(hist) / float(jnp.linalg.norm(b))
        conv = np.flatnonzero(h < 1e-6)
        assert conv.size, f"n={n}: no 1e-6 in 25 iters ({h[-1]:.2e})"
        iters[n] = int(conv[0]) + 1
    assert iters[48] <= iters[24] + 4, iters


def test_sa_on_anisotropic_fem():
    """Stretched quad FEM (the reference's hard case, heateqnfem2dfun.m
    stretch 7). Pointwise-Jacobi SA is known-weak on strong anisotropy
    (the classical truncation+signed-interp hierarchy covers that regime,
    tests/test_multigrid.py), but PCG-wrapped it must still converge —
    the stationary SA cycle alone stalls near rate ~0.9 here."""
    from gnnla_tpu.problems.fem_heateqn import stretched_mesh_matrix

    A = stretched_mesh_matrix(24, stretch=7.0)
    n = A.n_rows
    ms = setup_sa_multigrid(A, seed=0)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.random(n), jnp.float32)
    x0 = jnp.zeros(n, jnp.float32)
    x, hist = mg_pcg(ms, b, x0, n_iters=30)
    rel = float(jnp.linalg.norm(b - A.matvec(x))) / float(jnp.linalg.norm(b))
    assert rel < 5e-3, rel
