"""Oracle tests for C/F splitting, direct interpolation, and the V-cycle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from gnnla_tpu.amg import (assemble_prolongation, galerkin_product, split,
                           split_alternating, split_cljp, split_pmis)
from gnnla_tpu.models import (direct_interp, jacobi, residual, setup_twogrid,
                              soc_classic, solve, vcycle)
from gnnla_tpu.problems import laplacian_2d

N = 5


@pytest.fixture(scope="module")
def A():
    return laplacian_2d(N)


def _strength_matrix(A, theta=0.25):
    A_nd = A.remove_diagonal()
    s_ij = np.asarray(soc_classic(A_nd, theta)) > 0
    S = sp.coo_matrix(
        (s_ij.astype(float),
         (np.asarray(A_nd.rows), np.asarray(A_nd.cols))),
        shape=A.shape).tocsr()
    return A_nd, S


@pytest.mark.parametrize("method", ["cljp", "pmis"])
def test_splitting_valid(A, method):
    """Every F point must strongly depend on at least one C point, and no two
    C points may be strongly connected... (C is an independent set for PMIS;
    CLJP allows C-C edges only through removed edges, so check coverage)."""
    _, S = _strength_matrix(A)
    coarse = split(S, method=method, seed=0)
    assert coarse.shape == (N * N,)
    assert 0 < coarse.sum() < N * N
    fine = np.flatnonzero(coarse == 0)
    for i in fine:
        deps = S.indices[S.indptr[i]:S.indptr[i + 1]]
        assert np.any(coarse[deps] == 1), f"F point {i} has no C neighbor"


def test_alternating_split():
    c = split_alternating(10)
    assert c.tolist() == [1, 0] * 5


def test_direct_interp_formula_parity(A):
    """‖P_gnn − P_formula‖ ≈ 0 (reference DirectInterpGNN.py:176-261).

    The dense formula: for F point i,
      W[i, :] = -A[i, :] * (sum_k!=i A_ik) / (A_ii * sum_{k: strong C} A_ik),
    C-point rows are identity; keep coarse columns.
    """
    A_nd, S = _strength_matrix(A)
    coarse = split(S, method="cljp", seed=0)
    strong = np.asarray(soc_classic(A_nd, 0.25)) > 0

    w_ij = direct_interp(A_nd, A.diagonal(),
                         jnp.asarray(coarse, jnp.float32),
                         jnp.asarray(strong, jnp.float32))
    P = assemble_prolongation(A_nd, coarse, np.asarray(w_ij))
    P_dense = np.asarray(P.to_dense(), dtype=np.float64)

    # dense oracle
    Ad = np.asarray(A.to_dense(), dtype=np.float64)
    n = Ad.shape[0]
    S_dense = S.toarray() > 0
    keep = coarse.astype(bool)
    W = np.zeros((n, n))
    for i in range(n):
        if keep[i]:
            W[i, i] = 1.0
            continue
        numerator = Ad[i].sum() - Ad[i, i]
        denominator = Ad[i, i] * Ad[i][S_dense[i] & keep].sum()
        W[i] = (-Ad[i] * numerator) / denominator
        W[i, i] = 0.0
    W = W[:, keep]

    np.testing.assert_allclose(P_dense, W, rtol=1e-4, atol=1e-5)


def test_galerkin_product(A):
    A_nd, S = _strength_matrix(A)
    coarse = split(S, method="cljp", seed=0)
    strong = np.asarray(soc_classic(A_nd, 0.25)) > 0
    w_ij = direct_interp(A_nd, A.diagonal(),
                         jnp.asarray(coarse, jnp.float32),
                         jnp.asarray(strong, jnp.float32))
    P = assemble_prolongation(A_nd, coarse, np.asarray(w_ij))
    Ac = galerkin_product(A, P)

    Pd = np.asarray(P.to_dense(), dtype=np.float64)
    Ad = np.asarray(A.to_dense(), dtype=np.float64)
    np.testing.assert_allclose(np.asarray(Ac.to_dense()), Pd.T @ Ad @ Pd,
                               rtol=1e-4, atol=1e-4)


def test_vcycle_converges(A, rng):
    """Residual decreases monotonically over 5 cycles and beats 6 plain
    Jacobi sweeps (reference VCycle.py:274-277, test_vcycle.m:92-100)."""
    b = jnp.asarray(rng.random(N * N), jnp.float32)
    x0 = jnp.asarray(rng.random(N * N), jnp.float32)

    setup = setup_twogrid(A, theta=0.25, splitting="cljp", seed=0)

    norms = [float(jnp.linalg.norm(residual(A, b, x0)))]
    x = x0
    for _ in range(5):
        x = vcycle(setup, b, x, n_pre=3, n_post=3, coarse_deg=4)
        norms.append(float(jnp.linalg.norm(residual(A, b, x))))
    assert all(n2 < n1 for n1, n2 in zip(norms, norms[1:])), norms

    # convergence factor per cycle must beat plain Jacobi with the same
    # total smoothing work (6 sweeps/cycle)
    x_jac = jacobi(A, b, x0, omega=0.7, n_iters=30)
    r_jac = float(jnp.linalg.norm(residual(A, b, x_jac)))
    assert norms[-1] < r_jac

    # scanned driver gives the same answer as the Python loop
    x_scan = solve(setup, b, x0, n_cycles=5, n_pre=3, n_post=3, coarse_deg=4)
    np.testing.assert_allclose(x_scan, x, rtol=1e-5, atol=1e-5)


def test_vcycle_jit(A, rng):
    b = jnp.asarray(rng.random(N * N), jnp.float32)
    x0 = jnp.asarray(rng.random(N * N), jnp.float32)
    setup = setup_twogrid(A)
    f = jax.jit(lambda s, b, x: vcycle(s, b, x))
    x1 = f(setup, b, x0)
    x2 = vcycle(setup, b, x0)
    np.testing.assert_allclose(x1, x2, rtol=1e-5, atol=1e-6)


def test_setup_host_matches_device_gnn():
    """The host-numpy setup path (default, avoids device round-trips on
    tunneled TPU backends) must produce the same artifacts as the
    device-GNN path, on a mesh big enough for a non-trivial splitting."""
    A = laplacian_2d(8)
    s_host = setup_twogrid(A, theta=0.25, splitting="cljp", seed=0)
    s_dev = setup_twogrid(A, theta=0.25, splitting="cljp", seed=0,
                          use_device_gnn=True)
    np.testing.assert_array_equal(np.asarray(s_host.coarse_flags),
                                  np.asarray(s_dev.coarse_flags))
    assert s_host.P.shape == s_dev.P.shape
    np.testing.assert_allclose(np.asarray(s_host.P.to_dense()),
                               np.asarray(s_dev.P.to_dense()),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_host.Ac.to_dense()),
                               np.asarray(s_dev.Ac.to_dense()),
                               rtol=1e-4, atol=1e-5)


def test_vcycle_dia_fast_path_matches(A, rng):
    """DIA-swapped setup runs the same cycle (matvec-protocol polymorphism)
    and matches the COO path to float tolerance."""
    from gnnla_tpu.models import setup_with_dia
    b = jnp.asarray(rng.random(N * N), jnp.float32)
    x0 = jnp.asarray(rng.random(N * N), jnp.float32)
    setup = setup_twogrid(A, theta=0.25, splitting="cljp", seed=0)
    setup_dia = setup_with_dia(setup)

    x_coo = vcycle(setup, b, x0, n_pre=2, n_post=2, coarse_deg=3)
    x_dia = vcycle(setup_dia, b, x0, n_pre=2, n_post=2, coarse_deg=3)
    np.testing.assert_allclose(np.asarray(x_dia), np.asarray(x_coo),
                               rtol=1e-4, atol=1e-5)

    # and it stays jittable with the swapped pytree
    x_jit = jax.jit(lambda s, b, x: vcycle(s, b, x, n_pre=2, n_post=2,
                                           coarse_deg=3))(setup_dia, b, x0)
    np.testing.assert_allclose(np.asarray(x_jit), np.asarray(x_dia),
                               rtol=1e-5, atol=1e-6)


def test_split_empty_strength_no_crash():
    """Splitting an all-zero strength matrix: every point is isolated ->
    all fine, no coarse points, no crash (edge case from the verify
    recipe)."""
    S = sp.csr_matrix((9, 9))
    for method in ("cljp", "pmis"):
        out = split(S, method=method, seed=0)
        assert out.shape == (9,)
        assert out.sum() == 0
