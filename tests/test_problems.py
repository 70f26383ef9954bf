"""Oracle tests for the problem/data generators (L0 layer)."""

import numpy as np
import pytest

from gnnla_tpu.problems import laplacian_2d, laplacian_nd
from gnnla_tpu.problems.diffusion_fem import (
    alpha_beta_targets, constant_diffusion_matrix, cosine_diffusion_matrix,
    element_stiffness_field, constant_field)
from gnnla_tpu.problems.fem_heateqn import (
    element_stiffness, heateqn_fem_2d, stretched_mesh_matrix)
from gnnla_tpu.problems.quad_fem import build_matrix_quads, structured_quads
from gnnla_tpu.problems.small_band import small_band_matrix


def test_laplacian_nd_matches_2d():
    """laplacianfun.m's PD convention is the negation of UtilsGNN's."""
    A2, _, dn = laplacian_nd([4, 4])
    A1 = laplacian_2d(4)
    np.testing.assert_allclose(np.asarray(A2.to_dense()),
                               -np.asarray(A1.to_dense()))
    # corner vertices have 2 eliminated Dirichlet neighbors
    assert dn[0] == 2 and dn[-1] == 2


def test_laplacian_nd_periodic():
    A, _, _ = laplacian_nd([4, 4], bcs=[1, 1])
    D = np.asarray(A.to_dense(), dtype=np.float64)
    # fully periodic: every row sums to zero and has 4 off-diag neighbors
    np.testing.assert_allclose(D.sum(axis=1), 0.0, atol=1e-5)
    assert np.all((D != 0).sum(axis=1) == 5)


def test_heateqn_element_stencil():
    """Interior stencil vs the Astencil closed form
    (heateqnfem2dfun.m:105-112): self 4(2a^2+2)/6a, x-neighbor 2(-2a^2+1)/6a,
    y-neighbor 2(a^2-2)/6a, corner (-a^2-1)/6a."""
    for alpha in (1.0, 2.5, 7.0):
        op = heateqn_fem_2d((6, 6), (1.0, alpha), bcs=(0, 0))
        D = np.asarray(op.to_dense(), dtype=np.float64)
        n = 7  # points per side
        center = 3 * n + 3  # interior point
        f = 1.0 / (6.0 * alpha)
        assert np.isclose(D[center, center], f * 4 * (2 * alpha**2 + 2),
                          rtol=1e-5)
        assert np.isclose(D[center, center + 1], f * 2 * (-2 * alpha**2 + 1),
                          rtol=1e-5)
        assert np.isclose(D[center, center + n], f * 2 * (alpha**2 - 2),
                          rtol=1e-5)
        assert np.isclose(D[center, center + n + 1], f * (-alpha**2 - 1),
                          rtol=1e-5)


def test_heateqn_bcs():
    op_oaz = heateqn_fem_2d((5, 5), (1.0, 1.0), bcs=(1, 1))
    D = np.asarray(op_oaz.to_dense(), dtype=np.float64)
    assert D.shape == (36, 36)
    # boundary rows are identity
    assert D[0, 0] == 1.0 and np.count_nonzero(D[0]) == 1

    op_elim = heateqn_fem_2d((5, 5), (1.0, 1.0), bcs=(2, 2))
    assert op_elim.shape == (16, 16)  # 4x4 interior


def test_quad_fem_matches_stencil_element():
    """Unit-aspect quad element stiffness from 9-pt Gauss quadrature equals
    the closed-form heat-eqn element (alpha=1)."""
    xy = np.array([[0., 0.], [1., 0.], [1., 1.], [0., 1.]])
    quads = np.array([[0, 1, 2, 3]])
    K = build_matrix_quads(quads, xy).toarray()
    np.testing.assert_allclose(K, element_stiffness(1.0), rtol=1e-12)


def test_quad_fem_structured_spd_after_dirichlet():
    n = 5
    xs = np.linspace(0, 1, n)
    X, Y = np.meshgrid(xs, xs, indexing="xy")
    xy = np.stack([X.ravel(), Y.ravel()], axis=1)
    K = build_matrix_quads(structured_quads(n, n), xy).toarray()
    # symmetric, rows sum to 0 (pure Neumann)
    np.testing.assert_allclose(K, K.T, atol=1e-12)
    np.testing.assert_allclose(K.sum(axis=1), 0.0, atol=1e-12)
    # eliminate boundary -> SPD interior
    interior = [i + n * j for j in range(1, n - 1) for i in range(1, n - 1)]
    Ki = K[np.ix_(interior, interior)]
    assert np.all(np.linalg.eigvalsh(Ki) > 0)


def test_small_band_matrix():
    K, xy, band_loc = small_band_matrix(8, 0.001, 0.3)
    D = np.asarray(K.to_dense(), dtype=np.float64)
    np.testing.assert_allclose(D, D.T, atol=1e-4)
    assert np.all(np.linalg.eigvalsh(D) > 0)       # SPD
    # thin band -> badly scaled diagonal (the training regime uses
    # h_low=0.0005, reference TrainableJacobiDiag/train.py:74)
    d = np.diag(D)
    assert d.max() / d.min() > 10.0
    assert xy.shape[0] == K.shape[0]
    assert abs(band_loc - 0.2857142857) < 0.01


def test_constant_diffusion_element_exact():
    """Quadrature element matrices vs the closed-form bilinear element:
    alpha/6 * Kx + beta/6 * Ky (independent of h for diffusion)."""
    alpha, beta = 0.7, 1.3
    ke = element_stiffness_field(4, constant_field(alpha),
                                 constant_field(beta))
    kx = np.array([[2, -2, -1, 1], [-2, 2, 1, -1],
                   [-1, 1, 2, -2], [1, -1, -2, 2]]) / 6.0
    ky = np.array([[2, 1, -1, -2], [1, 2, -2, -1],
                   [-1, -2, 2, 1], [-2, -1, 1, 2]]) / 6.0
    expected = alpha * kx + beta * ky
    for e in range(16):
        np.testing.assert_allclose(ke[e], expected, atol=1e-13)


def test_periodic_diffusion_matrix_properties():
    op = cosine_diffusion_matrix((1.0, 0.5, 1.5, 2.0), 8)
    D = np.asarray(op.to_dense(), dtype=np.float64)
    np.testing.assert_allclose(D, D.T, atol=1e-6)
    # periodic diffusion operator annihilates constants
    np.testing.assert_allclose(D @ np.ones(64), 0.0, atol=1e-5)
    # positive semidefinite with a single (constant) null vector
    evals = np.linalg.eigvalsh(D)
    assert evals[0] > -1e-5
    assert np.sum(np.abs(evals) < 1e-6) == 1

    alpha, beta = alpha_beta_targets((1.0, 0.5, 1.5, 2.0), 8)
    assert alpha.shape == (64,) and beta.shape == (64,)
    assert np.all(alpha >= 0) and np.all(alpha <= 1)


def test_constant_diffusion_matrix_matches_cosine_at_zero_freq():
    """theta = 0 cosine field == constant 1.1 field."""
    op_c = constant_diffusion_matrix(1.1, 1.1, 6)
    op_z = cosine_diffusion_matrix((0.0, 0.0, 0.0, 0.0), 6)
    np.testing.assert_allclose(np.asarray(op_c.to_dense()),
                               np.asarray(op_z.to_dense()), atol=1e-5)


def test_stretched_mesh_matrix():
    op = stretched_mesh_matrix(6, 3.0)
    assert op.shape == (25, 25)
    D = np.asarray(op.to_dense(), dtype=np.float64)
    assert np.all(np.linalg.eigvalsh(D) > 0)
