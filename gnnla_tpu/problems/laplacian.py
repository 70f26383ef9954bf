"""Finite-difference Laplacians — the universal test fixture.

Reimplements the semantics of the reference generators:
  * `laplacian_2d(N)` — the 2D 5-point Laplacian built via Kronecker sums,
    matching /root/reference/pytorch/UtilsGNN.py:53-67 (diagonal = -2 per
    dimension, off-diagonals = +1; note the reference's sign convention has
    a *negative* diagonal).
  * `laplacian_nd(npts, bcs)` — N-dimensional FD Laplacian with optional
    periodic wrap per dimension and Dirichlet-neighbor counts, matching
    /root/reference/matlab/laplacianfun.m:58-104 (positive-definite
    convention: diagonal = +2*ndim, off-diagonals = -1).

Construction is host-side numpy (setup phase); outputs are `SparseOperator`s.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from gnnla_tpu.ops.sparse import SparseOperator


def laplacian_2d(n: int, *, dtype=None) -> SparseOperator:
    """2D 5-point Laplacian on an n x n grid, reference sign convention
    (diag -4, off-diag +1). Shape [n^2, n^2]."""
    import jax.numpy as jnp
    dtype = dtype or jnp.float32
    eye = sp.eye(n)
    ones = np.ones(n)
    lap1d = sp.spdiags([ones, -2 * ones, ones], [-1, 0, 1], n, n)
    lap2d = sp.kron(eye, lap1d) + sp.kron(lap1d, eye)
    return SparseOperator.from_scipy(lap2d.tocoo(), dtype=dtype)


def laplacian_nd(npts, bcs=None, *, dtype=None) -> SparseOperator:
    """N-dimensional FD Laplacian, positive-definite convention
    (diag +2*ndim, off-diag -1), optional periodic BC per dimension.

    Returns (op, vertices, dirichlet_neighbors) like the MATLAB function:
      vertices : [N, ndim] integer grid coordinates (1-based like MATLAB)
      dn       : [N] count of eliminated Dirichlet neighbors per vertex
    """
    import jax.numpy as jnp
    dtype = dtype or jnp.float32
    npts = list(npts)
    ndim = len(npts)
    if bcs is None:
        bcs = [0] * ndim
    n = int(np.prod(npts))

    mat = 2 * ndim * sp.eye(n, format="lil")
    jump = np.concatenate([[1], np.cumprod(npts)])
    for d in range(ndim):
        j = int(jump[d])
        block = int(jump[d + 1])
        # interior neighbor mask along dimension d
        vec = np.tile(np.concatenate([np.ones(j * (npts[d] - 1)),
                                      np.zeros(j)]), n // block)[: n - j]
        mat = mat - sp.diags(vec, offsets=j, shape=(n, n)) \
                  - sp.diags(vec, offsets=-j, shape=(n, n))
        if bcs[d] == 1:  # periodic wrap
            jp = block - j
            vec_p = np.tile(np.concatenate([np.ones(j),
                                            np.zeros(j * (npts[d] - 1))]),
                            n // block)[: n - jp]
            mat = mat - sp.diags(vec_p, offsets=jp, shape=(n, n)) \
                      - sp.diags(vec_p, offsets=-jp, shape=(n, n))

    mat = mat.tocoo()
    # vertex integer coordinates (1-based, MATLAB layout)
    vertices = np.arange(1, npts[0] + 1).reshape(-1, 1)
    for d in range(1, ndim):
        sz = vertices.shape[0]
        rep = np.tile(vertices, (npts[d], 1))
        new_col = np.repeat(np.arange(1, npts[d] + 1), sz).reshape(-1, 1)
        vertices = np.hstack([rep, new_col])

    deg = np.asarray((np.abs(mat) > 0).sum(axis=1)).ravel()
    dn = deg.max() - deg
    return SparseOperator.from_scipy(mat, dtype=dtype), vertices, dn


def grid_coords_2d(n: int) -> np.ndarray:
    """Unit-square interior coordinates of the n x n grid vertices,
    matching the reference's high-frequency-mode coordinates
    (TrainableJacobiDiag/loss.py:147-152): x_i = (i+1)/(n+1)."""
    idx = np.arange(n)
    x = (idx + 1) / (n + 1)
    xx, yy = np.meshgrid(x, x, indexing="xy")
    return np.stack([xx.ravel(), yy.ravel()], axis=1)
