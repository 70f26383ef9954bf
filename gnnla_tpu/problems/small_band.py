"""Small-band FEM meshes: poorly scaled diagonals for trainable Jacobi.

Reimplements /root/reference/pytorch/TrainableJacobiDiag/getSmallBandMatrices.py:
46-125: a structured unit-square grid with a 2-element-wide vertical band of
width h inserted at the grid point nearest `band_loc`, homogeneous Dirichlet
boundaries eliminated. The thin elements produce large diagonal entries —
exactly the regime where a learned Jacobi diagonal beats fixed omega.

Returns (K SparseOperator, xy coords of kept vertices, band_loc).
"""

from __future__ import annotations

import numpy as np

from gnnla_tpu.ops.sparse import SparseOperator
from gnnla_tpu.problems.quad_fem import build_matrix_quads


def small_band_matrix(n: int, h: float, band_loc: float = 0.5, *,
                      dtype=None):
    """n = vertices per side of the base grid; h = band half-grid width."""
    import jax.numpy as jnp
    dtype = dtype or jnp.float32
    K, xy, bl = small_band_matrix_host(n, h, band_loc)
    return (SparseOperator.from_scipy(K, dtype=dtype), xy, bl)


def small_band_matrix_host(n: int, h: float, band_loc: float = 0.5):
    """Host-only twin of `small_band_matrix` returning (scipy COO, xy,
    band_loc) — safe to run in dataset-generation worker processes, which
    must never import jax (on tunneled TPU backends a second process would
    contend for the device)."""
    x_grid = np.linspace(0.0, 1.0, n)
    band_idx = int(np.abs(x_grid - band_loc).argmin())
    x_band_loc = x_grid[band_idx]

    x_cols = np.concatenate([x_grid[:band_idx],
                             [x_band_loc - h, x_band_loc, x_band_loc + h],
                             x_grid[band_idx + 1:]])   # n+2 columns
    ncols = n + 2

    x = np.tile(x_cols, n)
    y = np.repeat(np.linspace(0.0, 1.0, n), ncols)
    xy = np.stack([x, y], axis=1)

    quads = []
    for j in range(n - 1):
        for i in range(ncols - 1):
            idx = i + ncols * j
            quads.append([idx, idx + 1, idx + ncols + 1, idx + ncols])
    quads = np.array(quads)

    K = build_matrix_quads(quads, xy).tolil()

    # eliminate homogeneous Dirichlet boundary (first/last row and columns 0
    # and ncols-1 of every row), reference :110-125
    npts = n * ncols
    keep = []
    for i in range(npts):
        on_boundary = (i < ncols or i % ncols == 0 or i % ncols == ncols - 1
                       or i >= ncols * (n - 1))
        if not on_boundary:
            keep.append(i)
    keep = np.array(keep)
    K = K[keep][:, keep].tocoo()
    return K, xy[keep], x_band_loc
