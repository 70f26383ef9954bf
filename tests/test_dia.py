"""DIA (diagonal) format: conversion + matvec parity with COO."""

import jax.numpy as jnp
import numpy as np
import pytest

from gnnla_tpu.ops.dia import DIAOperator, to_dia
from gnnla_tpu.ops.sparse import SparseOperator
from gnnla_tpu.problems import laplacian_2d
from gnnla_tpu.problems.diffusion_fem import cosine_diffusion_matrix


def test_dia_matvec_matches_coo(rng):
    A = laplacian_2d(8).eliminate_zeros()
    dia = to_dia(A)
    assert dia.offsets == (-8, -1, 0, 1, 8)
    assert dia.nnz == A.nnz
    x = jnp.asarray(rng.random(64), jnp.float32)
    np.testing.assert_allclose(dia.matvec(x), A.matvec(x),
                               rtol=1e-5, atol=1e-5)


def test_dia_periodic_fem(rng):
    """Periodic FEM has wrap offsets — still banded, still exact."""
    A = cosine_diffusion_matrix((1.0, 0.5, 1.5, 2.0), 8).eliminate_zeros()
    dia = to_dia(A)
    x = jnp.asarray(rng.random(64), jnp.float32)
    np.testing.assert_allclose(dia.matvec(x), A.matvec(x),
                               rtol=1e-4, atol=1e-5)


def test_dia_diagonal():
    A = laplacian_2d(5).eliminate_zeros()
    dia = to_dia(A)
    np.testing.assert_allclose(dia.diagonal(), A.diagonal())


def test_dia_rejects_nonsquare():
    R = SparseOperator.from_coo([0, 1], [0, 1], [1.0, 2.0], (2, 3))
    with pytest.raises(ValueError):
        to_dia(R)


def test_dia_wrong_size_raises():
    dia = to_dia(laplacian_2d(4).eliminate_zeros())
    with pytest.raises(ValueError):
        dia.matvec(jnp.ones(7))


def test_dia_offset_cap():
    """A dense-ish random pattern exceeds the offset cap."""
    rng = np.random.default_rng(0)
    D = rng.random((40, 40))
    op = SparseOperator.from_dense(D)
    with pytest.raises(ValueError):
        to_dia(op, max_offsets=10)
