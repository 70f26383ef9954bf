"""BSR block-sparse operator — the general-graph TPU path."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from gnnla_tpu import SparseOperator
from gnnla_tpu.ops.bsr import permute, rcm_permutation, to_bsr
from gnnla_tpu.problems import laplacian_2d


@pytest.fixture(scope="module")
def A():
    return laplacian_2d(10)  # 100 rows -> block grid with B=16


def test_bsr_matvec_matches(A, rng):
    bsr = to_bsr(A, block_size=16)
    x = jnp.asarray(rng.random(100), jnp.float32)
    np.testing.assert_allclose(np.asarray(bsr.matvec(x)),
                               np.asarray(A.matvec(x)), rtol=1e-5,
                               atol=1e-5)


def test_bsr_nonmultiple_size(rng):
    A = laplacian_2d(7)  # 49 rows, not a multiple of 16
    bsr = to_bsr(A, block_size=16)
    x = jnp.asarray(rng.random(49), jnp.float32)
    np.testing.assert_allclose(np.asarray(bsr.matvec(x)),
                               np.asarray(A.matvec(x)), rtol=1e-5,
                               atol=1e-5)


def test_bsr_spmm_multicolumn(A, rng):
    bsr = to_bsr(A, block_size=16)
    X = jnp.asarray(rng.random((100, 5)), jnp.float32)
    np.testing.assert_allclose(np.asarray(bsr.matvec(X)),
                               np.asarray(A.matvec(X)), rtol=1e-5,
                               atol=1e-5)


def test_bsr_diagonal(A):
    bsr = to_bsr(A, block_size=16)
    np.testing.assert_allclose(np.asarray(bsr.diagonal()),
                               np.asarray(A.diagonal()), rtol=1e-6)


def test_bsr_random_unstructured(rng):
    """A scattered random pattern — the case DIA cannot handle."""
    S = sp.random(200, 200, density=0.05,
                  random_state=np.random.RandomState(3), format="coo")
    A = SparseOperator.from_scipy(S)
    bsr = to_bsr(A, block_size=32)
    x = jnp.asarray(rng.random(200), jnp.float32)
    np.testing.assert_allclose(np.asarray(bsr.matvec(x)),
                               np.asarray(A.matvec(x)), rtol=1e-4,
                               atol=1e-5)


def test_rcm_reorder_reduces_blocks(rng):
    """RCM concentrates a shuffled banded pattern back near the diagonal,
    reducing the BSR block count; the permuted matvec is consistent."""
    A = laplacian_2d(16)
    n = 256
    shuffle = np.random.RandomState(0).permutation(n)
    A_shuf, _ = permute(A, shuffle)

    perm = rcm_permutation(A_shuf)
    A_rcm, inv = permute(A_shuf, perm)

    nb_shuf = to_bsr(A_shuf, block_size=32).blocks.shape[0]
    nb_rcm = to_bsr(A_rcm, block_size=32).blocks.shape[0]
    assert nb_rcm < nb_shuf, (nb_rcm, nb_shuf)

    # permuted-space matvec equals original-space matvec, reordered:
    # (P A P^T)(P x) = P (A x)
    x = jnp.asarray(rng.random(n), jnp.float32)
    y_ref = np.asarray(A_shuf.matvec(x), np.float64)
    y_perm = np.asarray(A_rcm.matvec(jnp.asarray(np.asarray(x)[perm])))
    np.testing.assert_allclose(y_perm, y_ref[perm], rtol=1e-4, atol=1e-5)


def test_bsr_max_blocks_guard():
    A = laplacian_2d(10)
    with pytest.raises(ValueError):
        to_bsr(A, block_size=2, max_blocks=3)
