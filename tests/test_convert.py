"""L1 conversion-layer oracle tests (reference UtilsGNN.py:53-78,
TrainableJacobiDiag/Data.py:216-251, DiffCoeffs/data.py:102-127)."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from gnnla_tpu.core import (as_operator, coo_to_gnn_input, graph_to_matrix,
                            matrix_to_graph, remove_diag_entries)
from gnnla_tpu.problems import grid_coords_2d, laplacian_2d


def _dense(op):
    return np.asarray(op.to_dense(), dtype=np.float64)


def test_coo_to_gnn_input_roundtrip(rng):
    A = sp.random(12, 12, density=0.3, random_state=np.random.RandomState(0),
                  format="coo")
    A = (A + sp.eye(12)).tocoo()
    edgeij, e_attr = coo_to_gnn_input(A)
    dense = np.zeros((12, 12))
    dense[np.asarray(edgeij[0]), np.asarray(edgeij[1])] = \
        np.asarray(e_attr)[:, 0]
    np.testing.assert_allclose(dense, A.toarray(), rtol=1e-6, atol=1e-6)
    # row-sorted invariant
    assert np.all(np.diff(np.asarray(edgeij[0])) >= 0)


def test_remove_diag_entries():
    A = laplacian_2d(4)
    edgeij, e_attr = coo_to_gnn_input(A)
    ij2, e2 = remove_diag_entries(edgeij, e_attr)
    assert np.all(np.asarray(ij2[0]) != np.asarray(ij2[1]))
    assert ij2.shape[1] == edgeij.shape[1] - 16


def test_matrix_to_graph_split_and_inverse():
    A = laplacian_2d(5)
    v_attr, edgeij, e_attr, op_nd = matrix_to_graph(A)
    np.testing.assert_allclose(np.asarray(v_attr)[:, 0], -4.0)
    assert np.all(np.asarray(edgeij[0]) != np.asarray(edgeij[1]))
    back = graph_to_matrix(v_attr[:, 0], op_nd, e_attr[:, 0])
    np.testing.assert_allclose(_dense(back), _dense(A), rtol=1e-6, atol=1e-6)


def test_matrix_to_graph_with_coords():
    A = laplacian_2d(4)
    xy = grid_coords_2d(4)
    v_attr, edgeij, e_attr, op_nd = matrix_to_graph(A, coords=xy)
    assert e_attr.shape[1] == 3
    rel = np.asarray(e_attr)[:, 1:]
    r, c, _ = op_nd.host_coo()
    np.testing.assert_allclose(rel, np.asarray(xy)[c] - np.asarray(xy)[r],
                               rtol=1e-6, atol=1e-6)


def test_as_operator_accepts_dense_and_scipy():
    D = np.array([[2.0, -1.0], [-1.0, 2.0]])
    for src in (D, sp.csr_matrix(D)):
        op = as_operator(src)
        np.testing.assert_allclose(_dense(op), D, rtol=1e-6)


def test_scale_and_with_values_preserve_host_cache():
    """Host-phase ops after scale()/with_values(numpy) must not need a
    device pull (critical on tunneled TPU backends where the first
    device->host transfer costs minutes — see bench.py)."""
    A = laplacian_2d(4)
    B = A.scale(0.5)
    assert getattr(B, "_host_coo", None) is not None
    _, _, v0 = A.host_coo()
    _, _, v = B.host_coo()
    np.testing.assert_allclose(v, v0 * 0.5)

    C = A.with_values(v0 * 2.0)
    assert getattr(C, "_host_coo", None) is not None
    np.testing.assert_allclose(C.host_coo()[2], v0 * 2.0)
