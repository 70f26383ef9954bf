"""Stream SpMV (general unstructured graphs): layout, operator protocol,
solver-composition parity, and gradients.

CI coverage layers: (1) the host-side packing against a numpy emulator
with identical semantics plus structural invariants; (2) the REAL Pallas
kernel in interpreter mode (slow — one small case); (3) `StreamOperator`
parity with the COO path through jacobi/chebyshev/power-method/vcycle via
the scan-safe emulate backend. On-chip numerics + throughput run in
`python bench.py` (the `general_graph` stanza) on real TPU hardware.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from gnnla_tpu.ops.pallas_stream import (NSUB, TILE, build_stream,
                                         emulate_stream, rcm_csr)


def _random_csr(rng, n, max_deg=12, extra_heavy_row=True):
    deg = rng.integers(1, max_deg + 1, n)
    rows = np.repeat(np.arange(n), deg)
    cols = rng.integers(0, n, rows.size)
    if extra_heavy_row:
        rows = np.concatenate([rows, np.full(60, 7)])
        cols = np.concatenate([cols, rng.integers(0, 900, 60)])
    vals = rng.standard_normal(rows.size).astype(np.float32)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    A.sum_duplicates()
    A.sort_indices()
    return A


@pytest.mark.parametrize("kb", [0, 1, 2, 3, None])
def test_stream_emulator_matches_scipy(rng, kb):
    A = _random_csr(rng, 5000)
    fmt = build_stream(A, kb=kb)
    x = rng.standard_normal(5000).astype(np.float32)
    y = emulate_stream(fmt, x)
    expect = A @ x
    np.testing.assert_allclose(y, expect, rtol=2e-5,
                               atol=2e-5 * np.abs(expect).max())


def test_stream_delaunay_with_rcm(rng):
    from scipy.spatial import Delaunay
    n = 12000
    pts = rng.random((n, 2))
    tri = Delaunay(pts)
    s = tri.simplices
    e = np.concatenate([s[:, [0, 1]], s[:, [1, 2]], s[:, [2, 0]]])
    A = sp.coo_matrix((np.ones(e.shape[0], np.float32), (e[:, 0], e[:, 1])),
                      shape=(n, n)).tocsr()
    A = A + A.T
    A.data[:] = -1.0
    lap = (sp.diags(np.asarray(-A.sum(axis=1)).ravel()) + A).tocsr()
    B, perm = rcm_csr(lap.astype(np.float32))
    fmt = build_stream(B)
    x = rng.standard_normal(n).astype(np.float32)
    np.testing.assert_allclose(emulate_stream(fmt, x), B @ x,
                               rtol=1e-4, atol=1e-4)
    # RCM keeps the window bounded well below the full vector
    assert fmt.w_sc * TILE < n


def test_stream_invariants(rng):
    A = _random_csr(rng, 4096, max_deg=9, extra_heavy_row=False)
    fmt = build_stream(A)
    nb = fmt.nb
    # shapes agree
    assert fmt.word.shape == (fmt.n_units, NSUB, 128)
    assert fmt.n_units == fmt.n_steps * nb
    # every tile owns >= nb units and they are contiguous
    tiles = fmt.tile_of_unit
    assert (np.diff(tiles) >= 0).all()
    _, counts = np.unique(tiles, return_counts=True)
    assert (counts >= nb).min()
    # at most one tile start and one completion per grid step
    firsts = np.flatnonzero(np.concatenate([[1], np.diff(tiles)]) != 0)
    lasts = np.flatnonzero(
        np.concatenate([np.diff(tiles), [1]]) != 0)
    assert np.unique(firsts // nb).size == firsts.size
    assert np.unique(lasts // nb).size == lasts.size
    assert fmt.step_meta[:, 0, 0].sum() == fmt.n_tiles
    assert fmt.step_meta[:, 0, 4].sum() == fmt.n_tiles
    # out_idx covers every tile, non-decreasing
    assert (np.diff(fmt.out_idx) >= 0).all()
    assert np.unique(fmt.out_idx).size == fmt.n_tiles
    # packed word fields in range (cls in bits 26+, dep lane+1 <= 128)
    assert int(fmt.word.max()) < (1 << 29)
    dep1 = (fmt.word >> 10) & 255
    assert int(dep1.max()) <= 128
    # total real value mass preserved
    np.testing.assert_allclose(fmt.vals.sum(), A.data.sum(), rtol=1e-3)


# ---------------------------------------------------------------- operator

def _delaunay_laplacian(rng, n):
    from scipy.spatial import Delaunay
    pts = rng.random((n, 2))
    tri = Delaunay(pts)
    s = tri.simplices
    e = np.concatenate([s[:, [0, 1]], s[:, [1, 2]], s[:, [2, 0]]])
    A = sp.coo_matrix((np.ones(e.shape[0], np.float32),
                       (e[:, 0], e[:, 1])), shape=(n, n)).tocsr()
    A = A + A.T
    A.data[:] = -1.0
    lap = (sp.diags(np.asarray(-A.sum(axis=1)).ravel()) + A).tocsr()
    lap.sort_indices()
    return lap.astype(np.float32)


@pytest.fixture(scope="module")
def delaunay_ops():
    """(SparseOperator, StreamOperator[emulate]) on a Delaunay Laplacian."""
    from gnnla_tpu import SparseOperator
    from gnnla_tpu.ops.stream_op import stream_operator
    rng = np.random.default_rng(24601)
    lap = _delaunay_laplacian(rng, 4000)
    op = SparseOperator.from_scipy(lap / 8.0)
    s_op = stream_operator(op, backend="emulate")
    return op, s_op


def test_stream_operator_matvec_parity(rng, delaunay_ops):
    op, s_op = delaunay_ops
    x = np.asarray(rng.standard_normal(op.n_rows), np.float32)
    import jax.numpy as jnp
    want = np.asarray(op.matvec(jnp.asarray(x)))
    got = np.asarray(s_op.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4,
                               atol=1e-5 * np.abs(want).max())


def test_stream_operator_rmatvec_parity(rng, delaunay_ops):
    op, s_op = delaunay_ops
    y = np.asarray(rng.standard_normal(op.n_rows), np.float32)
    import jax.numpy as jnp
    want = np.asarray(op.rmatvec(jnp.asarray(y)))
    got = np.asarray(s_op.rmatvec(jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-4,
                               atol=1e-5 * np.abs(want).max())


def test_stream_solvers_parity(rng, delaunay_ops):
    """jacobi / chebyshev / power_method run unchanged on the stream
    operator (scan-safe pure_callback backend) and match the COO path —
    the composition reach of the reference's shared scatter kernel."""
    import jax.numpy as jnp
    from gnnla_tpu.models import chebyshev, jacobi, power_method
    op, s_op = delaunay_ops
    n = op.n_rows
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal(n), jnp.float32)

    want = jacobi(op, b, x0, omega=0.7, n_iters=3)
    got = jacobi(s_op, b, x0, omega=0.7, n_iters=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    want = chebyshev(op, b, x0, c=-3.4, d=-4.0, deg=3)
    got = chebyshev(s_op, b, x0, c=-3.4, d=-4.0, deg=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)

    lam_w, _ = power_method(op, b, n_iters=5)
    lam_g, _ = power_method(s_op, b, n_iters=5)
    np.testing.assert_allclose(float(lam_g), float(lam_w), rtol=1e-4)


def test_stream_vcycle_parity(rng, delaunay_ops):
    """Two chained two-grid cycles through setup_with_stream match the COO
    setup on an unstructured (Delaunay) Laplacian."""
    import dataclasses

    import jax.numpy as jnp
    from gnnla_tpu.models import setup_twogrid, vcycle
    from gnnla_tpu.models.vcycle import setup_with_stream
    op, s_op = delaunay_ops
    setup = setup_twogrid(op, theta=0.25, splitting="pmis", seed=0)
    # reuse the module-scoped emulate operator (same matrix) to avoid a
    # second stream build; equivalent to setup_with_stream(setup,
    # backend="emulate")
    setup_s = dataclasses.replace(setup, A=s_op)
    n = op.n_rows
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    x0 = jnp.zeros(n, jnp.float32)
    want, got = x0, x0
    for _ in range(2):
        want = vcycle(setup, b, want, n_pre=2, n_post=2, coarse_deg=3)
        got = vcycle(setup_s, b, got, n_pre=2, n_post=2, coarse_deg=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-4)
    # and setup_with_stream itself wires the same thing
    setup_s2 = setup_with_stream(setup, backend="emulate")
    got2 = vcycle(setup_s2, b, x0, n_pre=2, n_post=2, coarse_deg=3)
    want2 = vcycle(setup, b, x0, n_pre=2, n_post=2, coarse_deg=3)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=1e-3, atol=1e-4)


def test_stream_vals_grad(rng, delaunay_ops):
    """Operator-value cotangent through apply: d vals[slot] =
    ybar[row] * x[col] — checked against a directional finite difference."""
    import jax
    import jax.numpy as jnp
    _, s_op = delaunay_ops
    n = s_op.n_rows
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    w = jnp.asarray(rng.standard_normal(n), jnp.float32)
    x3 = s_op.to_padded(x[s_op.perm] if s_op.perm is not None else x)
    w3 = s_op.to_padded(w[s_op.perm] if s_op.perm is not None else w)
    fwd_args, bwd_args = s_op.op_args

    def loss(vals_slot):
        return jnp.vdot(w3, s_op.apply_fn((fwd_args[:5] + (vals_slot,),
                                           bwd_args), x3))

    g = jax.grad(loss)(fwd_args[5])
    dv = jnp.asarray(rng.standard_normal(fwd_args[5].shape), jnp.float32)
    eps = 1e-3
    fd = (float(loss(fwd_args[5] + eps * dv))
          - float(loss(fwd_args[5] - eps * dv))) / (2 * eps)
    an = float(jnp.vdot(g, dv))
    assert abs(fd - an) <= 2e-3 * max(abs(fd), 1.0)


def test_stream_kernel_interpret(rng):
    """The REAL Pallas kernel (DMA windows, one-hot routing, segmented
    scan) in interpreter mode on a small unstructured matrix: matvec and
    the x-cotangent VJP."""
    import jax
    import jax.numpy as jnp
    from gnnla_tpu.ops.pallas_stream import StreamSpMV, rcm_csr
    A = _random_csr(rng, 2048, max_deg=6, extra_heavy_row=False)
    B, _ = rcm_csr(A)
    mv = StreamSpMV(B, interpret=True)
    x = rng.standard_normal(2048).astype(np.float32)
    y = np.asarray(mv.matvec(jnp.asarray(x)))
    want = B @ x
    np.testing.assert_allclose(y, want, rtol=1e-4,
                               atol=1e-5 * np.abs(want).max())
    w = rng.standard_normal(2048).astype(np.float32)
    w3 = mv.to_padded(jnp.asarray(w))

    def f(x3):
        return jnp.vdot(w3, mv.apply(mv.op_args, x3))

    g = np.asarray(jax.grad(f)(mv.to_padded(jnp.asarray(x))))
    g = g.reshape(-1)[:2048]
    want_g = B.T @ w
    np.testing.assert_allclose(g, want_g, rtol=1e-4,
                               atol=1e-5 * np.abs(want_g).max())
