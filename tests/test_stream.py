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


# ------------------------------------------------------------------- SpMM

def test_stream_spmm_emulate_matches_scipy(rng):
    """Multi-RHS pack semantics: per-column parity with scipy A @ X."""
    from gnnla_tpu.ops.pallas_stream import StreamSpMM, rcm_csr
    A = _random_csr(rng, 3000, max_deg=8)
    B, _ = rcm_csr(A)
    M = 4
    mm = StreamSpMM(B, M, backend="emulate")
    X = rng.standard_normal((3000, M)).astype(np.float32)
    Y = np.asarray(mm.matmat(X))
    want = B @ X
    np.testing.assert_allclose(Y, want, rtol=2e-5,
                               atol=2e-5 * np.abs(want).max())


def test_stream_spmm_interpret_and_grads(rng):
    """The REAL multi-RHS Pallas kernel (shared metadata decode, wide
    one-hot routing matmul) in interpreter mode: matmat parity, chained
    applies via the out->in relayout, the x cotangent (A^T Ybar per
    column), and the summed-over-columns vals cotangent."""
    import jax
    import jax.numpy as jnp
    from gnnla_tpu.ops.pallas_stream import (StreamSpMM, StreamSpMV,
                                             mrhs_out_to_in, rcm_csr)
    A = _random_csr(rng, 2048, max_deg=6, extra_heavy_row=False)
    B, _ = rcm_csr(A)
    M = 3
    mm = StreamSpMM(B, M, interpret=True)
    X = rng.standard_normal((2048, M)).astype(np.float32)
    Y = np.asarray(mm.matmat(X))
    want = B @ X
    np.testing.assert_allclose(Y, want, rtol=1e-4,
                               atol=1e-5 * np.abs(want).max())

    # the SpMM shares pack layout with the vector kernel: same fmt fields
    mv = StreamSpMV(B, with_transpose=False)
    assert mv.fmt.n_steps == mm.fmt.n_steps
    assert mv.fmt.w_sc == mm.fmt.w_sc

    # chained apply through the relayout (the Gelfand iteration pattern)
    Bs = (B * 0.1).tocsr()
    mm2 = StreamSpMM(Bs, M, interpret=True)
    x4 = mm2.to_padded(X)
    y4 = mm2.apply(mm2.op_args, x4)
    y4 = mm2.apply(mm2.op_args, mrhs_out_to_in(y4))
    from gnnla_tpu.ops.pallas_stream import mrhs_split_out
    got2 = np.asarray(mrhs_split_out(y4, 2048))
    np.testing.assert_allclose(got2, Bs @ (Bs @ X), rtol=1e-4, atol=1e-5)

    # x cotangent: d/dX <W, A X> = A^T W, column-wise
    W = rng.standard_normal((2048, M)).astype(np.float32)
    w4out = jnp.asarray(np.zeros((mm.fmt.n_tiles, 8, 128 * M), np.float32))
    # place W into the OUTPUT layout to form the scalar product
    wq = np.zeros((mm.fmt.n_tiles * 1024, M), np.float32)
    wq[:2048] = W
    w4out = jnp.asarray(
        wq.reshape(mm.fmt.n_tiles, 8, 128, M).transpose(0, 1, 3, 2)
          .reshape(mm.fmt.n_tiles, 8, 128 * M))

    def f(x4):
        return jnp.vdot(w4out, mm.apply(mm.op_args, x4))

    g4 = jax.grad(f)(mm.to_padded(jnp.asarray(X)))
    # back to caller layout: column m is sublane block m
    t = g4.shape[0]
    g = np.asarray(g4).reshape(t, M, 8, 128).transpose(0, 2, 3, 1) \
        .reshape(t * 1024, M)[:2048]
    want_g = B.T @ W
    np.testing.assert_allclose(g, want_g, rtol=1e-4,
                               atol=1e-5 * np.abs(want_g).max())


def test_stream_spmm_vals_grad(rng):
    """vals cotangent = sum_m ybar_m[row] x_m[col]: directional finite
    difference through the emulate backend."""
    import jax
    import jax.numpy as jnp
    from gnnla_tpu.ops.pallas_stream import StreamSpMM, rcm_csr
    A = _random_csr(rng, 1500, max_deg=6, extra_heavy_row=False)
    B, _ = rcm_csr(A)
    M = 2
    mm = StreamSpMM(B, M, backend="emulate")
    X = rng.standard_normal((1500, M)).astype(np.float32)
    x4 = mm.to_padded(X)
    W = rng.standard_normal((mm.fmt.n_tiles, 8, 128 * M)).astype(np.float32)
    w4 = jnp.asarray(W)
    fwd_args, bwd_args = mm.op_args

    def loss(vals_slot):
        return jnp.vdot(w4, mm.apply((fwd_args[:5] + (vals_slot,),
                                      bwd_args), x4))

    g = jax.grad(loss)(fwd_args[5])
    dv = jnp.asarray(rng.standard_normal(fwd_args[5].shape), jnp.float32)
    eps = 1e-3
    fd = (float(loss(fwd_args[5] + eps * dv))
          - float(loss(fwd_args[5] - eps * dv))) / (2 * eps)
    an = float(jnp.vdot(g, dv))
    assert abs(fd - an) <= 2e-3 * max(abs(fd), 1.0)


def test_stream_spmm_spectral_loss(rng, delaunay_ops):
    """The Gelfand damping-factor loss through the multi-RHS stream kernel
    matches the COO-path loss AND its gradient w.r.t. the trainable
    diagonal — then a few gradient steps actually reduce it (the
    trainable-Jacobi training flow on an unstructured operator,
    reference TrainableJacobiDiag/loss.py:105-128 + train.py:99-128)."""
    import jax
    import jax.numpy as jnp
    from gnnla_tpu.ops.pallas_stream import StreamSpMM, rcm_csr
    from gnnla_tpu.training.spectral_loss import (
        damping_factor_gelfand, damping_factor_gelfand_spmm, uniform_probes)

    op, _ = delaunay_ops
    n = op.n_rows
    A = op.to_scipy().tocsr()
    A.sort_indices()
    B, perm = rcm_csr(A)
    mm = StreamSpMM(B, 4, backend="emulate")
    iperm = jnp.asarray(np.argsort(perm), jnp.int32)
    pj = jnp.asarray(perm, jnp.int32)

    probes = uniform_probes(n, 4, rng).astype(np.float32)
    probes4 = mm.to_padded(jnp.asarray(probes)[pj])
    diag0 = np.asarray(op.host_diagonal(), np.float32)
    omega = 2.0 / 3.0

    t = mm.fmt.n_tiles
    pad = t * 1024 - n

    def diag3_of(dvals):
        dk = dvals[pj]
        return jnp.pad(dk, (0, pad), constant_values=1.0) \
                  .reshape(t, 8, 128)

    def loss_spmm(dvals):
        return damping_factor_gelfand_spmm(
            mm.apply, mm.op_args, diag3_of(dvals), omega, probes4, k=3)

    def loss_coo(dvals):
        return damping_factor_gelfand(op, dvals, omega,
                                      jnp.asarray(probes), k=3)

    d0 = jnp.asarray(diag0)
    l_s, l_c = float(loss_spmm(d0)), float(loss_coo(d0))
    np.testing.assert_allclose(l_s, l_c, rtol=1e-4)

    g_s = np.asarray(jax.grad(loss_spmm)(d0))
    g_c = np.asarray(jax.grad(loss_coo)(d0))
    np.testing.assert_allclose(g_s, g_c, rtol=1e-3,
                               atol=1e-5 * np.abs(g_c).max())

    # a few plain gradient steps reduce the damping factor
    d = d0
    jloss = jax.jit(jax.value_and_grad(loss_spmm))
    losses = []
    for _ in range(4):
        l, g = jloss(d)
        losses.append(float(l))
        d = d - 0.5 * g
    assert losses[-1] < losses[0], losses


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
