"""Pallas DIA SpMV kernel — interpreter-mode parity on CPU.

Real-TPU execution is covered by bench.py; these tests run the same kernel
through the Pallas interpreter so CI (CPU) validates indexing/halo logic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnla_tpu.ops.dia import to_dia
from gnnla_tpu.problems import laplacian_2d


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp)
    yield


def test_pallas_dia_matches(rng):
    from gnnla_tpu.ops.pallas_spmv import make_dia_spmv
    A = laplacian_2d(64).eliminate_zeros()   # 4096 rows
    dia = to_dia(A)
    mv = make_dia_spmv(dia, tile=2048)
    x = jnp.asarray(rng.random(4096), jnp.float32)
    np.testing.assert_allclose(mv(x), A.matvec(x), rtol=1e-5, atol=1e-5)


def test_pallas_dia_nonmultiple_size(rng):
    from gnnla_tpu.ops.pallas_spmv import make_dia_spmv
    A = laplacian_2d(50).eliminate_zeros()   # 2500 rows, not tile-aligned
    dia = to_dia(A)
    mv = make_dia_spmv(dia, tile=1024)
    x = jnp.asarray(rng.random(2500), jnp.float32)
    np.testing.assert_allclose(mv(x), A.matvec(x), rtol=1e-5, atol=1e-5)


def test_pallas_dia_grad_is_transpose_spmv(rng):
    """d/dx sum(w * (A @ x)) = A^T w — the custom VJP (interpreter mode)."""
    from gnnla_tpu.ops.pallas_spmv import make_dia_spmv_padded
    from gnnla_tpu.problems import fem_heateqn
    # non-symmetric banded operator: stretched FEM + an asymmetric bump
    A = laplacian_2d(16).eliminate_zeros()
    r, c, v = A.host_coo()
    v = v.copy()
    v[c > r] *= 1.5   # break symmetry, keep the band structure
    from gnnla_tpu import SparseOperator
    A = SparseOperator.from_coo(r, c, v, A.shape, coalesce=False)
    dia = to_dia(A)
    pmv = make_dia_spmv_padded(dia, tile=1024)

    x = jnp.asarray(rng.random(256), jnp.float32)
    w = jnp.asarray(rng.random(256), jnp.float32)

    def f(x_pad):
        y = pmv.apply(pmv.op_args, x_pad)
        return jnp.vdot(pmv.from_padded(y), w)

    g = jax.grad(f)(pmv.to_padded(x))
    g_ref = A.to_scipy().T @ np.asarray(w, np.float64)
    np.testing.assert_allclose(np.asarray(pmv.from_padded(g)), g_ref,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n_steps", [1, 2, 5])
def test_stencil_resident_multistep(rng, n_steps):
    """VMEM-resident roll stencil == n single matvecs (interpreter)."""
    from gnnla_tpu.ops.pallas_stencil import make_stencil_spmv
    A = laplacian_2d(20).eliminate_zeros().scale(1.0 / 8.0)  # 400 rows
    st = make_stencil_spmv(A, (20, 20), n_steps)
    assert len(st.shifts) == 5  # 5-point stencil -> 5 tap planes
    x = jnp.asarray(rng.random(400), jnp.float32)
    y = st.matvec_n(x)
    want = x
    for _ in range(n_steps):
        want = A.matvec(want)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_stencil_periodic_wrap(rng):
    """Periodic diffusion FEM: the roll wrap IS the periodic neighbor.
    9-point periodic stencil collapses to 9 shift classes (DIA needs 21
    offsets); wrap edges join their interior siblings' class."""
    from gnnla_tpu.ops.pallas_stencil import make_stencil_spmv, stencil_taps
    from gnnla_tpu.problems.diffusion_fem import constant_diffusion_matrix
    A = constant_diffusion_matrix(1.3, 0.7, 8)
    shifts, planes = stencil_taps(A, (8, 8))
    assert len(shifts) == 9
    st = make_stencil_spmv(A, (8, 8), n_steps=3)
    x = jnp.asarray(rng.random(64), jnp.float32)
    want = A.matvec(A.matvec(A.matvec(x)))
    np.testing.assert_allclose(np.asarray(st.matvec_n(x)),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


def test_stencil_rejects_too_many_classes(rng):
    """A scrambled (non-stencil) pattern must be refused, not mis-built."""
    from gnnla_tpu import SparseOperator
    from gnnla_tpu.ops.pallas_stencil import MAX_TAPS, stencil_taps
    n = 32 * 32
    r = np.arange(n, dtype=np.int32)
    c = rng.permutation(n).astype(np.int32)
    A = SparseOperator.from_coo(r, c, np.ones(n, np.float32), (n, n))
    with pytest.raises(ValueError, match="shift classes"):
        stencil_taps(A, (32, 32))
    assert MAX_TAPS < 1024


def test_stencil_jacobi_matches_model(rng):
    """Fused VMEM-resident Jacobi == models.jacobi sweeps (interpreter)."""
    from gnnla_tpu.models import jacobi
    from gnnla_tpu.ops.pallas_stencil import make_stencil_jacobi
    A = laplacian_2d(12)
    b = jnp.asarray(rng.random(144), jnp.float32)
    x0 = jnp.asarray(rng.random(144), jnp.float32)
    sj = make_stencil_jacobi(A, (12, 12), omega=0.7, n_iters=4)
    want = jacobi(A, b, x0, omega=0.7, n_iters=4)
    np.testing.assert_allclose(np.asarray(sj.smooth(b, x0)),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


def test_stencil_jacobi_trained_diag(rng):
    """diag= override (trained-Jacobi integration) changes the sweep."""
    from gnnla_tpu.models import jacobi
    from gnnla_tpu.ops.pallas_stencil import make_stencil_jacobi
    A = laplacian_2d(8)
    d = jnp.asarray(1.0 + rng.random(64), jnp.float32) * -4.0
    b = jnp.asarray(rng.random(64), jnp.float32)
    x0 = jnp.zeros(64, jnp.float32)
    sj = make_stencil_jacobi(A, (8, 8), omega=0.7, n_iters=3, diag=d)
    want = jacobi(A, b, x0, omega=0.7, n_iters=3, diag=d)
    np.testing.assert_allclose(np.asarray(sj.smooth(b, x0)),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


def test_stencil_power_matches(rng):
    """Fused normalized power iteration == models.power_method."""
    from gnnla_tpu.models import power_method
    from gnnla_tpu.ops.pallas_stencil import make_stencil_power
    A = laplacian_2d(10)
    b0 = jnp.asarray(rng.random(100), jnp.float32)
    sp = make_stencil_power(A, (10, 10), n_iters=15)
    lam, b = sp.run(b0)
    lam_ref, b_ref = power_method(A, b0, n_iters=15)
    np.testing.assert_allclose(float(lam), float(lam_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(b), np.asarray(b_ref),
                               rtol=1e-4, atol=1e-5)


def test_stencil_vmem_guard():
    """Oversized operators must refuse the resident path, not OOM."""
    from gnnla_tpu.ops.pallas_stencil import make_stencil_spmv
    from gnnla_tpu.problems import laplacian_2d as lap

    class FakeBig:
        shape = (8192 * 8192, 8192 * 8192)
        nnz = 5
        import numpy as _np
        vals = _np.zeros(1, _np.float32)

        def host_coo(self):
            z = np.zeros(1, np.int64)
            return z, z, np.ones(1, np.float64)

    import gnnla_tpu.ops.pallas_stencil as ps
    with pytest.raises(ValueError, match="VMEM"):
        ps.PallasStencilSpMV(FakeBig(), (8192, 8192))


def test_pallas_bf16_diag_storage(rng):
    """bf16 diagonal storage with f32 accumulate: exact for integer-valued
    stencils (the Laplacian), close otherwise."""
    from gnnla_tpu.ops.pallas_spmv import make_dia_spmv_padded
    A = laplacian_2d(16).eliminate_zeros()
    dia = to_dia(A)
    pmv16 = make_dia_spmv_padded(dia, tile=1024, diag_dtype=jnp.bfloat16)
    x = jnp.asarray(rng.random(256), jnp.float32)
    np.testing.assert_allclose(np.asarray(pmv16.matvec(x)),
                               np.asarray(A.matvec(x)), rtol=1e-6,
                               atol=1e-6)

def test_stencil_residual_matches(rng):
    """Fused r = b - A x == models.residual."""
    from gnnla_tpu.models import residual
    from gnnla_tpu.ops.pallas_stencil import make_stencil_residual
    A = laplacian_2d(12)
    b = jnp.asarray(rng.random(144), jnp.float32)
    x = jnp.asarray(rng.random(144), jnp.float32)
    sr = make_stencil_residual(A, (12, 12))
    np.testing.assert_allclose(np.asarray(sr.residual(b, x)),
                               np.asarray(residual(A, b, x)),
                               rtol=1e-5, atol=1e-5)


def test_stencil_vcycle_matches_generic(rng):
    """StencilVCycle == vcycle(setup, ...) with the same parameters."""
    from gnnla_tpu.models import setup_twogrid, vcycle, make_stencil_vcycle
    A = laplacian_2d(16)
    tg = setup_twogrid(A)
    b = jnp.asarray(rng.random(256), jnp.float32)
    x = jnp.zeros(256, jnp.float32)
    sv = make_stencil_vcycle(tg, (16, 16), n_pre=2, n_post=3, omega=0.7)
    want = x
    got = x
    for _ in range(2):
        want = vcycle(tg, b, want, n_pre=2, n_post=3, omega=0.7)
        got = sv.run(b, got)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_stencil_vcycle_rejects_dia_setup():
    from gnnla_tpu.models import (setup_twogrid, setup_with_dia,
                                  make_stencil_vcycle)
    tg = setup_with_dia(setup_twogrid(laplacian_2d(8)))
    with pytest.raises(ValueError, match="COO setup"):
        make_stencil_vcycle(tg, (8, 8))


def test_geometric_vcycle_matches_generic(rng):
    """All-stencil semi-coarsened cycle == generic vcycle on the same
    (alternating-splitting) setup, 5-pt Laplacian."""
    from gnnla_tpu.models import (setup_twogrid, vcycle,
                                  make_geometric_vcycle)
    A = laplacian_2d(16)
    tg = setup_twogrid(A, splitting="alternating")
    gv = make_geometric_vcycle(A, (16, 16), setup=tg, n_pre=2, n_post=3)
    b = jnp.asarray(rng.random(256), jnp.float32)
    want = got = jnp.zeros(256, jnp.float32)
    for _ in range(2):
        want = vcycle(tg, b, want, n_pre=2, n_post=3)
        got = gv.run(b, got)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_geometric_vcycle_9pt_fem(rng):
    """Same parity on the 9-point stretched FEM operator."""
    from gnnla_tpu.models import (setup_twogrid, vcycle,
                                  make_geometric_vcycle)
    from gnnla_tpu.problems import stretched_mesh_matrix
    A = stretched_mesh_matrix(13, stretch=3.0)
    n = A.shape[0]
    h = int(np.sqrt(n))
    assert h * h == n
    tg = setup_twogrid(A, splitting="alternating")
    gv = make_geometric_vcycle(A, (h, h), setup=tg)
    b = jnp.asarray(rng.random(n), jnp.float32)
    want = got = jnp.zeros(n, jnp.float32)
    for _ in range(2):
        want = vcycle(tg, b, want)
        got = gv.run(b, got)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_geometric_vcycle_converges(rng):
    """Residual decreases monotonically over cycles."""
    from gnnla_tpu.models import residual, make_geometric_vcycle
    A = laplacian_2d(32)
    gv = make_geometric_vcycle(A, (32, 32))
    b = jnp.asarray(rng.random(1024), jnp.float32)
    x = jnp.zeros(1024, jnp.float32)
    rs = [float(jnp.linalg.norm(residual(A, b, x)))]
    for _ in range(4):
        x = gv.run(b, x)
        rs.append(float(jnp.linalg.norm(residual(A, b, x))))
    assert all(b_ < a_ for a_, b_ in zip(rs, rs[1:])), rs


def test_geometric_vcycle_rejects_odd_width():
    from gnnla_tpu.models import make_geometric_vcycle
    with pytest.raises(ValueError, match="even"):
        make_geometric_vcycle(laplacian_2d(9), (9, 9))


def test_stencil_matvec_jnp_matches_op(rng):
    """jnp-rolls stencil (training twin) == COO matvec, single and multi
    column."""
    import jax.numpy as jnp
    from gnnla_tpu.ops.pallas_stencil import stencil_matvec_jnp, stencil_taps
    A = laplacian_2d(12).eliminate_zeros()
    shifts, planes = stencil_taps(A, (12, 12))
    planes = jnp.asarray(planes, jnp.float32).reshape(-1, 12, 12)
    x = jnp.asarray(rng.random((144, 3)), jnp.float32)
    y = stencil_matvec_jnp(planes, shifts, x.reshape(12, 12, 3))
    np.testing.assert_allclose(y.reshape(144, 3), A.matvec(x),
                               rtol=1e-5, atol=1e-5)


def test_stencil_transpose(rng):
    """Transposed tap planes apply A^T."""
    import jax.numpy as jnp
    from gnnla_tpu.ops.pallas_stencil import (stencil_matvec_jnp,
                                              stencil_taps,
                                              stencil_transpose)
    from gnnla_tpu.problems import heateqn_fem_2d
    A = heateqn_fem_2d((8, 8), (1.0, 3.0)).eliminate_zeros()
    n = A.shape[0]
    import math
    h = w = int(math.isqrt(n))
    shifts, planes = stencil_taps(A, (h, w))
    planes = jnp.asarray(planes, jnp.float32).reshape(-1, h, w)
    shifts_t, planes_t = stencil_transpose(shifts, planes)
    x = jnp.asarray(rng.random(n), jnp.float32)
    yt = stencil_matvec_jnp(planes_t, shifts_t, x.reshape(h, w))
    np.testing.assert_allclose(yt.reshape(-1), A.rmatvec(x),
                               rtol=1e-5, atol=1e-5)


def test_stencil_spmv_custom_vjp(rng):
    """grad through the fused kernel (x only) == grad through COO path."""
    import jax
    import jax.numpy as jnp
    from gnnla_tpu.ops.pallas_stencil import make_stencil_spmv
    A = laplacian_2d(10).eliminate_zeros().scale(1 / 8.0)
    st = make_stencil_spmv(A, (10, 10), n_steps=3)
    x = jnp.asarray(rng.random(100), jnp.float32)

    def loss_pallas(x):
        y = st.apply(st.taps, x.reshape(10, 10))
        return jnp.sum(y ** 2)

    def loss_coo(x):
        y = x
        for _ in range(3):
            y = A.matvec(y)
        return jnp.sum(y ** 2)

    g1 = jax.grad(loss_pallas)(x.reshape(10, 10)).reshape(-1)
    g2 = jax.grad(loss_coo)(x)
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-5)


def test_gelfand_stencil_grad_parity(rng):
    """Stencil-resident Gelfand loss: value AND d-gradient match the COO
    path (VERDICT r1 item 4)."""
    import jax
    import jax.numpy as jnp
    from gnnla_tpu.ops.pallas_stencil import stencil_taps
    from gnnla_tpu.training.spectral_loss import (
        damping_factor_gelfand, damping_factor_gelfand_stencil,
        high_freq_probes)
    A = laplacian_2d(8).eliminate_zeros()
    n = 64
    shifts, planes = stencil_taps(A, (8, 8))
    planes = jnp.asarray(planes, jnp.float32).reshape(-1, 8, 8)
    probes = jnp.asarray(high_freq_probes(n, 6, None, rng), jnp.float32)
    d0 = jnp.asarray(4.0 + rng.random(n), jnp.float32)

    def f_coo(d):
        return damping_factor_gelfand(A, d, 2 / 3, probes, k=3)

    def f_st(d):
        return damping_factor_gelfand_stencil(
            planes, shifts, d.reshape(8, 8), 2 / 3,
            probes.reshape(8, 8, -1), k=3)

    v1, g1 = jax.value_and_grad(f_coo)(d0)
    v2, g2 = jax.value_and_grad(f_st)(d0)
    np.testing.assert_allclose(v1, v2, rtol=1e-5)
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-6)


def test_pallas_dia_vals_grad(rng):
    """Real operator-value gradient through the fused DIA kernel:
    d/d diags[k, i] of w . (A x) == w_pad[i] * x_pad[i + offset_k]."""
    from gnnla_tpu.ops.pallas_spmv import make_dia_spmv_padded
    A = laplacian_2d(16).eliminate_zeros()
    dia = to_dia(A)
    pmv = make_dia_spmv_padded(dia, tile=1024)
    n = 256
    x = jnp.asarray(rng.random(n), jnp.float32)
    w = jnp.asarray(rng.random(n), jnp.float32)
    x_pad = pmv.to_padded(x)
    w_pad = pmv.to_padded(w)

    def loss(diags):
        return jnp.vdot(w_pad, pmv.apply((diags, pmv.diags_t), x_pad))

    g = np.asarray(jax.grad(loss)(pmv.diags))
    wp = np.zeros(pmv.n_pad)
    wp[:n] = np.asarray(w)
    xp = np.zeros(pmv.n_pad + 2 * max(abs(o) for o in dia.offsets) + 1)
    xp[:n] = np.asarray(x)
    expected = np.zeros((len(dia.offsets), pmv.n_pad))
    for k, off in enumerate(dia.offsets):
        for i in range(pmv.n_pad):
            j = i + off
            if 0 <= j < n:
                expected[k, i] = wp[i] * xp[j]
    np.testing.assert_allclose(g, expected, rtol=1e-5, atol=1e-6)


def test_stencil_taps_grad(rng):
    """Real taps gradient through the fused stencil: for y = T^2 x and
    loss w . y, dT = w (Tx)^T + (T^T w) x^T mapped onto the tap planes."""
    from gnnla_tpu.ops.pallas_stencil import make_stencil_spmv
    h = w_ = 12
    A = laplacian_2d(h).eliminate_zeros().scale(1.0 / 8.0)
    st = make_stencil_spmv(A, (h, w_), n_steps=2)
    x = rng.random(h * w_).astype(np.float32)
    wv = rng.random(h * w_).astype(np.float32)
    x2 = jnp.asarray(x).reshape(h, w_)
    w2 = jnp.asarray(wv).reshape(h, w_)

    def loss(taps):
        return jnp.vdot(w2, st.apply(taps, x2))

    g = np.asarray(jax.grad(loss)(st.taps)).reshape(len(st.shifts), -1)
    T = np.asarray(A.to_dense(), np.float64)
    dT = np.outer(wv, T @ x) + np.outer(T.T @ wv, x)
    expected = np.zeros_like(g)
    for k, (dy, dx) in enumerate(st.shifts):
        for p in range(h * w_):
            r, c = divmod(p, w_)
            q = ((r + dy) % h) * w_ + (c + dx) % w_
            expected[k, p] = dT[p, q]
    np.testing.assert_allclose(g, expected, rtol=1e-4, atol=1e-5)
