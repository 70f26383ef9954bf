"""Fast-path two-grid composition: Pallas-DIA levels + stream P.

Round-5 additions (models/vcycle.py): `setup_with_dia(..., pallas=True)`
wraps both levels in the fused Pallas DIA kernel and
`setup_with_stream_p` swaps the prolongation for its square-embedded
stream twin (ops/stream_op.py::RectStreamOperator). Measured on chip:
115.6 -> 9.1 ms/cycle at 1M rows (PERF.md). CI validates numerics via
the Pallas interpreter / the numpy emulate backend.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gnnla_tpu.models.vcycle import (setup_twogrid, setup_with_dia,
                                     setup_with_stream_p, solve)
from gnnla_tpu.problems import laplacian_2d


@pytest.fixture
def _interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    real = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return real(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)


def _solve_norm(setup, b, x0, n_cycles=4):
    return np.asarray(solve(setup, b, x0, n_cycles=n_cycles))


def test_pallas_dia_cycle_matches_xla_dia(_interpret_mode):
    A = laplacian_2d(24).eliminate_zeros()
    setup = setup_twogrid(A, theta=0.25, splitting="cljp", seed=0)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(A.n_rows), jnp.float32)
    x0 = jnp.zeros(A.n_rows, jnp.float32)
    want = _solve_norm(setup_with_dia(setup), b, x0)
    got = _solve_norm(setup_with_dia(setup, pallas=True), b, x0)
    np.testing.assert_allclose(got, want, rtol=1e-5,
                               atol=1e-5 * np.abs(want).max())


def test_pallas_dia_operator_wide_k_falls_back():
    """An operator too wide for VMEM keeps the XLA shift path instead of
    failing (fit_dia_tile raises, setup_with_dia catches)."""
    from gnnla_tpu.ops.dia import DIAOperator
    from gnnla_tpu.ops.pallas_spmv import fit_dia_tile

    n = 4096
    k = 4000  # k * 1024 * 4 * 2 alone exceeds any VMEM budget
    dia = DIAOperator(diags=jnp.ones((k, n), jnp.float32),
                      offsets=tuple(range(-(k // 2), k - k // 2)),
                      n=n, nnz=k * n)
    with pytest.raises(ValueError, match="too wide"):
        fit_dia_tile(dia, vmem_budget=1 << 20)


def test_stream_p_cycle_matches_coo(_interpret_mode):
    """setup_with_stream_p (emulate backend) reproduces the COO cycle."""
    A = laplacian_2d(24).eliminate_zeros()
    setup = setup_twogrid(A, theta=0.25, splitting="cljp", seed=0)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(A.n_rows), jnp.float32)
    x0 = jnp.zeros(A.n_rows, jnp.float32)
    sp_ = setup_with_stream_p(setup, backend="emulate")
    from gnnla_tpu.ops.stream_op import RectStreamOperator
    if not isinstance(sp_.P, RectStreamOperator):
        pytest.skip("pattern below stream tile granularity on this size")
    want = _solve_norm(setup, b, x0)
    got = _solve_norm(sp_, b, x0)
    np.testing.assert_allclose(got, want, rtol=2e-5,
                               atol=2e-5 * np.abs(want).max())


def test_rect_stream_operator_matvec_rmatvec():
    """Square-embedded P: matvec/rmatvec == scipy on the real pattern."""
    from gnnla_tpu.ops.stream_op import RectStreamOperator

    A = laplacian_2d(40).eliminate_zeros()
    setup = setup_twogrid(A, theta=0.25, splitting="cljp", seed=0)
    sp_ = setup_with_stream_p(setup, backend="emulate")
    if not isinstance(sp_.P, RectStreamOperator):
        pytest.skip("pattern below stream tile granularity on this size")
    P = setup.P.to_scipy().tocsr()
    n, nc = P.shape
    rng = np.random.default_rng(2)
    x = rng.standard_normal(nc).astype(np.float32)
    y = rng.standard_normal(n).astype(np.float32)
    got_mv = np.asarray(sp_.P.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(got_mv, P @ x, rtol=1e-5, atol=1e-5)
    got_rmv = np.asarray(sp_.P.rmatvec(jnp.asarray(y)))
    np.testing.assert_allclose(got_rmv, P.T @ y, rtol=1e-5, atol=1e-5)
    assert sp_.P.shape == (n, nc)
