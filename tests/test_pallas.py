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
