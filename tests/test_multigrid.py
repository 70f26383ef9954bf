"""Multilevel AMG — the recursive completion of the reference's two-grid
(VCycle.py:175-237)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnla_tpu.models import (jacobi, multigrid_cycle, multigrid_solve,
                              residual, setup_multigrid, setup_twogrid,
                              vcycle)
from gnnla_tpu.problems import laplacian_2d


@pytest.fixture(scope="module")
def A():
    return laplacian_2d(32)  # 1024 vertices -> 3+ levels


def test_hierarchy_depth(A):
    setup = setup_multigrid(A, min_coarse=16)
    assert setup.n_levels >= 3
    sizes = [op.n_rows for op in setup.As]
    assert all(a > b for a, b in zip(sizes, sizes[1:])), sizes
    # hierarchy health checks stop coarsening before interpolation-weight
    # blowup; the coarsest grid is small vs the finest either way
    assert sizes[-1] <= sizes[0] // 4


def test_multilevel_converges_and_beats_smoothing(A, rng):
    b = jnp.asarray(rng.random(1024), jnp.float32)
    x = jnp.zeros(1024, jnp.float32)
    setup = setup_multigrid(A, min_coarse=16)

    norms = [float(jnp.linalg.norm(residual(A, b, x)))]
    for _ in range(5):
        x = multigrid_cycle(setup, b, x, n_pre=2, n_post=2)
        norms.append(float(jnp.linalg.norm(residual(A, b, x))))
    assert all(n2 < n1 for n1, n2 in zip(norms, norms[1:])), norms

    x_jac = jacobi(A, b, jnp.zeros(1024, jnp.float32), omega=0.7,
                   n_iters=20)
    assert norms[-1] < float(jnp.linalg.norm(residual(A, b, x_jac)))


def test_two_level_multigrid_matches_vcycle(rng):
    """A hierarchy truncated to 2 levels reproduces the two-grid cycle."""
    A = laplacian_2d(10)
    b = jnp.asarray(rng.random(100), jnp.float32)
    x0 = jnp.asarray(rng.random(100), jnp.float32)
    # pin the reference-parity setup options (setup_multigrid's own
    # defaults are the robust multilevel ones: pmis/signed/trunc)
    mg = setup_multigrid(A, min_coarse=99, max_levels=2, splitting="cljp",
                         interp="reference", trunc=0.0)
    assert mg.n_levels == 2
    tg = setup_twogrid(A)
    # pin the same Chebyshev interval the two-grid cycle defaults to
    x_mg = multigrid_cycle(mg, b, x0, n_pre=3, n_post=3, coarse_deg=4,
                           coarse_c=-3.4, coarse_d=-4.0)
    x_tg = vcycle(tg, b, x0, n_pre=3, n_post=3, coarse_deg=4)
    np.testing.assert_allclose(np.asarray(x_mg), np.asarray(x_tg),
                               rtol=1e-4, atol=1e-5)


def test_wcycle_and_scan_driver(A, rng):
    b = jnp.asarray(rng.random(1024), jnp.float32)
    x0 = jnp.zeros(1024, jnp.float32)
    setup = setup_multigrid(A, min_coarse=16)

    xw = multigrid_cycle(setup, b, x0, n_pre=2, n_post=2, gamma=2)
    r0 = float(jnp.linalg.norm(b))
    assert float(jnp.linalg.norm(residual(A, b, xw))) < r0

    x_scan = multigrid_solve(setup, b, x0, n_cycles=3, n_pre=2, n_post=2)
    x_loop = x0
    for _ in range(3):
        x_loop = multigrid_cycle(setup, b, x_loop, n_pre=2, n_post=2)
    np.testing.assert_allclose(np.asarray(x_scan), np.asarray(x_loop),
                               rtol=1e-4, atol=1e-5)

    # jittable with the hierarchy as a pytree argument
    f = jax.jit(lambda s, b, x: multigrid_cycle(s, b, x, n_pre=2, n_post=2))
    np.testing.assert_allclose(
        np.asarray(f(setup, b, x0)),
        np.asarray(multigrid_cycle(setup, b, x0, n_pre=2, n_post=2)),
        rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("stretch", [4.0, 7.0])
def test_multilevel_anisotropic_converges(rng, stretch):
    """>= 3-level hierarchies on the stretched heat-equation FEM operator
    (the reference's hard case, matlab/heateqnfem2dfun.m stretch up to 7)
    must converge per cycle — signed interpolation + truncation replace the
    r1 magic-number bailouts (VERDICT r1 item 5)."""
    from gnnla_tpu.problems import heateqn_fem_2d

    A = heateqn_fem_2d((32, 32), (1.0, stretch), bcs=(2, 2))
    A = A.eliminate_zeros()
    n = A.shape[0]
    b = jnp.asarray(rng.random(n), jnp.float32)
    x = jnp.zeros(n, jnp.float32)
    ml = setup_multigrid(A, theta=0.25)
    assert ml.n_levels >= 3, [a.n_rows for a in ml.As]
    r0 = float(jnp.linalg.norm(b))
    for _ in range(8):
        x = multigrid_cycle(ml, b, x)
    from gnnla_tpu.models import residual
    r8 = float(jnp.linalg.norm(residual(A, b, x)))
    cf = (r8 / r0) ** (1 / 8)
    assert cf < 0.97, cf


def test_dia_hierarchy_parity(A, rng):
    """setup_with_dia_multigrid: every level of the SA hierarchy swaps to
    DIA on a grid problem and the cycle (and mg_pcg) numerics match the
    COO hierarchy bit-for-bit up to fp32 reassociation."""
    from gnnla_tpu.models import (mg_pcg, setup_sa_multigrid,
                                  setup_with_dia_multigrid)
    from gnnla_tpu.ops.dia import DIAOperator

    setup = setup_sa_multigrid(A, seed=0)
    setup_d = setup_with_dia_multigrid(setup)
    assert all(isinstance(a, DIAOperator) for a in setup_d.As), \
        [type(a).__name__ for a in setup_d.As]

    b = jnp.asarray(rng.random(1024), jnp.float32)
    x0 = jnp.zeros(1024, jnp.float32)
    want = multigrid_cycle(setup, b, x0, n_pre=2, n_post=2)
    got = multigrid_cycle(setup_d, b, x0, n_pre=2, n_post=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    xw, hw = mg_pcg(setup, b, x0, n_iters=8, flip_sign=True)
    xg, hg = mg_pcg(setup_d, b, x0, n_iters=8, flip_sign=True)
    np.testing.assert_allclose(np.asarray(xg), np.asarray(xw),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------- automatic path choice
def test_setup_auto_picks_stencil_on_grid(monkeypatch):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    # CPU CI runs the stencil kernels through the Pallas interpreter
    # (same recipe as tests/test_pallas.py)
    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)

    from gnnla_tpu.models import setup_auto, setup_twogrid, vcycle
    from gnnla_tpu.problems import laplacian_2d

    op = laplacian_2d(24).eliminate_zeros()
    auto = setup_auto(op, seed=0)
    assert auto.layout == "stencil", auto.why
    b = jnp.ones(op.n_rows)
    x_auto = auto.run(b, jnp.zeros_like(b))
    # numerics match the plain COO cycle
    tg = setup_twogrid(op, seed=0)
    x_ref = vcycle(tg, b, jnp.zeros_like(b))
    np.testing.assert_allclose(np.asarray(x_auto), np.asarray(x_ref),
                               rtol=2e-4, atol=2e-5)
    x5 = auto.solve(b, jnp.zeros_like(b), n_cycles=3)
    assert np.isfinite(np.asarray(x5)).all()


def test_setup_auto_picks_dia_on_banded_nongrid():
    import jax.numpy as jnp

    from gnnla_tpu.models import setup_auto, setup_twogrid, vcycle
    from gnnla_tpu.problems import laplacian_nd

    # 1-D Laplacian: banded but n is not a perfect-square grid
    op, _, _ = laplacian_nd((37 * 41,))
    op = op.eliminate_zeros()
    auto = setup_auto(op, seed=0)
    assert auto.layout == "dia", (auto.layout, auto.why)
    b = jnp.ones(op.n_rows)
    x_auto = auto.run(b, jnp.zeros_like(b))
    tg = setup_twogrid(op, seed=0)
    x_ref = vcycle(tg, b, jnp.zeros_like(b))
    np.testing.assert_allclose(np.asarray(x_auto), np.asarray(x_ref),
                               rtol=2e-4, atol=2e-5)


def test_setup_auto_falls_back_to_coo():
    import jax.numpy as jnp
    import scipy.sparse as sp

    from gnnla_tpu.models import setup_auto
    from gnnla_tpu.ops.sparse import SparseOperator

    # small unstructured SPD-ish operator: not a grid, too many offsets
    # for DIA at max_offsets... (small, so force dia rejection via the
    # random pattern), too small for the stream kernel
    rng = np.random.default_rng(5)
    n = 300
    R = sp.random(n, n, density=0.05, random_state=3, format="csr")
    A = (R + R.T + 20 * sp.eye(n)).tocsr()
    A.sort_indices()
    op = SparseOperator.from_scipy(A)
    auto = setup_auto(op, seed=0, layouts=("stencil", "stream", "coo"))
    assert auto.layout == "coo", (auto.layout, auto.why)
    assert "stencil" in auto.why and "stream" in auto.why
    b = jnp.ones(n)
    x = auto.run(b, jnp.zeros_like(b))
    assert np.isfinite(np.asarray(x)).all()
