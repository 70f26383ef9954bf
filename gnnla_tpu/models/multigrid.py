"""Multilevel AMG V/W-cycles — beyond the reference's two-grid.

The reference composes exactly two grids (pytorch/VCycle.py:175-237,
matlab/test_vcycle.m); the natural completion is the recursive hierarchy:
apply the same SOC -> C/F split -> direct interpolation -> Galerkin setup
level by level until the coarsest grid is small, then run V- (or W-) cycles
over the whole hierarchy. Setup is host-phase like `setup_twogrid`; the
cycle is a pure jittable function (the recursion over levels is static, so
it traces to one program).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gnnla_tpu.models.chebyshev import chebyshev
from gnnla_tpu.models.jacobi import jacobi
from gnnla_tpu.models.residual import residual
from gnnla_tpu.models.vcycle import setup_twogrid
from gnnla_tpu.ops.sparse import SparseOperator


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MultigridSetup:
    """Hierarchy of fixed-pattern operators (a jittable pytree).

    As    : operators per level (len L; finest first)
    Ps    : prolongations between levels (len L-1)
    diags : smoother diagonals per level (len L; level 0 may be a trained
            Jacobi diagonal)
    """

    As: Tuple[SparseOperator, ...]
    Ps: Tuple[SparseOperator, ...]
    diags: Tuple[jax.Array, ...]
    # Chebyshev interval for the coarsest solve, from the coarsest
    # operator's spectrum at setup (the reference's fixed c=-3.4, d=-4.0
    # are bounds for the *finest* Laplacian only and diverge on deeper
    # Galerkin operators)
    coarse_c: float = dataclasses.field(default=-3.4,
                                        metadata=dict(static=True))
    coarse_d: float = dataclasses.field(default=-4.0,
                                        metadata=dict(static=True))

    @property
    def n_levels(self) -> int:
        return len(self.As)


def setup_multigrid(A: SparseOperator, *, theta: float = 0.25,
                    splitting: str = "pmis", seed: int = 0,
                    min_coarse: int = 16, max_levels: int = 12,
                    trunc: float = 0.2, interp: str = "signed",
                    diag: Optional[jax.Array] = None) -> MultigridSetup:
    """Recursive AMG setup: two-grid setup per level until the coarsest
    operator is small (or coarsening stalls).

    Deeper Galerkin operators drift away from the M-matrix regime the
    classical direct-interpolation formula assumes; without a cure the
    weights blow up on anisotropic problems (heateqnfem2dfun.m stretch up
    to 7). The cure is the classical one: Ruge-Stuben interpolation
    truncation with row-sum-preserving rescaling (`trunc`, default 0.2) at
    every level — it bounds both P and the Galerkin products, so the
    hierarchy reaches its natural depth instead of bailing out early on
    magnitude heuristics — plus Stuben's signed direct interpolation
    (interp="signed"), which lumps positive off-diagonals into the
    diagonal (deep Galerkin operators are not M-matrices even when the
    fine operator is). Defaults here differ from `setup_twogrid` (whose
    defaults mirror the reference exactly): splitting="pmis" because both
    CLJP variants over-coarsen multilevel hierarchies, and the reference
    itself only ever composes two grids (VCycle.py:175-237).
    """
    import numpy as np

    As, Ps, diags = [], [], []
    current = A
    d = diag
    for _ in range(max_levels - 1):
        if current.n_rows <= min_coarse:
            break
        tg = setup_twogrid(current, theta=theta, splitting=splitting,
                           seed=seed, diag=d, trunc=trunc, interp=interp)
        # stop only when coarsening genuinely stalls
        if tg.Ac.n_rows >= 0.95 * current.n_rows or tg.Ac.n_rows == 0:
            break
        As.append(current)
        Ps.append(tg.P)
        diags.append(tg.diag)
        current = tg.Ac
        d = None  # trained diagonal applies to the finest level only
    As.append(current)
    diags.append(jnp.asarray(current.host_diagonal().astype(
        np.dtype(current.vals.dtype))))

    # Chebyshev interval for the coarsest solve from its actual spectrum
    # (host dense eig — the coarsest operator is small by construction)
    evals = np.linalg.eigvals(np.asarray(current.to_scipy().todense()))
    lmin, lmax = float(np.min(evals.real)), float(np.max(evals.real))
    spread = max(lmax - lmin, 1e-12)
    coarse_d = 0.5 * (lmax + lmin)
    coarse_c = 0.5 * spread
    return MultigridSetup(As=tuple(As), Ps=tuple(Ps), diags=tuple(diags),
                          coarse_c=coarse_c, coarse_d=coarse_d)


def setup_sa_multigrid(A: SparseOperator, *, theta: float = 0.08,
                       seed: int = 0, min_coarse: int = 16,
                       max_levels: int = 12,
                       diag: Optional[jax.Array] = None) -> MultigridSetup:
    """Smoothed-aggregation AMG setup (Vanek/Mandel/Brezina) — the
    scalable hierarchy.

    The classical splitting+direct-interpolation hierarchy
    (`setup_multigrid`) mirrors the reference's demo pipeline but has the
    known multilevel quality collapse: independent-set coarsening strands
    F-points without strong C-neighbors, and the measured cycle
    convergence factor degrades with size (~0.86 at 64^2 -> ~0.95+ at
    512^2 on the 5-point Laplacian). SA coarsening replaces C/F splitting
    with aggregation and smooths the piecewise-constant tentative
    prolongator one damped-Jacobi step, giving the O(1) (size-independent)
    convergence factor production AMG needs. The strength measure is the
    reference's own SA SOC (SOCSAGNN.py:49-71), thresholded per level at
    theta * 0.5^level (Vanek's schedule).

    Returns the same `MultigridSetup` pytree; `multigrid_cycle`,
    `multigrid_solve` and `mg_pcg` run on it unchanged.
    """
    import numpy as np

    from gnnla_tpu.amg.aggregation import (aggregate, sa_strength,
                                           smoothed_prolongator,
                                           tentative_prolongator)

    As, Ps, diags = [], [], []
    current = A
    d = diag
    dtype = A.vals.dtype
    for level in range(max_levels - 1):
        n = current.n_rows
        if n <= min_coarse:
            break
        Ah = current.to_scipy().tocsr()
        S = sa_strength(Ah, theta * (0.5 ** level))
        agg = aggregate(S, seed=seed)
        n_agg = int(agg.max()) + 1
        if n_agg >= 0.95 * n or n_agg < 1:
            break
        P_hat = tentative_prolongator(agg)
        P = smoothed_prolongator(Ah, S, P_hat, seed=seed)
        Ac = (P.T @ Ah @ P).tocsr()
        Ac.sum_duplicates()
        Ac.sort_indices()
        P = P.tocsr()
        P.sum_duplicates()
        P.sort_indices()
        Pc = P.tocoo()
        As.append(current)
        Ps.append(SparseOperator.from_coo(Pc.row, Pc.col, Pc.data,
                                          P.shape, dtype=dtype,
                                          coalesce=False))
        # host diagonal: setup never touches the device (each level's
        # .diagonal() was a compile + scatter round-trip on the tunnel —
        # the bulk of round 3's 54.6s SA setup at 1M rows)
        diags.append(jnp.asarray(current.host_diagonal().astype(
                                     np.dtype(current.vals.dtype)))
                     if d is None else jnp.ravel(d))
        d = None
        Acc = Ac.tocoo()
        current = SparseOperator.from_coo(Acc.row, Acc.col, Acc.data,
                                          Ac.shape, dtype=dtype,
                                          coalesce=False)
    As.append(current)
    diags.append(jnp.asarray(current.host_diagonal().astype(
        np.dtype(current.vals.dtype))))

    evals = np.linalg.eigvals(np.asarray(current.to_scipy().todense()))
    lmin, lmax = float(np.min(evals.real)), float(np.max(evals.real))
    spread = max(lmax - lmin, 1e-12)
    return MultigridSetup(As=tuple(As), Ps=tuple(Ps), diags=tuple(diags),
                          coarse_c=0.5 * spread,
                          coarse_d=0.5 * (lmax + lmin))


def setup_with_dia_multigrid(setup: MultigridSetup,
                             max_offsets: int = 512) -> MultigridSetup:
    """Swap every level's operator for its DIA twin when banded enough —
    the TPU fast path for the whole hierarchy (same protocol trick as
    `setup_with_dia` on the two-grid setup: jacobi/chebyshev/residual and
    `mg_pcg`'s CG matvec only use matvec/diagonal, which `DIAOperator`
    satisfies). Grid problems keep bandedness through SA/Galerkin
    coarsening (aggregate indices follow node order), so typically every
    level swaps; any level too irregular keeps the COO gather path.
    Prolongations stay COO (rectangular: DIA is square-only)."""
    from gnnla_tpu.ops.dia import to_dia

    def try_dia(op):
        if not isinstance(op, SparseOperator):
            return op
        try:
            return to_dia(op, max_offsets)
        except ValueError:
            return op

    return dataclasses.replace(setup,
                               As=tuple(try_dia(a) for a in setup.As))


def multigrid_cycle(setup: MultigridSetup, b, x, *, n_pre: int = 3,
                    n_post: int = 3, omega: float = 0.7,
                    coarse_deg: int = 8, coarse_c: Optional[float] = None,
                    coarse_d: Optional[float] = None,
                    gamma: int = 1) -> jnp.ndarray:
    """One multilevel cycle (gamma=1: V-cycle, gamma=2: W-cycle).

    The level recursion is Python-static, so the whole cycle traces into a
    single XLA program; iterate with `lax.scan` via `multigrid_solve`.
    """
    b, x = jnp.ravel(b), jnp.ravel(x)
    L = setup.n_levels
    coarse_c = setup.coarse_c if coarse_c is None else coarse_c
    coarse_d = setup.coarse_d if coarse_d is None else coarse_d

    def cycle(level, b, x):
        A, d = setup.As[level], setup.diags[level]
        if level == L - 1:
            return chebyshev(A, b, x, c=coarse_c, d=coarse_d,
                             deg=coarse_deg)
        x = jacobi(A, b, x, omega=omega, n_iters=n_pre, diag=d)
        P = setup.Ps[level]
        for _ in range(gamma):
            r = residual(A, b, x)
            rc = P.rmatvec(r)
            xc = cycle(level + 1, rc, jnp.zeros_like(rc))
            x = x + P.matvec(xc)
        return jacobi(A, b, x, omega=omega, n_iters=n_post, diag=d)

    return cycle(0, b, x)


def multigrid_solve(setup: MultigridSetup, b, x, *, n_cycles: int,
                    **cycle_kwargs) -> jnp.ndarray:
    """n_cycles multilevel cycles under one `lax.scan` program."""
    b, x = jnp.ravel(b), jnp.ravel(x)

    def step(x, _):
        return multigrid_cycle(setup, b, x, **cycle_kwargs), None

    x, _ = jax.lax.scan(step, x, None, length=n_cycles)
    return x
