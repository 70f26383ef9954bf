"""Krylov solvers composed from the GN kernels — CG and AMG-preconditioned
CG.

Not in the reference (its deepest composition is the stationary two-grid
cycle, VCycle.py:175-237); this is the natural production completion:
wrap the multigrid/V-cycle as a preconditioner inside conjugate gradients.
Every operation is one of the framework's kernels (SpMV, axpy, dot), the
iteration is a `lax.scan`, and the dot products are full-graph reductions
(`psum` points under sharding).

Sign convention: CG needs an SPD operator. The framework's Laplacian
fixture is negative definite (diag -4); pass `flip_sign=True` to solve
A x = b by running CG on (-A) x = -b.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from gnnla_tpu.models.vcycle import TwoGridSetup, vcycle


def cg(matvec: Callable, b, x0, *, n_iters: int,
       precond: Optional[Callable] = None):
    """Preconditioned conjugate gradients, scanned.

    matvec  : x -> A x (SPD operator)
    precond : r -> M^-1 r approximation (None = identity). Must be an SPD
              preconditioner application — e.g. one symmetric V-cycle from
              a zero initial guess.
    Returns (x, residual_norm_history [n_iters]).
    """
    b = jnp.ravel(b)
    x = jnp.ravel(x0)
    r = b - matvec(x)
    z = precond(r) if precond is not None else r
    p = z
    rz = jnp.vdot(r, z)

    def step(carry, _):
        x, r, p, rz = carry
        ap = matvec(p)
        denom = jnp.vdot(p, ap)
        alpha = rz / jnp.where(denom == 0, 1.0, denom)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r) if precond is not None else r
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        return (x, r, p, rz_new), jnp.linalg.norm(r)

    (x, r, p, rz), hist = jax.lax.scan(step, (x, r, p, rz), None,
                                       length=n_iters)
    return x, hist


def amg_pcg(setup: TwoGridSetup, b, x0, *, n_iters: int,
            n_smooth: int = 1, omega: float = 0.7, coarse_deg: int = 4,
            flip_sign: bool = False):
    """CG preconditioned by one two-grid V-cycle per iteration.

    The cycle runs from a zero initial guess with symmetric pre/post
    smoothing, which makes it an SPD preconditioner application for an SPD
    operator. `flip_sign=True` solves with the negated operator (for the
    negative-definite FD Laplacian convention).
    """
    s = 1.0 if not flip_sign else -1.0
    A = setup.A

    def matvec(v):
        return s * A.matvec(v)

    def precond(r):
        # the cycle from a zero guess approximates A^-1(rhs) and is linear
        # in the rhs, so (sA)^-1 r = A^-1 (s r) ~= cycle(s r)
        return vcycle(setup, s * r, jnp.zeros_like(r), n_pre=n_smooth,
                      n_post=n_smooth, omega=omega, coarse_deg=coarse_deg)

    return cg(matvec, s * jnp.ravel(b), x0, n_iters=n_iters,
              precond=precond)


def mg_pcg(setup, b, x0, *, n_iters: int, n_smooth: int = 1,
           omega: float = 0.7, coarse_deg: int = 8,
           flip_sign: bool = False):
    """CG preconditioned by one MULTILEVEL V-cycle per iteration.

    The two-grid `amg_pcg` stalls at large N (its Chebyshev "coarse solve"
    acts on a still-large coarse grid); with a full multilevel hierarchy
    (`models.multigrid.setup_multigrid`) the preconditioner quality is
    N-independent, so iterations to a fixed tolerance stay flat as the
    problem grows — the production large-scale solve path.
    """
    from gnnla_tpu.models.multigrid import MultigridSetup, multigrid_cycle

    assert isinstance(setup, MultigridSetup)
    s = 1.0 if not flip_sign else -1.0
    A = setup.As[0]

    def matvec(v):
        return s * A.matvec(v)

    def precond(r):
        return multigrid_cycle(setup, s * r, jnp.zeros_like(r),
                               n_pre=n_smooth, n_post=n_smooth, omega=omega,
                               coarse_deg=coarse_deg)

    return cg(matvec, s * jnp.ravel(b), x0, n_iters=n_iters,
              precond=precond)
