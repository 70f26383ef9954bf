"""Distributed multilevel-preconditioned CG — the large-N solve, sharded.

`models.krylov.mg_pcg` composed over a device mesh: the CG vectors ride in
`[S, R]` row-block layout, the matvec is the halo-`ppermute` sharded SpMV,
the preconditioner is one distributed multilevel cycle
(`make_sharded_multigrid_cycle`), and every inner product is a full-graph
reduction on sharded arrays (XLA inserts the psum). No reference
counterpart — the reference is single-device and two-grid
(SURVEY.md §2.5, pytorch/VCycle.py:175-237).

The CG recurrence itself runs as eager jnp ops between the two jitted
kernels (cycle + matvec keep their operator pytrees threaded as jit
arguments per the repo-wide closure rule); at solve scale the cycle and
matvec dominate an iteration, so the handful of small dispatches is noise.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.sharding import Mesh

from gnnla_tpu.parallel.spmv import make_sharded_matvec
from gnnla_tpu.parallel.vcycle import make_sharded_multigrid_cycle


def make_sharded_mg_pcg(setup, mesh: Mesh, axis: str = "rows", *,
                        n_smooth: int = 1, omega: float = 0.7,
                        coarse_deg: int = 8, flip_sign: bool = False,
                        min_sharded_rows: int = 32768,
                        n_sharded_levels=None, globalize=None):
    """Returns (solve, part): solve(b_sh, x0_sh, n_iters) -> (x_sh, hist).

    b/x0 are `[S, R]` vectors sharded by `part` (build with
    `shard_vector(v, part)` + `device_put_sharded`); hist is the [n_iters]
    residual-norm history (host numpy, fetched ONCE after the loop — no
    per-iteration device->host sync). `flip_sign=True` solves with the
    negated operator (negative-definite FD Laplacian convention), exactly
    as `models.krylov.mg_pcg`. `globalize` is forwarded to
    `make_sharded_multigrid_cycle` for multi-process (`jax.distributed`)
    runs — exercised across real process boundaries in
    tests/multihost_worker.py.
    """
    kw = {} if globalize is None else {"globalize": globalize}
    cycle, part = make_sharded_multigrid_cycle(
        setup, mesh, axis, n_pre=n_smooth, n_post=n_smooth, omega=omega,
        coarse_deg=coarse_deg, min_sharded_rows=min_sharded_rows,
        n_sharded_levels=n_sharded_levels, **kw)
    mvec = make_sharded_matvec(part, mesh, axis)
    s = -1.0 if flip_sign else 1.0

    def solve(b, x0, n_iters: int):
        def matvec(v):
            return s * mvec(v)

        def precond(r):
            # multilevel cycle from a zero guess with symmetric smoothing:
            # an SPD preconditioner application, linear in the rhs
            return cycle(s * r, jnp.zeros_like(r))

        b2 = s * b
        x = x0
        r = b2 - matvec(x)
        z = precond(r)
        p = z
        rz = jnp.sum(r * z)
        hist = []
        for _ in range(int(n_iters)):
            ap = matvec(p)
            denom = jnp.sum(p * ap)
            alpha = rz / jnp.where(denom == 0, 1.0, denom)
            x = x + alpha * p
            r = r - alpha * ap
            z = precond(r)
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.where(rz == 0, 1.0, rz)
            p = z + beta * p
            rz = rz_new
            hist.append(jnp.sqrt(jnp.sum(r * r)))
        import numpy as np
        return x, np.asarray(jnp.stack(hist)) if hist else np.zeros(0)

    return solve, part
