"""Geometric (semi-coarsened) two-grid cycle — the all-stencil TPU path.

The reference's MATLAB V-cycle uses the *alternating* C/F splitting
C(1:2:end)=1 (/root/reference/matlab/test_vcycle.m:64-67). On a 2D grid
with even width that splitting is semi-coarsening: coarse points are the
even columns, so the coarse grid is itself a (H, W/2) grid. That structure
makes every part of the cycle regular:

  * pre/post smoothing and the fine residual run as the fused VMEM-resident
    stencil kernels (ops/pallas_stencil.py);
  * P and P^T never materialise: the direct-interpolation weights group by
    (dy, dj) offset class into dense [H, W/2] planes, so prolongation /
    restriction are multiply + `jnp.roll` ops at full HBM bandwidth — no
    gather/scatter at all;
  * the Galerkin operator Ac = P^T A P is again a stencil on the coarse
    grid (<= 9 taps for the 5/9-point fine operators), so the coarse
    Chebyshev solve is a stencil kernel too.

Numerics are identical (float32 rounding aside) to the generic
`vcycle(setup_twogrid(A, splitting="alternating"), ...)` — the setup
artifacts (SOC -> split -> direct interpolation -> Galerkin) are the very
same host computation; only the execution strategy changes. Tests assert
the two paths agree; use the generic path for unstructured operators.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnnla_tpu.models.vcycle import TwoGridSetup, setup_twogrid
from gnnla_tpu.ops.sparse import SparseOperator


def _interp_planes(P: SparseOperator, grid_shape: Tuple[int, int]):
    """Decompose the alternating-splitting prolongation into offset planes.

    Returns (offsets, planes): for an F-point at fine (r, c=2j+1),
    P[(r, c), (r', j')] lands in the class (dy, dj) = ((r'-r) mod H,
    (j'-j) mod Wc) with planes[k][r, j] holding the weight. C-point rows
    must be exactly the identity (assemble_prolongation guarantees it).
    """
    h, w = grid_shape
    wc = w // 2
    rows, cols, vals = P.host_coo()
    rf, cf = rows // w, rows % w
    rc_, jc = cols // wc, cols % wc
    is_c = (cf % 2) == 0

    ident = is_c
    if not (np.all(rf[ident] == rc_[ident])
            and np.all(cf[ident] // 2 == jc[ident])
            and np.allclose(vals[ident], 1.0)):
        raise ValueError("C-point rows of P are not the identity; "
                         "was the setup built with splitting='alternating'?")

    m = ~is_c
    jf = (cf[m] - 1) // 2
    dy = (rc_[m] - rf[m]) % h
    dj = (jc[m] - jf) % wc
    cls = dy.astype(np.int64) * wc + dj
    uniq, k_idx = np.unique(cls, return_inverse=True)
    planes = np.zeros((uniq.size, h * wc), np.float64)
    np.add.at(planes, (k_idx, rf[m] * wc + jf), vals[m])
    offsets = [(int(u) // wc, int(u) % wc) for u in uniq]
    return offsets, planes.reshape(-1, h, wc)


class GeometricVCycle:
    """All-stencil two-grid cycle for grid operators (see module doc).

    cycle(args, b, x) is pure and jittable with `self.args` threaded as
    arguments (repo convention); run(b, x) is the jitted wrapper.
    """

    def __init__(self, A: SparseOperator, grid_shape, *, theta: float = 0.25,
                 n_pre: int = 3, n_post: int = 3, omega: float = 0.7,
                 coarse_deg: int = 4, coarse_c: float = -3.4,
                 coarse_d: float = -4.0, diag=None, tap_dtype=None,
                 setup: TwoGridSetup | None = None):
        from gnnla_tpu.ops.pallas_stencil import (_build_stencil_call,
                                                  make_stencil_jacobi,
                                                  make_stencil_residual,
                                                  stencil_taps)
        h, w = (int(g) for g in grid_shape)
        if w % 2:
            raise ValueError(f"grid width must be even, got {w} "
                             "(alternating splitting = even columns)")
        self.grid_shape = (h, w)
        self.wc = wc = w // 2
        if setup is None:
            setup = setup_twogrid(A, theta=theta, splitting="alternating",
                                  diag=diag)
        if not (isinstance(setup.A, SparseOperator)
                and isinstance(setup.P, SparseOperator)):
            raise ValueError(
                "GeometricVCycle needs a COO TwoGridSetup (its P assembly "
                "reads host COO triplets); construct it before "
                "setup_with_dia, not after")
        flags = np.asarray(setup.coarse_flags)
        want = np.zeros(h * w, flags.dtype)
        want[::2] = 1
        if not np.array_equal(flags, want):
            raise ValueError("setup's C/F splitting is not the alternating "
                             "pattern; build with splitting='alternating'")
        self.setup = setup
        self.omega = float(omega)
        self._coarse = dict(c=float(coarse_c), d=float(coarse_d),
                            deg=int(coarse_deg))

        self._pre = make_stencil_jacobi(A, self.grid_shape, omega=omega,
                                        n_iters=n_pre, diag=setup.diag,
                                        tap_dtype=tap_dtype)
        self._post = self._pre if n_post == n_pre else make_stencil_jacobi(
            A, self.grid_shape, omega=omega, n_iters=n_post,
            diag=setup.diag, tap_dtype=tap_dtype)
        self._res = make_stencil_residual(A, self.grid_shape,
                                          tap_dtype=tap_dtype)

        self._p_offsets, p_planes = _interp_planes(setup.P, self.grid_shape)
        wplanes = jnp.asarray(p_planes, jnp.float32)

        ac_shifts, ac_planes = stencil_taps(setup.Ac, (h, wc))
        ac_dtype = tap_dtype or setup.Ac.vals.dtype
        ac_taps = jnp.asarray(ac_planes, ac_dtype).reshape(-1, h, wc)
        self._ac_call = _build_stencil_call(ac_shifts, h, wc, 1, ac_dtype,
                                            "plain")

        self._d2 = jnp.asarray(setup.diag, jnp.float32).reshape(h, w)
        self.args = (self._pre.taps, self._post.taps, self._res.taps,
                     self._d2, wplanes, ac_taps)
        self._jit_cycle = jax.jit(self.cycle)

    # -- coarse-grid pieces ------------------------------------------------

    def _restrict(self, wplanes, r2):
        """rc = P^T r: identity on C columns + rolled weighted F columns."""
        h, wc = self.grid_shape[0], self.wc
        rr = r2.reshape(h, wc, 2)
        re, ro = rr[..., 0], rr[..., 1]
        rc = re
        for k, (dy, dj) in enumerate(self._p_offsets):
            rc = rc + jnp.roll(wplanes[k] * ro, (dy, dj), axis=(0, 1))
        return rc

    def _prolong(self, wplanes, xc):
        """x += P xc: C columns get xc, F columns the weighted stencil."""
        odd = jnp.zeros_like(xc)
        for k, (dy, dj) in enumerate(self._p_offsets):
            odd = odd + wplanes[k] * jnp.roll(xc, (-dy, -dj), axis=(0, 1))
        return jnp.stack([xc, odd], axis=-1).reshape(self.grid_shape)

    def _cheby(self, ac_taps, b2, x2):
        """models.chebyshev recurrence on 2D arrays with stencil matvecs."""
        c, d, deg = (self._coarse["c"], self._coarse["d"],
                     self._coarse["deg"])
        if deg <= 0:
            return x2

        def mv(v):
            return self._ac_call(ac_taps, v)

        r = b2 - mv(x2)
        alpha = 1.0 / d
        p = r
        x2 = x2 + alpha * p
        for k in range(2, deg + 1):
            z = mv(p)
            r = r - alpha * z
            beta = (0.5 * (c * alpha) ** 2 if k == 2
                    else ((c * alpha) / 2.0) ** 2)
            alpha = 1.0 / (d - beta / alpha)
            p = r + beta * p
            x2 = x2 + alpha * p
        return x2

    # -- the cycle ---------------------------------------------------------

    def cycle(self, args, b, x):
        pre_taps, post_taps, res_taps, d2, wplanes, ac_taps = args
        h, w = self.grid_shape
        b2 = jnp.reshape(b, (h, w)).astype(jnp.float32)
        x2 = jnp.reshape(x, (h, w)).astype(jnp.float32)
        c = self.omega * b2 / d2

        x2 = self._pre._call(pre_taps, c, x2)

        r2 = self._res._call(res_taps, b2, x2)
        rc = self._restrict(wplanes, r2)
        xc = self._cheby(ac_taps, rc, jnp.zeros_like(rc))
        x2 = x2 + self._prolong(wplanes, xc)

        x2 = self._post._call(post_taps, c, x2)
        return x2.reshape(-1)

    def run(self, b, x):
        """One cycle on flat [n] vectors (jitted, args threaded)."""
        return self._jit_cycle(self.args, jnp.ravel(b), jnp.ravel(x))


def make_geometric_vcycle(A: SparseOperator, grid_shape,
                          **kwargs) -> GeometricVCycle:
    """Semi-coarsened all-stencil two-grid cycle (see GeometricVCycle)."""
    return GeometricVCycle(A, grid_shape, **kwargs)
