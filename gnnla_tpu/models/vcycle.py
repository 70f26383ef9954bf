"""Two-grid AMG V-cycle composed entirely from the GN kernels.

Reference semantics: /root/reference/pytorch/VCycle.py:175-237 (and
matlab/test_vcycle.m:329-390): Jacobi pre-smooth -> classical SOC -> C/F
splitting -> direct-interpolation P -> Galerkin Ac = P^T A P -> restrict
residual -> Chebyshev (or direct) coarse solve -> prolongate correction ->
Jacobi post-smooth.

Design change vs the reference (deliberate, documented): the reference
recomputes SOC/splitting/P/Ac inside *every* cycle and escapes to dense for P
(VCycle.py:126-137). Here AMG setup runs once on host (`setup_twogrid`) and
returns a pytree of fixed-pattern operators; `vcycle` is then a pure jittable
function — iterating cycles is a `lax.scan`. Numerics match the reference
cycle because the setup artifacts are identical cycle to cycle.

The reference defects catalogued in SURVEY.md §"Observed reference defects"
(hardcoded -4 diagonal and global-N capture in runJacobi at VCycle.py:165,
ignored n_coarsesolve at :255) are fixed: diagonals come from the operator,
and the coarse Chebyshev degree is a real parameter.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gnnla_tpu.amg.galerkin import galerkin_product
from gnnla_tpu.amg.interp import assemble_prolongation
from gnnla_tpu.amg.splitting import split
from gnnla_tpu.models.chebyshev import chebyshev
from gnnla_tpu.models.direct_interp import direct_interp
from gnnla_tpu.models.jacobi import jacobi
from gnnla_tpu.models.residual import residual
from gnnla_tpu.models.soc import soc_classic
from gnnla_tpu.ops.sparse import SparseOperator


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TwoGridSetup:
    """Fixed-pattern artifacts of the AMG setup phase (a jit-able pytree)."""

    A: SparseOperator
    P: SparseOperator
    Ac: SparseOperator
    diag: jax.Array          # diag(A) — or a trained Jacobi diagonal
    coarse_flags: jax.Array  # [N] 1/0


def _soc_classic_host(rows, cols, vals, n, theta):
    """Host numpy twin of models.soc.soc_classic (same empty-row semantics:
    max over an empty row is 0, matching the torch_scatter fill of
    SOCClassicGNN.py:69). Returns the boolean strength mask per edge."""
    v = np.full(n, -np.inf, dtype=np.float64)
    np.maximum.at(v, rows, -vals)
    v[np.isneginf(v)] = 0.0  # empty rows -> 0, like segment_max
    with np.errstate(divide="ignore", invalid="ignore"):
        s = -vals / v[rows] - theta
    return np.nan_to_num(s, nan=-1.0, posinf=np.inf) > 0


def _direct_interp_host(rows, cols, vals, diag, coarse, strong):
    """Host numpy twin of models.direct_interp.direct_interp
    (DirectInterpGNN.py:50-152): w_ij = (1-C_i) * (-A_ij * alpha_i),
    alpha_i = (sum_k A_ik / sum_k A_ik S_ik C_k) / A_ii."""
    n = diag.shape[0]
    num = np.zeros(n, dtype=np.float64)
    den = np.zeros(n, dtype=np.float64)
    np.add.at(num, rows, vals)
    np.add.at(den, rows, vals * strong * coarse[cols])
    with np.errstate(divide="ignore", invalid="ignore"):
        alpha = (num / den) / diag
        w = (1.0 - coarse[rows]) * (-vals * alpha[rows])
    # C-point rows contribute nothing; kill F-rows with no strong C
    # neighbours too (the reference's Inf/NaN guard,
    # matlab/test_direct_interpolation.m:130-132).
    return np.nan_to_num(w, nan=0.0, posinf=0.0, neginf=0.0)


def _direct_interp_host_signed(rows, cols, vals, diag, coarse, strong):
    """Stuben's signed direct interpolation — the non-M-matrix-safe
    variant. The reference formula (above) assumes all off-diagonals are
    negative; stretched quad-FEM stencils (heateqnfem2dfun.m, stretch > 2)
    have positive off-diagonals that corrupt alpha. Here:

      * positive off-diagonals are lumped into the diagonal
        (a~_ii = a_ii + sum_k max(a_ik, 0)),
      * alpha uses negative sums only
        (alpha_i = sum_k min(a_ik, 0) / sum_{j in C_i^s} min(a_ij, 0)),
      * w_ij = (1-C_i) * (-a_ij) * alpha_i / a~_ii on strong negative
        C couplings, 0 elsewhere.

    Reduces to the reference formula on M-matrices (no positive entries).

    Sign convention: rows are normalised by sign(diag) first, so both the
    positive-definite FEM (positive diagonal) and the reference's
    negative-definite FD Laplacian (laplacianfun's -4 diagonal) orient the
    same way — the reference formula is degree-0 homogeneous in that flip.
    """
    n = diag.shape[0]
    sgn = np.where(diag < 0, -1.0, 1.0)
    vals = vals * sgn[rows]
    diag = diag * sgn
    neg = vals < 0
    keep = neg & (strong > 0)
    num = np.zeros(n, dtype=np.float64)
    den = np.zeros(n, dtype=np.float64)
    pos_sum = np.zeros(n, dtype=np.float64)
    np.add.at(num, rows, np.where(neg, vals, 0.0))
    np.add.at(den, rows, np.where(keep & (coarse[cols] > 0), vals, 0.0))
    np.add.at(pos_sum, rows, np.where(neg, 0.0, vals))
    with np.errstate(divide="ignore", invalid="ignore"):
        alpha = (num / den) / (diag + pos_sum)
        w = (1.0 - coarse[rows]) * np.where(keep, -vals * alpha[rows], 0.0)
    return np.nan_to_num(w, nan=0.0, posinf=0.0, neginf=0.0)


def setup_twogrid(A: SparseOperator, *, theta: float = 0.25,
                  splitting: str = "cljp", seed: int = 0,
                  diag: Optional[jax.Array] = None,
                  use_device_gnn: bool = False,
                  trunc: float = 0.0,
                  interp: str = "reference") -> TwoGridSetup:
    """AMG setup: SOC -> C/F split -> direct interpolation -> Galerkin.

    Mirrors runSOC/runDirectInterp/the Galerkin product of VCycle.py:72-137,
    209, with P kept sparse. `diag` optionally substitutes a trained Jacobi
    diagonal for the smoother (train_jacobi model family).

    interp="reference" is the exact reference formula
    (DirectInterpGNN.py:133-152); interp="signed" is the Stuben variant
    that stays stable on non-M-matrices (positive off-diagonals), used by
    `setup_multigrid` where Galerkin coarse operators drift out of the
    M-matrix regime.

    Setup is a host-phase computation (the reference likewise leaves the
    tensor world for pyamg's CLJP, VCycle.py:114): by default the SOC and
    interpolation formulas run in numpy on the cached host COO — no device
    round-trips, which matters on tunneled TPU backends where the first
    device->host transfer is very expensive. `use_device_gnn=True` routes
    them through the GN-block kernels instead (tests assert both paths
    agree).
    """
    import scipy.sparse as sp

    A_nodiag = A.remove_diagonal()
    # host-computed diagonal (setup phase must not touch the device;
    # A.diagonal() is a jitted scatter — a compile + tunnel round-trip)
    a_diag = (jnp.asarray(A.host_diagonal().astype(np.dtype(A.vals.dtype)))
              if diag is None else jnp.ravel(diag))
    rows, cols, vals = A_nodiag.host_coo()
    diag_h = A.host_diagonal()

    if use_device_gnn:
        strong = np.asarray(soc_classic(A_nodiag, theta)) > 0
    else:
        strong = _soc_classic_host(rows, cols, vals, A.n_rows, theta)

    S_host = sp.coo_matrix(
        (strong.astype(np.float64), (rows, cols)), shape=A.shape).tocsr()
    coarse = split(S_host, method=splitting, seed=seed)

    if use_device_gnn:
        w_ij = np.asarray(direct_interp(
            A_nodiag, A.diagonal(), jnp.asarray(coarse, dtype=A.vals.dtype),
            jnp.asarray(strong, dtype=A.vals.dtype)))
    else:
        interp_fn = {"reference": _direct_interp_host,
                     "signed": _direct_interp_host_signed}[interp]
        w_ij = interp_fn(rows, cols, vals, diag_h,
                         coarse.astype(np.float64),
                         strong.astype(np.float64))
    P = assemble_prolongation(A_nodiag, coarse, w_ij, dtype=A.vals.dtype,
                              trunc=trunc)
    Ac = galerkin_product(A, P)

    return TwoGridSetup(A=A, P=P, Ac=Ac, diag=a_diag,
                        coarse_flags=jnp.asarray(coarse))


def setup_with_dia(setup: TwoGridSetup, max_offsets: int = 512,
                   pallas: bool = False) -> TwoGridSetup:
    """Swap A (and Ac when banded enough) for DIA twins — the TPU fast
    path. Every kernel the cycle calls uses only the matvec/diagonal
    protocol, which `DIAOperator` satisfies, so the same `vcycle` runs
    unchanged ~2 orders of magnitude faster on structured operators
    (DIA = shifted contiguous reads vs the COO gather/scatter path; see
    ops/dia.py and bench.py). P stays COO (rectangular, needs rmatvec).

    `pallas=True` additionally wraps both levels in the fused Pallas DIA
    kernel (`ops.pallas_spmv.pallas_dia_operator`, ~6x the XLA shift
    path): the coarse-level Chebyshev applies and the smoothing sweeps
    dominate a cycle, so this is the fastest general two-grid config
    (bench.py `vcycle_dia_pallas_ms`)."""
    from gnnla_tpu.ops.dia import DIAOperator, to_dia

    def try_dia(op):
        if isinstance(op, SparseOperator):
            try:
                op = to_dia(op, max_offsets)
            except ValueError:
                return op  # too irregular — keep the gather path
        if pallas and isinstance(op, DIAOperator):
            from gnnla_tpu.ops.pallas_spmv import pallas_dia_operator
            try:
                op = pallas_dia_operator(op)
            except ValueError:
                pass  # too wide for VMEM — keep the XLA shift path
        return op

    return dataclasses.replace(setup, A=try_dia(setup.A),
                               Ac=try_dia(setup.Ac))


def setup_with_stream_p(setup: TwoGridSetup, *, nb: int = 32,
                        kb: Optional[int] = None, backend: str = "pallas",
                        interpret: bool = False) -> TwoGridSetup:
    """Swap the prolongation P for its stream-kernel twin (square
    embedding, ops/stream_op.py::RectStreamOperator). Once A and Ac run
    on the Pallas DIA path (`setup_with_dia(..., pallas=True)`), the two
    COO P/P^T applies dominate a cycle (~36 ms each at 1M rows); the
    stream twin runs them at kernel speed. Falls back unchanged when the
    pattern's column windows are too diffuse for the packer (ValueError),
    so composing with any setup is safe. Numerics identical (same edges,
    same sums; parity-tested in tests/test_stream.py)."""
    from gnnla_tpu.ops.stream_op import rect_stream_operator

    P = setup.P
    if not isinstance(P, SparseOperator):
        return setup  # already swapped
    n, nc = P.shape
    rows, cols, vals = P.host_coo()
    Psq = SparseOperator.from_coo(np.asarray(rows), np.asarray(cols),
                                  np.asarray(vals), (n, n))
    try:
        P_s = rect_stream_operator(Psq, nc, nb=nb, kb=kb, backend=backend,
                                   interpret=interpret)
    except ValueError:
        return setup  # diffuse windows — keep the COO path
    return dataclasses.replace(setup, P=P_s)


def setup_with_stream(setup: TwoGridSetup, *, nb: int = 32,
                      kb: Optional[int] = None, backend: str = "pallas",
                      interpret: bool = False) -> TwoGridSetup:
    """Swap the fine operator A for its stream-kernel twin — the TPU fast
    path for *unstructured* graphs (where `setup_with_dia` would refuse or
    degrade). Every kernel the cycle calls uses only the matvec/diagonal
    protocol, which `StreamOperator` satisfies, so the same `vcycle` runs
    unchanged on the lane-local-gather Pallas kernel (ops/pallas_stream.py)
    instead of the scatter-bound COO path. Ac stays COO: the coarse grid is
    small and often below the stream kernel's tile granularity.

    This is the composition reach the reference gets from instantiating
    every kernel on the same torch_scatter edge list
    (/root/reference/pytorch/VCycle.py:175-237)."""
    from gnnla_tpu.ops.stream_op import stream_operator

    if not isinstance(setup.A, SparseOperator):
        raise ValueError("setup.A already swapped; build the stream twin "
                         "from the COO setup")
    A_s = stream_operator(setup.A, nb=nb, kb=kb, backend=backend,
                          interpret=interpret)
    return dataclasses.replace(setup, A=A_s)


class StencilVCycle:
    """Two-grid cycle with the fine level fully fused into Pallas kernels.

    For grid operators (every matrix family in the reference is one —
    see ops/pallas_stencil.py module doc) the fine-level work of a cycle
    — pre-smooth, residual, post-smooth — dominates its cost and is
    bandwidth-bound on the generic paths. Here it runs as three
    VMEM-resident stencil kernels (n_pre fused Jacobi sweeps, one fused
    r = b - A x, n_post fused sweeps); only the coarse correction
    (P^T r -> Chebyshev on Ac -> P xc) stays on the COO/DIA path.

    Numerics match `vcycle(setup, ...)` with the same parameters — the
    smoother taps M = I - omega D^-1 A are precomputed in float64 on host,
    so only float32 rounding differs. Smoothing parameters are baked into
    the taps at construction (that is what makes the fusion possible);
    build a new object to change them.

    `cycle(args, b, x)` is a pure jittable function; thread `self.args`
    through jit as arguments (repo convention — remote compilers inline
    closure constants). `run(b, x)` is the jitted convenience wrapper.
    """

    def __init__(self, setup: TwoGridSetup, grid_shape, *, n_pre: int = 3,
                 n_post: int = 3, omega: float = 0.7, coarse_deg: int = 4,
                 coarse_c: float = -3.4, coarse_d: float = -4.0,
                 tap_dtype=None, coarse_dia: bool = True):
        from gnnla_tpu.ops.pallas_stencil import (make_stencil_jacobi,
                                                  make_stencil_residual)
        if not isinstance(setup.A, SparseOperator):
            raise ValueError(
                "StencilVCycle builds its taps from the COO setup; "
                "construct it before setup_with_dia, not after")
        if min(n_pre, n_post) < 1:
            raise ValueError("n_pre and n_post must be >= 1")
        if coarse_dia and isinstance(setup.Ac, SparseOperator):
            # with the fine level fused into stencil kernels, the coarse
            # Chebyshev solve dominates the cycle on the COO path — swap
            # Ac to its DIA twin when banded (same numerics, ~3x cycle
            # speedup measured at 1M rows; P stays COO: rectangular)
            from gnnla_tpu.ops.dia import to_dia
            try:
                setup = dataclasses.replace(setup, Ac=to_dia(setup.Ac))
            except ValueError:
                pass  # too irregular — keep the gather path
        h, w = grid_shape
        self.grid_shape = (int(h), int(w))
        self.setup = setup
        self.omega = float(omega)
        self._coarse = dict(c=coarse_c, d=coarse_d, deg=coarse_deg)
        self._pre = make_stencil_jacobi(
            setup.A, self.grid_shape, omega=omega, n_iters=n_pre,
            diag=setup.diag, tap_dtype=tap_dtype)
        self._post = self._pre if n_post == n_pre else make_stencil_jacobi(
            setup.A, self.grid_shape, omega=omega, n_iters=n_post,
            diag=setup.diag, tap_dtype=tap_dtype)
        self._res = make_stencil_residual(setup.A, self.grid_shape,
                                          tap_dtype=tap_dtype)
        self._d2 = jnp.asarray(setup.diag, jnp.float32).reshape(h, w)
        self.args = (self._pre.taps, self._post.taps, self._res.taps,
                     self._d2, setup.P, setup.Ac)
        self._jit_cycle = jax.jit(self.cycle)

    def cycle(self, args, b, x):
        pre_taps, post_taps, res_taps, d2, P, Ac = args
        h, w = self.grid_shape
        b2 = jnp.reshape(b, (h, w)).astype(jnp.float32)
        x2 = jnp.reshape(x, (h, w)).astype(jnp.float32)
        c = self.omega * b2 / d2

        x2 = self._pre._call(pre_taps, c, x2)

        r = self._res._call(res_taps, b2, x2).reshape(-1)
        rc = P.rmatvec(r)
        xc = chebyshev(Ac, rc, jnp.zeros_like(rc), **self._coarse)
        x2 = x2 + P.matvec(xc).reshape(h, w)

        x2 = self._post._call(post_taps, c, x2)
        return x2.reshape(-1)

    def run(self, b, x):
        """One cycle on flat [n] vectors (jitted, args threaded)."""
        return self._jit_cycle(self.args, jnp.ravel(b), jnp.ravel(x))


def make_stencil_vcycle(setup: TwoGridSetup, grid_shape,
                        **kwargs) -> StencilVCycle:
    """Fused fine-level two-grid cycle for grid operators (see
    StencilVCycle)."""
    return StencilVCycle(setup, grid_shape, **kwargs)


def vcycle(setup: TwoGridSetup, b, x, *, n_pre: int = 3, n_post: int = 3,
           omega: float = 0.7, coarse_deg: int = 4, coarse_c: float = -3.4,
           coarse_d: float = -4.0) -> jnp.ndarray:
    """One two-grid cycle (pure function of the setup pytree — jit me).

    Parameter defaults reproduce the reference driver (VCycle.py:251-272):
    w=0.7 Jacobi smoothing, degree-4 Chebyshev coarse solve with c=-3.4,
    d=-4.0.
    """
    A, P, Ac = setup.A, setup.P, setup.Ac
    b, x = jnp.ravel(b), jnp.ravel(x)

    x = jacobi(A, b, x, omega=omega, n_iters=n_pre, diag=setup.diag)

    r = residual(A, b, x)
    rc = P.rmatvec(r)                     # P^T r, no transpose materialised
    xc = jnp.zeros_like(rc)
    xc = chebyshev(Ac, rc, xc, c=coarse_c, d=coarse_d, deg=coarse_deg)
    x = x + P.matvec(xc)

    x = jacobi(A, b, x, omega=omega, n_iters=n_post, diag=setup.diag)
    return x


def solve(setup: TwoGridSetup, b, x, *, n_cycles: int,
          **cycle_kwargs) -> jnp.ndarray:
    """Run n_cycles V-cycles under `lax.scan` (one compiled program)."""
    b, x = jnp.ravel(b), jnp.ravel(x)

    def step(x, _):
        return vcycle(setup, b, x, **cycle_kwargs), None

    x, _ = jax.lax.scan(step, x, None, length=n_cycles)
    return x


# --------------------------------------------------- automatic path choice
def _infer_grid_shape(A: SparseOperator):
    """(h, w) when A's pattern is a tensor-product grid stencil, else None.

    Square vertex count + every edge offset falling into a bounded set of
    2-D shifts (ops/pallas_stencil.stencil_classes raises otherwise)."""
    import math

    n = A.n_rows
    h = math.isqrt(n)
    if h * h != n:
        return None
    from gnnla_tpu.ops.pallas_stencil import stencil_classes

    rows, cols, _ = A.host_coo()
    try:
        stencil_classes(rows, cols, h, h)
    except Exception:
        return None
    return (h, h)


class AutoTwoGrid:
    """Two-grid solver on the fastest execution path available for this
    operator — resolves the round-3 gap where the 8.5x-slower COO path
    was the silent default unless users knew the fast twins existed.

    Probe order (each guarded by its existing ValueError probes):
      stencil  fused VMEM stencil kernels (tensor-product grid patterns;
               115 ms -> sub-ms per cycle at 1M rows in BENCH_r03)
      dia      gather-free shift layout (banded patterns)
      stream   lane-local-gather Pallas kernel (general graphs, large)
      coo      always works

    `layout` records the choice; `why` the per-layout failure reasons.
    `run(b, x)` is one jitted cycle, `solve(b, x, n_cycles)` a scanned
    batch of cycles (stencil runs the Python loop: its cycle is already
    one fused program).
    """

    def __init__(self, setup: TwoGridSetup, *, grid_shape=None,
                 layouts=("stencil", "dia", "stream", "coo"),
                 stream_backend: str = "pallas", **cycle_kwargs):
        if not isinstance(setup.A, SparseOperator):
            raise ValueError("pass the plain COO setup (before any "
                             "setup_with_* swap)")
        self.cycle_kwargs = cycle_kwargs
        self.why = {}
        self._stencil = None
        self.setup = setup
        for lay in layouts:
            try:
                if lay == "stencil":
                    gs = grid_shape or _infer_grid_shape(setup.A)
                    if gs is None:
                        raise ValueError("pattern is not a tensor-product "
                                         "grid")
                    self._stencil = StencilVCycle(setup, gs, **cycle_kwargs)
                elif lay == "dia":
                    swapped = setup_with_dia(setup)
                    if isinstance(swapped.A, SparseOperator):
                        raise ValueError("pattern not banded enough for "
                                         "DIA")
                    self.setup = swapped
                elif lay == "stream":
                    if setup.A.n_rows < 4096:
                        raise ValueError(
                            "operator too small for the stream kernel "
                            "(single 1024-row tile dominates; COO wins)")
                    self.setup = setup_with_stream(setup,
                                                   backend=stream_backend)
                elif lay != "coo":
                    raise ValueError(f"unknown layout {lay!r}")
                self.layout = lay
                break
            except ValueError as e:
                self.why[lay] = str(e)
        else:
            raise ValueError(f"no layout accepted this operator: "
                             f"{self.why}")
        if self._stencil is None:
            self._run = jax.jit(
                lambda s, b, x: vcycle(s, b, x, **cycle_kwargs))

    def run(self, b, x) -> jnp.ndarray:
        """One two-grid cycle on the chosen path."""
        if self._stencil is not None:
            return self._stencil.run(b, x)
        return self._run(self.setup, b, x)

    def solve(self, b, x, *, n_cycles: int) -> jnp.ndarray:
        if self._stencil is not None:
            x = jnp.ravel(x)
            for _ in range(n_cycles):
                x = self._stencil.run(b, x)
            return x
        return jax.jit(
            lambda s, bb, xx: solve(s, bb, xx, n_cycles=n_cycles,
                                    **self.cycle_kwargs)
        )(self.setup, b, x)


def setup_auto(A: SparseOperator, *, theta: float = 0.25,
               splitting: str = "cljp", seed: int = 0,
               diag=None, trunc: float = 0.0,
               interp: str = "reference", grid_shape=None,
               stream_backend: str = "pallas",
               **cycle_kwargs) -> AutoTwoGrid:
    """setup_twogrid + automatic fast-path selection in one call.

    Returns an AutoTwoGrid whose `.layout` says which execution path won
    (stencil > dia > stream > coo). Cycle parameters (n_pre, n_post,
    omega, coarse_*) are baked in via **cycle_kwargs; numerics match
    `vcycle` on the plain setup for every path (tests assert parity)."""
    setup = setup_twogrid(A, theta=theta, splitting=splitting, seed=seed,
                          diag=diag, trunc=trunc, interp=interp)
    return AutoTwoGrid(setup, grid_shape=grid_shape,
                       stream_backend=stream_backend, **cycle_kwargs)
