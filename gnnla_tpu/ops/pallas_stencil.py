"""VMEM-resident 2D stencil kernel — speed-of-light iterated SpMV on TPU.

Every matrix family in the reference is assembled on a 2D structured grid
(`matlab/laplacianfun.m`, `matlab/heateqnfem2dfun.m`, the periodic diffusion
FEM of `pytorch/DiffCoeffs/FEM.py`), so each nonzero A[i, j] connects grid
points (r, c) -> (rj, cj) with a *modular shift class*

    dy = (rj - r) mod H,   dx = (cj - c) mod W.

Grouping edges by class turns y = A @ x into a stencil of K tap planes:

    y[r, c] = sum_k  tap_k[r, c] * x[(r + dy_k) % H, (c + dx_k) % W]

where each shifted read is a hardware `pltpu.roll` (lane/sublane rotate)
instead of a misaligned vector load — exact BY CONSTRUCTION for any matrix
on the grid (Dirichlet truncation just leaves plane entries zero; periodic
wrap edges land in the same class as their interior siblings, e.g. the
9-point periodic FEM is exactly 9 planes where DIA needs 21 offsets).

For iterated application x <- A @ x (power method `PowerMethodGNN.py:129`,
smoother sweeps, the bench loop) the kernel keeps the iterate in two
ping-pong VMEM buffers and the tap planes VMEM-resident as well: after the
one-time load there is ZERO HBM traffic per step — the VPU is the roofline.
Measured on a v5e at 2048x2048 (21M edges): ~1.07e12 edges/s, ~10x the
streaming DIA kernel, bit-exact vs the jnp DIA matvec.

Differentiability: `PallasStencilSpMV.apply` carries a full custom VJP.
The x cotangent is the transposed-shift stencil (another fused kernel);
the taps cotangent is the REAL gradient, computed by re-running the
iteration through `stencil_matvec_jnp` (the jnp-rolls twin) under
`jax.vjp` — exact, but it stores the n_steps intermediate iterates, so
differentiating a large-n_steps apply costs n_steps * H * W floats of
memory. Losses trained through the taps (spectral/Gelfand over a
trained-Jacobi propagator) can also use `stencil_matvec_jnp` directly,
which `training.spectral_loss.damping_factor_gelfand_stencil` builds on.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnnla_tpu.ops.sparse import SparseOperator

VMEM_BUDGET = 112 * 1024 * 1024
MAX_TAPS = 64


def stencil_taps(op: SparseOperator, grid_shape: Tuple[int, int]):
    """Group the nonzeros of a grid operator by modular shift class.

    Returns (shifts, planes): shifts is a list of (dy, dx) with
    0 <= dy < H, 0 <= dx < W; planes is a float [K, H*W] array with
    planes[k, r*W + c] = A[(r, c), ((r+dy_k)%H, (c+dx_k)%W)].

    Exact for ANY square operator of size H*W — Dirichlet boundaries are
    zeros in the planes, periodic wraps fall in their interior siblings'
    class. Raises when the pattern needs more than MAX_TAPS planes (then
    it is not a stencil; use BSR/COO paths).
    """
    h, w = grid_shape
    if op.shape[0] != op.shape[1] or op.shape[0] != h * w:
        raise ValueError(f"grid {h}x{w} needs a square {h * w}-row "
                         f"operator, got {op.shape}")
    rows, cols, vals = op.host_coo()
    shifts, k_idx = stencil_classes(rows, cols, h, w)
    planes = np.zeros((len(shifts), h * w), np.float64)
    np.add.at(planes, (k_idx, rows), vals)
    return shifts, planes


def stencil_classes(rows, cols, h: int, w: int):
    """Modular shift classes of a COO pattern on an h x w grid.

    Returns (shifts, k_idx): shifts the list of (dy, dx) classes, k_idx the
    per-nonzero class index (aligned with `rows`/`cols` order — so stacked
    same-pattern value arrays can be scattered into [B, K, H*W] planes with
    one np.add.at, the batched twin of `stencil_taps`)."""
    r, c = rows // w, rows % w
    rj, cj = cols // w, cols % w
    dy = (rj - r) % h
    dx = (cj - c) % w
    cls = dy.astype(np.int64) * w + dx
    uniq, k_idx = np.unique(cls, return_inverse=True)
    if uniq.size > MAX_TAPS:
        raise ValueError(
            f"pattern has {uniq.size} (dy, dx) shift classes "
            f"(> {MAX_TAPS}); not a stencil on a {h}x{w} grid")
    shifts = [(int(u) // w, int(u) % w) for u in uniq]
    return shifts, k_idx


def _vmem_budget() -> int:
    """Usable VMEM bytes on the attached TPU, minus Mosaic's scratch
    headroom. VMEM_BUDGET assumes a v5e-class chip (128 MB physical); on
    generations that report a smaller VMEM we scale the guard down so the
    failure is this clear ValueError, not a Mosaic allocation error."""
    try:
        import jax
        d = jax.devices()[0]
        stats = d.memory_stats() or {}
        vmem = stats.get("vmem_size_bytes")
        if vmem:
            return min(VMEM_BUDGET, int(vmem) - 16 * 1024 * 1024)
    except Exception:
        pass
    return VMEM_BUDGET


def _vmem_check(k, h, w, dbytes, n_resident_vecs):
    """k tap planes + n_resident_vecs f32 [H, W] buffers must fit VMEM."""
    budget = _vmem_budget()
    vmem = k * h * w * dbytes + n_resident_vecs * h * w * 4
    if vmem > budget:
        raise ValueError(
            f"stencil-resident needs ~{vmem / 2**20:.0f} MB VMEM "
            f"(budget {budget / 2**20:.0f} MB, sized for a v5e-class "
            "128 MB chip); use the streaming DIA kernel for this size")


def _build_stencil_call(shifts, h, w, n_steps, tap_dtype, mode):
    """Shared kernel builder for the fused VMEM-resident stencil loops.

    mode = "plain":     x <- T x                    (iterated SpMV)
           "affine":    x <- T x + c                (Jacobi-style smoother)
           "normalize": x <- T x / ||T x||_2        (power iteration)

    "affine" adds a third resident [H, W] buffer holding c (loaded once);
    "normalize" runs an in-kernel full reduction per step (one extra VPU
    pass — still zero HBM traffic).
    """
    k = len(shifts)
    out_parity = n_steps % 2
    affine = mode == "affine"

    def body(s, bufs, tv, cbuf):
        for parity in (0, 1):
            @pl.when(s % 2 == parity)
            def _(parity=parity):
                src, dst = bufs[parity], bufs[1 - parity]
                x = src[:]
                acc = None
                for j, (dy, dx) in enumerate(shifts):
                    v = x
                    # read x[(r+dy)%H, (c+dx)%W]: roll by the inverse
                    if dx:
                        v = pltpu.roll(v, (w - dx) % w, 1)
                    if dy:
                        v = pltpu.roll(v, (h - dy) % h, 0)
                    term = tv[j].astype(jnp.float32) * v
                    acc = term if acc is None else acc + term
                if mode == "affine":
                    acc = acc + cbuf[:]
                elif mode == "normalize":
                    acc = acc * jax.lax.rsqrt(jnp.sum(acc * acc))
                dst[:] = acc

    if affine:
        def kernel(taps_hbm, c_hbm, x_hbm, y_hbm, buf0, buf1, cbuf, tv,
                   sem_x, sem_y, sem_t, sem_c):
            s = pl.program_id(0)

            @pl.when(s == 0)
            def _():
                cps = [pltpu.make_async_copy(x_hbm, buf0, sem_x),
                       pltpu.make_async_copy(taps_hbm, tv, sem_t),
                       pltpu.make_async_copy(c_hbm, cbuf, sem_c)]
                for cp in cps:
                    cp.start()
                for cp in cps:
                    cp.wait()

            body(s, (buf0, buf1), tv, cbuf)

            @pl.when(s == pl.num_programs(0) - 1)
            def _():
                cp = pltpu.make_async_copy(
                    (buf0, buf1)[out_parity], y_hbm, sem_y)
                cp.start()
                cp.wait()

        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 3
        scratch = [
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((k, h, w), tap_dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
    else:
        def kernel(taps_hbm, x_hbm, y_hbm, buf0, buf1, tv,
                   sem_x, sem_y, sem_t):
            s = pl.program_id(0)

            @pl.when(s == 0)
            def _():
                cps = [pltpu.make_async_copy(x_hbm, buf0, sem_x),
                       pltpu.make_async_copy(taps_hbm, tv, sem_t)]
                for cp in cps:
                    cp.start()
                for cp in cps:
                    cp.wait()

            body(s, (buf0, buf1), tv, None)

            @pl.when(s == pl.num_programs(0) - 1)
            def _():
                cp = pltpu.make_async_copy(
                    (buf0, buf1)[out_parity], y_hbm, sem_y)
                cp.start()
                cp.wait()

        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2
        scratch = [
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((k, h, w), tap_dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]

    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # v5e has 128 MB physical VMEM; Mosaic's scoped-stack
            # accounting adds roll/accumulator temporaries on top of the
            # declared scratch, so give it everything but 1 MB headroom.
            vmem_limit_bytes=127 * 1024 * 1024),
    )


def stencil_transpose(shifts: List[Tuple[int, int]], planes):
    """Tap planes of A^T from those of A (device-side, differentiable).

    A^T's shift class for A's (dy, dx) is ((-dy) % H, (-dx) % W), and its
    plane is A's plane moved to the target points: a (dy, dx) roll.
    planes: [K, H, W] array. Returns (shifts_t, planes_t).
    """
    h, w = planes.shape[1], planes.shape[2]
    shifts_t = [((-dy) % h, (-dx) % w) for dy, dx in shifts]
    planes_t = jnp.stack([
        jnp.roll(planes[k], (dy, dx), (0, 1))
        for k, (dy, dx) in enumerate(shifts)])
    return shifts_t, planes_t


def stencil_matvec_jnp(planes, shifts: List[Tuple[int, int]], x2d):
    """y = A @ x as jnp rolls — fully differentiable (in planes AND x).

    The training twin of the fused Pallas kernels: identical tap semantics
    (y[r,c] = sum_k planes[k,r,c] * x[(r+dy)%H, (c+dx)%W]), but XLA autodiff
    flows through it, so spectral losses over trained-Jacobi propagators
    (taps built from trainable d) can run stencil-resident. x2d may be
    [H, W] or [H, W, m] (SpMM over probe blocks).
    """
    acc = None
    for k, (dy, dx) in enumerate(shifts):
        v = jnp.roll(x2d, (-dy, -dx), (0, 1))
        p = planes[k] if x2d.ndim == 2 else planes[k][:, :, None]
        term = p * v
        acc = term if acc is None else acc + term
    return acc


class PallasStencilSpMV:
    """Fused y = A^{n_steps} @ x for grid-stencil operators, VMEM-resident.

    apply(taps, x2d) -> y2d      [H, W] f32 in/out; taps [K, H, W] threaded
                                 as a jit ARGUMENT (never close over it —
                                 remote compilers inline closure constants
                                 into the shipped program).
                                 Differentiable in BOTH arguments: the x
                                 cotangent is the transposed-shift stencil
                                 run n_steps times (another fused kernel);
                                 the taps cotangent is exact, recomputed
                                 through the jnp-rolls twin (stores the
                                 n_steps intermediates — fine for solver
                                 compositions, heavy for n_steps >> 10;
                                 train through `stencil_matvec_jnp` when
                                 that matters).
    matvec_n(x)                  [n] convenience wrapper
    """

    def __init__(self, op: SparseOperator, grid_shape: Tuple[int, int],
                 n_steps: int = 1, tap_dtype=None):
        if n_steps < 1:
            raise ValueError("n_steps must be >= 1")
        h, w = grid_shape
        tap_dtype = tap_dtype or op.vals.dtype
        dbytes = jnp.dtype(tap_dtype).itemsize
        _vmem_check(1, h, w, dbytes, 2)   # early out before host planes
        shifts, planes = stencil_taps(op, grid_shape)
        k = len(shifts)
        _vmem_check(k, h, w, dbytes, 2)

        self.grid_shape = grid_shape
        self.shifts = shifts
        self.n = op.shape[0]
        self.nnz = op.nnz
        self.n_steps = n_steps
        self.taps = jnp.asarray(planes, tap_dtype).reshape(k, h, w)
        call = _build_stencil_call(shifts, h, w, n_steps, tap_dtype,
                                   "plain")
        # transposed-shift kernel for the x cotangent: (A^n)^T = (A^T)^n
        shifts_t, planes_t = stencil_transpose(
            self.shifts, self.taps.astype(jnp.float32))
        self.taps_t = planes_t.astype(tap_dtype)
        call_t = _build_stencil_call(shifts_t, h, w, n_steps, tap_dtype,
                                     "plain")

        def f_jnp(taps, x2d):
            # jnp twin of the fused loop: identical tap semantics, full
            # XLA autodiff (used only inside bwd, for the taps cotangent)
            tf = taps.astype(jnp.float32)

            def step(x, _):
                return stencil_matvec_jnp(tf, shifts, x), None

            y, _ = jax.lax.scan(step, x2d, None, length=n_steps)
            return y

        @jax.custom_vjp
        def apply(taps, x2d):
            return call(taps, x2d)

        def fwd(taps, x2d):
            return call(taps, x2d), (taps, x2d)

        def bwd(res, ybar):
            taps, x2d = res
            # x cotangent = (A^T)^n ybar via the fused transposed kernel;
            # the transposed taps are rebuilt from the residual taps with
            # K device rolls so nothing large is closed over.
            _, planes_t = stencil_transpose(shifts,
                                            taps.astype(jnp.float32))
            xbar = call_t(planes_t.astype(taps.dtype), ybar)
            # taps cotangent: exact, via jax.vjp through the jnp twin
            # (recomputes the n_steps intermediates; its redundant x
            # cotangent is dead code XLA removes under jit).
            _, vjp_fn = jax.vjp(f_jnp, taps, x2d)
            tbar, _ = vjp_fn(ybar)
            return (tbar, xbar)

        apply.defvjp(fwd, bwd)
        self.apply = apply

    def matvec_n(self, x):
        """y = A^{n_steps} x on flat [n] vectors."""
        y = self.apply(self.taps, x.reshape(self.grid_shape)
                       .astype(jnp.float32))
        return y.reshape(-1)


class PallasStencilJacobi:
    """Fused weighted-Jacobi sweeps, VMEM-resident (smoother fast path).

    n_iters applications of x <- x + omega D^-1 (b - A x), rewritten as
    the affine stencil iteration x <- M x + c with M = I - omega D^-1 A
    (same shift classes as A plus the identity tap) and c = omega b / d.
    M's taps and c stay in VMEM for all fused steps; semantics match
    `models.jacobi` / reference JacobiGNN.py:91-123 exactly.

    run(taps, b2d, x2d) -> x2d'  (c computed from b on device, one XLA op)
    """

    def __init__(self, op: SparseOperator, grid_shape: Tuple[int, int],
                 omega: float, n_iters: int, diag=None, tap_dtype=None):
        h, w = grid_shape
        tap_dtype = tap_dtype or op.vals.dtype
        dbytes = jnp.dtype(tap_dtype).itemsize
        _vmem_check(1, h, w, dbytes, 3)
        shifts, planes = stencil_taps(op, grid_shape)
        d = np.asarray(op.diagonal() if diag is None else diag, np.float64)
        # M = I - omega D^-1 A: row-scale every tap, add 1 on the identity
        planes = -omega * planes / d[None, :]
        if (0, 0) not in shifts:
            shifts = [(0, 0)] + shifts
            planes = np.concatenate(
                [np.zeros((1, h * w)), planes], axis=0)
        planes[shifts.index((0, 0))] += 1.0
        k = len(shifts)
        _vmem_check(k, h, w, dbytes, 3)

        self.grid_shape = grid_shape
        self.n = op.shape[0]
        self.nnz = op.nnz
        self.n_iters = n_iters
        self.omega = omega
        self.taps = jnp.asarray(planes, tap_dtype).reshape(k, h, w)
        self._d2 = jnp.asarray(d.reshape(h, w), jnp.float32)
        self._call = _build_stencil_call(shifts, h, w, n_iters, tap_dtype,
                                         "affine")

    def run(self, taps, b2d, x2d):
        c = (self.omega * b2d / self._d2).astype(jnp.float32)
        return self._call(taps, c, x2d.astype(jnp.float32))

    def smooth(self, b, x):
        """n_iters Jacobi sweeps on flat [n] vectors."""
        h, w = self.grid_shape
        return self.run(self.taps, b.reshape(h, w),
                        x.reshape(h, w)).reshape(-1)


class PallasStencilPower:
    """Fused normalized power iterations, VMEM-resident.

    n_iters of b <- A b / ||A b||_2 with an in-kernel full reduction per
    step (reference PowerMethodGNN.py:129-207 semantics); the Rayleigh
    quotient is computed outside on the returned iterate.
    """

    def __init__(self, op: SparseOperator, grid_shape: Tuple[int, int],
                 n_iters: int, tap_dtype=None):
        h, w = grid_shape
        tap_dtype = tap_dtype or op.vals.dtype
        dbytes = jnp.dtype(tap_dtype).itemsize
        _vmem_check(1, h, w, dbytes, 2)
        shifts, planes = stencil_taps(op, grid_shape)
        k = len(shifts)
        _vmem_check(k, h, w, dbytes, 2)

        self._op = op
        self.grid_shape = grid_shape
        self.n = op.shape[0]
        self.nnz = op.nnz
        self.n_iters = n_iters
        self.taps = jnp.asarray(planes, tap_dtype).reshape(k, h, w)
        self.apply = _build_stencil_call(shifts, h, w, n_iters, tap_dtype,
                                         "normalize")

    def run(self, b0):
        """Returns (lambda_max, b) after n_iters normalized iterations."""
        h, w = self.grid_shape
        b = self.apply(self.taps, b0.reshape(h, w).astype(jnp.float32))
        b = b.reshape(-1)
        lam = jnp.dot(b, self._op.matvec(b)) / jnp.dot(b, b)
        return lam, b


class PallasStencilResidual:
    """Fused r = b - A x in one kernel pass.

    The affine mode with taps = -A and c = b gives r = (-A) x + b exactly
    (reference GNNResidual.py:64-118 semantics). Used as the fine-level
    residual inside `models.vcycle.StencilVCycle` so the whole fine-grid
    part of a two-grid cycle runs as three pallas calls with no COO
    gather/scatter traffic.
    """

    def __init__(self, op: SparseOperator, grid_shape: Tuple[int, int],
                 tap_dtype=None):
        h, w = grid_shape
        tap_dtype = tap_dtype or op.vals.dtype
        dbytes = jnp.dtype(tap_dtype).itemsize
        shifts, planes = stencil_taps(op, grid_shape)
        k = len(shifts)
        _vmem_check(k, h, w, dbytes, 3)

        self.grid_shape = grid_shape
        self.n = op.shape[0]
        self.nnz = op.nnz
        self.taps = jnp.asarray(-planes, tap_dtype).reshape(k, h, w)
        self._call = _build_stencil_call(shifts, h, w, 1, tap_dtype,
                                         "affine")

    def run(self, taps, b2d, x2d):
        return self._call(taps, b2d.astype(jnp.float32),
                          x2d.astype(jnp.float32))

    def residual(self, b, x):
        """r = b - A x on flat [n] vectors."""
        h, w = self.grid_shape
        return self.run(self.taps, b.reshape(h, w),
                        x.reshape(h, w)).reshape(-1)


def make_stencil_spmv(op: SparseOperator, grid_shape: Tuple[int, int],
                      n_steps: int = 1,
                      tap_dtype=None) -> PallasStencilSpMV:
    """Build the VMEM-resident roll-based stencil SpMV (see module doc)."""
    return PallasStencilSpMV(op, grid_shape, n_steps, tap_dtype)


def make_stencil_jacobi(op: SparseOperator, grid_shape: Tuple[int, int],
                        omega: float = 0.7, n_iters: int = 3, diag=None,
                        tap_dtype=None) -> PallasStencilJacobi:
    """Fused VMEM-resident weighted-Jacobi smoother; `diag` overrides the
    operator diagonal (trained-Jacobi integration)."""
    return PallasStencilJacobi(op, grid_shape, omega, n_iters, diag,
                               tap_dtype)


def make_stencil_power(op: SparseOperator, grid_shape: Tuple[int, int],
                       n_iters: int = 10,
                       tap_dtype=None) -> PallasStencilPower:
    """Fused VMEM-resident normalized power iteration."""
    return PallasStencilPower(op, grid_shape, n_iters, tap_dtype)


def make_stencil_residual(op: SparseOperator, grid_shape: Tuple[int, int],
                          tap_dtype=None) -> PallasStencilResidual:
    """Fused r = b - A x stencil kernel."""
    return PallasStencilResidual(op, grid_shape, tap_dtype)
