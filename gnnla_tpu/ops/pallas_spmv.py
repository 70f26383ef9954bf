"""Hand-fused Pallas TPU kernels for DIA-format SpMV.

One pass over HBM per matvec: for each row tile, the halo-extended x window
is DMA'd into VMEM (double-buffered — the next tile's window transfers while
the current tile computes), then K shifted multiply-adds accumulate on the
VPU. The diagonal blocks and y tiles ride the pallas_call grid pipeline,
which double-buffers them automatically.

Two entry points:

  * `make_dia_spmv(dia)`        — y = A @ x on plain [n] vectors.
  * `make_dia_spmv_padded(dia)` — operates on halo-padded vectors
    [T + n_pad + T] and *returns* a halo-padded result, so an iteration
    x <- f(A @ x) (power method, smoothers, the bench loop) never re-pads
    or slices between applications: the padded output feeds straight back
    in. Traffic per matvec is the roofline minimum K*n + n + n words
    (+ halo), with zero gathers.

Only used for banded operators (every FEM family here). Boundary handling is
free: x carries a zeroed halo of one tile on each side, and DIA stores
structural zeros at band boundaries, so off-band reads multiply by zero.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnnla_tpu.ops.dia import DIAOperator


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _build_padded_call(dia: DIAOperator, tile: int, diag_dtype=None):
    """pallas_call producing y_pad [T + n_pad + T] from x_pad of the same
    shape (T = tile). Grid steps 0 and G+1 zero the halo tiles; interior
    step i computes matrix rows [(i-1)*tile, i*tile).

    diag_dtype: storage dtype for the diagonal stream (e.g. bfloat16 —
    the diags are the dominant HBM traffic, K*n of the K*n + 2n words;
    compute still accumulates in the x dtype). Exact for integer-valued
    stencils; opt-in rounding for general FEM values."""
    offsets = dia.offsets
    k = len(offsets)
    n = dia.n
    halo = _round_up(max(1, max(abs(o) for o in offsets)), 1024)
    tile = min(tile, _round_up(max(n, halo), 1024))
    n_pad = _round_up(n, tile)
    grid_inner = n_pad // tile
    grid = grid_inner + 2
    win = tile + 2 * halo
    total = n_pad + 2 * tile

    diag_dtype = diag_dtype or dia.diags.dtype
    diags = jnp.zeros((k, n_pad), diag_dtype).at[:, :n].set(
        dia.diags.astype(diag_dtype))

    def kernel(diags_ref, xpad_hbm, y_ref, xwin0, xwin1, sem0, sem1):
        i = pl.program_id(0)
        bufs = (xwin0, xwin1)
        sems = (sem0, sem1)

        def dma(slot, block):
            # x window for y block `block`: matrix rows
            # [(block-1)*tile - halo, block*tile + halo) -> padded coords
            # [block*tile - halo, (block+1)*tile + halo)
            start = pl.multiple_of(block * tile - halo, 1024)
            return pltpu.make_async_copy(
                xpad_hbm.at[pl.ds(start, win)], bufs[slot], sems[slot])

        def compute(buf):
            acc = diags_ref[0, :] * buf[pl.ds(halo + offsets[0], tile)]
            for j in range(1, k):
                acc += diags_ref[j, :] * buf[pl.ds(halo + offsets[j], tile)]
            y_ref[:] = acc

        @pl.when(i == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)
            dma(1, 1).start()

        # interior steps, split by buffer parity so every scratch ref is
        # static (Mosaic cannot slice the buffer axis dynamically)
        for parity in (0, 1):
            @pl.when(jnp.logical_and(
                jnp.logical_and(i >= 1, i <= grid_inner),
                i % 2 == parity))
            def _(parity=parity):
                @pl.when(i + 1 <= grid_inner)
                def _():
                    dma(1 - parity, i + 1).start()
                dma(parity, i).wait()
                compute(bufs[parity])

        @pl.when(i == grid_inner + 1)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)

    def diag_index(i):
        return (0, jnp.clip(i - 1, 0, grid_inner - 1))

    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((k, tile), diag_index, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # x_pad stays in HBM
        ],
        out_specs=pl.BlockSpec((tile,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total,), dia.diags.dtype),
        scratch_shapes=[
            pltpu.VMEM((win,), dia.diags.dtype),
            pltpu.VMEM((win,), dia.diags.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            # wide-K operators (Galerkin coarse grids, K in the
            # hundreds) need more than Mosaic's 16 MB default scoped
            # budget for the pipelined diagonal window; v5e has 128 MB
            # physical VMEM (same setting as ops/pallas_stencil.py)
            vmem_limit_bytes=127 * 1024 * 1024),
    )
    return call, diags, tile, n_pad, total


class PallasDiaSpMV:
    """Compiled padded DIA SpMV with arrays threaded as *arguments*.

    CRITICAL (tunneled/remote-compile TPU backends): a jitted function that
    *closes over* a large device array inlines it as a constant into the
    program shipped to the compiler — compile time then scales with matrix
    bytes (observed: minutes for an 84 MB operator). Every entry point here
    therefore takes the diagonal data as an explicit argument; when
    embedding in your own jit/scan, call `apply(self.diags, x_pad)` with
    diags passed through your function's parameters.

    apply(op_args, x_pad) : pure differentiable function, safe to use
                            inside jit/scan/grad. The x cotangent is the
                            transposed DIA SpMV (another fused kernel);
                            the diags cotangent is the REAL gradient
                            d diags[k, i] = ybar[i] * x[i + offset_k]
                            (K shifted elementwise products in XLA), so
                            training operator values through the Pallas
                            path is exact. diags_T carries zero cotangent
                            (it never affects the forward output).
    op_args               : (diags [K, n_pad], diags_T) device arrays —
                            pass through your jit's parameters
    to_padded / from_padded : [n] <-> [T + n_pad + T] layout converters
    matvec(x)             : convenience single-shot y = A @ x on [n]
    """

    def __init__(self, dia: DIAOperator, tile: int, diag_dtype=None):
        from gnnla_tpu.ops.dia import dia_transpose

        call, diags, tile, n_pad, total = _build_padded_call(
            dia, tile, diag_dtype)
        dia_t = dia_transpose(dia)
        call_t, diags_t, _, _, _ = _build_padded_call(
            dia_t, tile, diag_dtype)
        self.diags = diags
        self.diags_t = diags_t
        self.tile = tile
        self.n_pad = n_pad
        self.total = total
        self.n = dia.n
        self.nnz = dia.nnz
        self._raw_call = call
        self._raw_call_t = call_t

        # Differentiable apply. The x cotangent of y = A x is
        # xbar = A^T ybar — another DIA SpMV on the transposed diagonals.
        # The diags cotangent is real: the interior rows satisfy
        # y_pad[T + i] = sum_k diags[k, i] * x_pad[T + i + offsets[k]],
        # so d diags[k, i] = ybar_pad[T + i] * x_pad[T + i + offsets[k]] —
        # K shifted elementwise products (static slices; tile >= halo is a
        # kernel invariant, so T + offset >= 0). op_args = (diags, diags_t)
        # is threaded as an explicit argument (never a closure constant —
        # see the class docstring); diags_t never affects the forward
        # output, so its cotangent is zero by definition.
        offsets = dia.offsets

        @jax.custom_vjp
        def apply(op_args, x_pad):
            return call(op_args[0], x_pad)

        def fwd(op_args, x_pad):
            return call(op_args[0], x_pad), (op_args[1], x_pad)

        def bwd(res, ybar):
            d_t, x_pad = res
            xbar = call_t(d_t, ybar)
            yb = ybar[tile:tile + n_pad]
            ddiags = jnp.stack([
                yb * x_pad[tile + off:tile + off + n_pad]
                for off in offsets]).astype(d_t.dtype)
            return ((ddiags, jnp.zeros_like(d_t)), xbar)

        apply.defvjp(fwd, bwd)
        self.op_args = (diags, diags_t)
        self.apply = apply                  # (op_args, x_pad) -> y_pad
        self._japply = jax.jit(apply)

    def to_padded(self, x):
        return jnp.zeros((self.total,), x.dtype).at[
            self.tile:self.tile + self.n].set(x)

    def from_padded(self, x_pad):
        return x_pad[self.tile:self.tile + self.n]

    def matvec_padded(self, x_pad):
        return self._japply(self.op_args, x_pad)

    def matvec(self, x):
        return self.from_padded(self.matvec_padded(self.to_padded(x)))


def make_dia_spmv_padded(dia: DIAOperator, tile: int = 128 * 1024,
                         diag_dtype=None) -> PallasDiaSpMV:
    """Build the padded-state Pallas SpMV (see PallasDiaSpMV).

    diag_dtype=jnp.bfloat16 stores the diagonal stream (the dominant HBM
    traffic) at half width with full-precision accumulation — exact when
    the matrix values are bf16-representable (integer stencils), opt-in
    rounding otherwise."""
    return PallasDiaSpMV(dia, tile, diag_dtype)


def make_dia_spmv(dia: DIAOperator, tile: int = 128 * 1024):
    """Returns y = A @ x on plain [n] vectors (single-shot convenience)."""
    return PallasDiaSpMV(dia, tile).matvec


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PallasDiaOperator:
    """DIA operator backed by the fused Pallas kernel, as a PYTREE
    satisfying the matvec/diagonal protocol the solver compositions
    consume (models.jacobi/chebyshev/residual, models.vcycle) — so
    `setup_with_dia(..., pallas=True)` swaps it straight into a cycle.

    The XLA shift path (`DIAOperator.matvec`) runs at ~1.8e10 edges/s;
    this kernel at ~1.1e11 (bench.py `spmv` stanza). Inside a V-cycle the
    coarse-level Chebyshev applies and the smoothing sweeps dominate, so
    the swap cuts the measured cycle time ~3-5x at 1M rows (PERF.md).

    Leaves: `op_args` (the (diags, diags_T) streams) and `diag` (the [n]
    matrix diagonal for Jacobi smoothing). The pallas_call is a static
    field; per-matvec pad/slice costs two [n] copies, noise next to the
    K*n stream.
    """

    op_args: Tuple[jax.Array, jax.Array]
    diag: jax.Array
    apply_fn: Callable = dataclasses.field(metadata=dict(static=True))
    tile: int = dataclasses.field(metadata=dict(static=True))
    total: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_rows(self) -> int:
        return self.n

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n, self.n)

    def matvec(self, x):
        if x.ndim > 1:
            raise ValueError("PallasDiaOperator matvec is vector-only")
        x_pad = jnp.zeros((self.total,), x.dtype).at[
            self.tile:self.tile + self.n].set(x)
        y_pad = self.apply_fn(self.op_args, x_pad)
        return y_pad[self.tile:self.tile + self.n]

    def __matmul__(self, x):
        return self.matvec(x)

    def diagonal(self):
        return self.diag


def fit_dia_tile(dia: DIAOperator, tile: int = 128 * 1024,
                 diag_dtype=None, vmem_budget: int = 96 * 1024 * 1024
                 ) -> int:
    """Largest tile (multiple of 1024, <= `tile`) whose VMEM working set
    fits: the grid-pipelined diagonal window is double-buffered
    (2 * K * tile * itemsize), plus the two x windows and the y tile.
    Wide-K operators (e.g. Galerkin coarse grids, K in the hundreds)
    would otherwise fail the Mosaic allocation check at the default
    128k tile. Raises ValueError when even the minimum tile overflows."""
    k = len(dia.offsets)
    isz = jnp.dtype(diag_dtype or dia.diags.dtype).itemsize
    halo = _round_up(max(1, max(abs(o) for o in dia.offsets)), 1024)
    t = _round_up(min(tile, _round_up(max(dia.n, halo), 1024)), 1024)
    while t >= 1024:
        win = t + 2 * halo
        need = 2 * k * t * isz + 2 * win * 4 + t * 4
        if need <= vmem_budget:
            return t
        t //= 2
    raise ValueError(
        f"DIA operator too wide for the Pallas kernel: K={k} offsets, "
        f"halo {halo} — even a 1024 tile overflows VMEM")


def pallas_dia_operator(dia: DIAOperator, tile: int = 128 * 1024,
                        diag_dtype=None) -> PallasDiaOperator:
    """Wrap a DIAOperator in the fused Pallas kernel (solver protocol).
    The tile auto-shrinks for wide-K operators (see `fit_dia_tile`)."""
    tile = fit_dia_tile(dia, tile, diag_dtype)
    mv = PallasDiaSpMV(dia, tile, diag_dtype)
    return PallasDiaOperator(op_args=mv.op_args, diag=dia.diagonal(),
                             apply_fn=mv.apply, tile=mv.tile,
                             total=mv.total, n=mv.n, nnz=mv.nnz)
