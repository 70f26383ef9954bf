"""Hand-fused Pallas TPU kernel for DIA-format SpMV.

One pass over HBM: for each row tile, DMA the halo-extended x window into
VMEM once, then accumulate K shifted multiply-adds on the VPU — the
single-kernel version of `DIAOperator.matvec`'s shifted-sum formulation.
Memory traffic per tile: K*T (diagonals) + T + 2P (x window) + T (y) words,
with the x window reused across all K diagonals (XLA's fusion of the jnp
version re-reads shifted x slices; here the reuse is explicit).

Only used for banded operators (every FEM family here). The y tile boundary
handling is free: x is zero-padded by P = max|offset| on both sides, and DIA
stores structural zeros at band boundaries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnnla_tpu.ops.dia import DIAOperator


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def make_dia_spmv(dia: DIAOperator, tile: int = 64 * 1024):
    """Returns a jitted y = A @ x closure over the DIA operator.

    tile: rows per grid step (multiple of 1024; clamped to the padded n).
    """
    offsets = dia.offsets
    k = len(offsets)
    n = dia.n
    pad = _round_up(max(1, max(abs(o) for o in offsets)), 1024)
    n_pad = _round_up(n, min(tile, _round_up(n, 1024)))
    tile = min(tile, n_pad)
    n_pad = _round_up(n, tile)
    grid = n_pad // tile
    win = tile + 2 * pad

    # pad diagonals once at closure build time: [K, n_pad]
    diags = jnp.zeros((k, n_pad), dia.diags.dtype).at[:, :n].set(dia.diags)

    def kernel(diags_ref, xpad_hbm, y_ref, xwin, sem):
        i = pl.program_id(0)
        start = pl.multiple_of(i * tile, 1024)
        dma = pltpu.make_async_copy(
            xpad_hbm.at[pl.ds(start, win)], xwin, sem)
        dma.start()
        dma.wait()
        acc = diags_ref[0, :] * xwin[pl.ds(pad + offsets[0], tile)]
        for j in range(1, k):
            acc += diags_ref[j, :] * xwin[pl.ds(pad + offsets[j], tile)]
        y_ref[:] = acc

    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((k, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # x_pad stays in HBM
        ],
        out_specs=pl.BlockSpec((tile,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad,), dia.diags.dtype),
        scratch_shapes=[
            pltpu.VMEM((win,), dia.diags.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )

    @jax.jit
    def matvec(x):
        x_pad = jnp.zeros((pad + n_pad + pad,), x.dtype)
        x_pad = x_pad.at[pad:pad + n].set(x)
        y = call(diags, x_pad)
        return y[:n]

    return matvec
