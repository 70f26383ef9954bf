"""DIA (diagonal) sparse format — the TPU speed-of-light SpMV path.

Every matrix family in this framework (FD Laplacians, structured quad-FEM
stiffness, periodic diffusion FEM) is *banded*: nonzeros live on a handful of
fixed diagonal offsets (5-point stencil: 5 offsets; quad FEM: 9; periodic
FEM adds wrap offsets). On TPU a gather-based SpMV wastes the machine —
random HBM access defeats the wide vector loads. In DIA form,

    y = sum_d  diag_d * shift(x, d)

is a pure sequence of contiguous reads + VPU multiply-adds with zero gathers:
memory traffic = nnz + (K+1)*N words, all streaming. XLA fuses the whole sum
into one pass; `gnnla_tpu.ops.pallas_spmv` provides the hand-fused Pallas
kernel version of the same loop.

Conversion from `SparseOperator` is a host-side setup op; it keeps the COO
twin for the GN-block (edge-feature) view, so a model can mix edge-level
message passing with DIA-speed SpMVs on the same operator.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnnla_tpu.ops.sparse import SparseOperator

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DIAOperator:
    """Square banded operator: diags[k, i] = A[i, i + offsets[k]].

    diags   : [K, N] — row-major storage; entry (k, i) multiplies x[i + off_k]
    offsets : static tuple of K ints (sorted)
    """

    diags: Array
    offsets: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(default=0, metadata=dict(static=True))
    # nnz = true nonzero count of the source pattern; the dense [K, N] diag
    # storage also holds structural zeros at band boundaries.

    def matvec(self, x: Array) -> Array:
        """y = A @ x with shifted contiguous reads (no gather).

        x may be [N] or [N, m] (SpMM over probe blocks, etc.).
        """
        if x.shape[0] != self.n:
            raise ValueError(f"matvec: x has {x.shape[0]} rows, operator "
                             f"expects {self.n}")

        def col(d):
            return d if x.ndim == 1 else d[:, None]

        y = jnp.zeros_like(x)
        for k, off in enumerate(self.offsets):
            d = self.diags[k]
            if off == 0:
                y = y + col(d) * x
            elif off > 0:
                # row i uses x[i + off] for i in [0, n - off)
                contrib = col(d[: self.n - off]) * x[off:]
                y = y.at[: self.n - off].add(contrib)
            else:
                o = -off
                contrib = col(d[o:]) * x[: self.n - o]
                y = y.at[o:].add(contrib)
        return y

    def __matmul__(self, x: Array) -> Array:
        return self.matvec(x)

    def diagonal(self) -> Array:
        k = self.offsets.index(0)
        return self.diags[k]


def dia_transpose(dia: DIAOperator) -> DIAOperator:
    """A^T in DIA form: AT_diag[offset m][i] = A_diag[offset -m][i + m].

    Pure shifts of the stored diagonals — used by the Pallas SpMV custom
    VJP (the cotangent of y = A x w.r.t. x is A^T ybar, itself a DIA SpMV).
    """
    k, n = dia.diags.shape
    new_offsets = tuple(-o for o in reversed(dia.offsets))
    rows = []
    for m in new_offsets:
        src = dia.diags[dia.offsets.index(-m)]
        if m == 0:
            rows.append(src)
        elif m > 0:
            rows.append(jnp.concatenate(
                [src[m:], jnp.zeros((m,), src.dtype)]))
        else:
            rows.append(jnp.concatenate(
                [jnp.zeros((-m,), src.dtype), src[:m]]))
    return DIAOperator(diags=jnp.stack(rows), offsets=new_offsets, n=dia.n,
                       nnz=dia.nnz)


def to_dia(op: SparseOperator,
           max_offsets: Optional[int] = 4096) -> DIAOperator:
    """Convert a banded SparseOperator to DIA (host-side setup).

    Raises ValueError when the pattern has more distinct offsets than
    `max_offsets` (then the COO/segment-sum path is the right one).
    """
    if op.shape[0] != op.shape[1]:
        raise ValueError("DIA requires a square operator")
    n = op.shape[0]
    rows, cols, vals = op.host_coo()
    offs = cols.astype(np.int64) - rows.astype(np.int64)
    uniq = np.unique(offs)
    if max_offsets is not None and uniq.size > max_offsets:
        raise ValueError(f"pattern has {uniq.size} diagonal offsets "
                         f"(> {max_offsets}); not banded enough for DIA")
    diags = np.zeros((uniq.size, n), dtype=np.float64)
    k_idx = np.searchsorted(uniq, offs)
    np.add.at(diags, (k_idx, rows), vals)
    return DIAOperator(diags=jnp.asarray(diags.astype(np.dtype(op.vals.dtype))),
                       offsets=tuple(int(o) for o in uniq), n=n,
                       nnz=op.nnz)
