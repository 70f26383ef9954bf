"""Stream-kernel operator protocol: the general-graph fast path as a
drop-in operator.

The reference reaches its hot scatter kernel from EVERY model — each
MetaLayer instantiation in /root/reference/pytorch/VCycle.py:175-237 runs
`torch_scatter.scatter` over the same edge list (MatVecGNN.py:43-62).
Here the equivalent reach is this wrapper: `StreamOperator` satisfies the
matvec/rmatvec/diagonal protocol the fused solver paths consume
(models.jacobi/chebyshev/power_method/residual, models.vcycle), so
`models.vcycle.setup_with_stream` swaps it in exactly like
`setup_with_dia` swaps in the banded twin.

Layout: the kernel operates on the RCM-permuted operator (RCM bounds the
per-tile column windows the kernel DMAs — see ops/pallas_stream.py);
matvec/rmatvec gather caller-order vectors into kernel order and back.
Those are two [n]-sized gathers per apply — far less irregular traffic
than the COO path's nnz-sized gather + scatter, and nothing at all when
the caller keeps its vectors in kernel order (`reorder=False` on an
already-ordered operator, or iterate via `apply_fn` on the padded
superchunk layout directly, as bench.py does).

Backends: "pallas" (TPU hardware / interpret=True) or "emulate" (the
numpy emulator behind `jax.pure_callback` — jittable, scan-safe; CI
parity tests of solver compositions run on this).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnnla_tpu.ops.pallas_stream import StreamSpMV, rcm_csr


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StreamOperator:
    """Square sparse operator backed by the stream SpMV kernel (pytree).

    op_args      : (fwd pack, transposed pack) of device arrays — the
                   kernel's operator data, threaded through jit as
                   arguments (children of this pytree)
    perm / iperm : caller order <-> kernel (RCM) order maps, or None
    diag         : [n] diagonal in caller order (host-extracted at build)
    apply_fn     : compiled (op_args, x3) -> y3 on the padded superchunk
                   layout (differentiable; see StreamSpMV)
    apply_t_fn   : transposed twin (rmatvec)
    """

    op_args: Tuple
    perm: Optional[jax.Array]
    iperm: Optional[jax.Array]
    diag: jax.Array
    apply_fn: Callable = dataclasses.field(metadata=dict(static=True))
    apply_t_fn: Optional[Callable] = dataclasses.field(
        metadata=dict(static=True))
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    padded_len: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_rows(self) -> int:
        return self.shape[0]

    @property
    def n_cols(self) -> int:
        return self.shape[1]

    # ------------------------------------------------------ padded layout
    def to_padded(self, xk):
        """Kernel-order [n] -> padded superchunk [L/1024, 8, 128]."""
        pad = self.padded_len - self.n_rows
        return jnp.pad(xk, (0, pad)).reshape(-1, 8, 128)

    def from_padded(self, x3):
        return x3.reshape(-1)[: self.n_rows]

    # ------------------------------------------------------------ algebra
    def matvec(self, x):
        """y = A @ x on caller-order [n] vectors."""
        if x.ndim > 1:
            raise ValueError("stream operator matvec is vector-only; "
                             "use ops.pallas_stream.StreamSpMM for "
                             "multi-column X (shared-pack SpMM) or the "
                             "COO path")
        xk = x[self.perm] if self.perm is not None else x
        yk = self.from_padded(self.apply_fn(self.op_args,
                                            self.to_padded(xk)))
        return yk[self.iperm] if self.iperm is not None else yk

    def __matmul__(self, x):
        return self.matvec(x)

    def rmatvec(self, y):
        """x = A^T @ y (kernel on the transposed pack; B^T = P A^T P^T)."""
        if self.apply_t_fn is None:
            raise ValueError("built without the transposed pack")
        if y.ndim > 1:
            raise ValueError("stream operator rmatvec is vector-only")
        yk = y[self.perm] if self.perm is not None else y
        xk = self.from_padded(self.apply_t_fn(self.op_args,
                                              self.to_padded(yk)))
        return xk[self.iperm] if self.iperm is not None else xk

    def diagonal(self):
        return self.diag


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RectStreamOperator:
    """RECTANGULAR operator on the stream kernel via the square
    embedding: an [n x nc] matrix (nc <= n) is packed as an [n x n]
    square whose columns beyond nc are empty — the kernel's per-tile
    column windows track the sloped band of a prolongation P just like
    any other pattern, so no rectangular kernel support is needed.

    matvec  : [nc] -> [n]  (P apply; x zero-padded into the square
              column space)
    rmatvec : [n] -> [nc]  (P^T apply; the transposed pack's rows beyond
              nc are empty, output sliced)

    This is what makes the V-cycle's prolongation/restriction run at
    kernel speed instead of the COO gather+scatter path (which measured
    ~36 ms per apply at 2.3M nnz — the dominant cycle cost once A and Ac
    are on the Pallas DIA path; see models/vcycle.setup_with_stream_p).
    """

    op: StreamOperator
    nc: int = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.op.n_rows, self.nc)

    @property
    def n_rows(self) -> int:
        return self.op.n_rows

    @property
    def n_cols(self) -> int:
        return self.nc

    def matvec(self, x):
        if x.ndim > 1:
            raise ValueError("rect stream matvec is vector-only")
        xp = jnp.zeros((self.op.n_cols,), x.dtype).at[:self.nc].set(x)
        return self.op.matvec(xp)

    def __matmul__(self, x):
        return self.matvec(x)

    def rmatvec(self, y):
        return self.op.rmatvec(y)[: self.nc]


def rect_stream_operator(op, n_cols: int, *, nb: int = 32,
                         kb: Optional[int] = None,
                         backend: str = "pallas",
                         interpret: bool = False) -> RectStreamOperator:
    """Build the square-embedded stream twin of an [n x n_cols] operator
    given as an n x n SparseOperator whose columns >= n_cols are empty
    (or as any SparseOperator with shape[1] == shape[0]). No reordering:
    the caller's row/column orders carry rectangular semantics, so the
    pattern must already have bounded per-tile column windows (true for
    interpolation operators in the fine operator's ordering; the packer
    raises ValueError otherwise and callers keep the COO path)."""
    sop = stream_operator(op, reorder=False, nb=nb, kb=kb,
                          backend=backend, interpret=interpret)
    return RectStreamOperator(op=sop, nc=int(n_cols))


def stream_operator(op, *, reorder: bool = True, nb: int = 32,
                    kb: Optional[int] = None, backend: str = "pallas",
                    interpret: bool = False) -> StreamOperator:
    """Build a StreamOperator from a SparseOperator (host setup phase).

    `reorder=True` RCM-permutes internally (correctness in caller order is
    preserved via the perm/iperm gathers); `reorder=False` requires the
    operator to already have bounded column windows per 1024-row tile.
    """
    A = op.to_scipy().tocsr()
    A.sort_indices()
    perm = None
    if reorder:
        A, perm = rcm_csr(A)
    mv = StreamSpMV(A, nb=nb, kb=kb, with_transpose=True,
                    interpret=interpret, backend=backend)
    diag = jnp.asarray(op.host_diagonal(), jnp.float32)
    if perm is not None:
        p = jnp.asarray(perm, jnp.int32)
        ip = jnp.asarray(np.argsort(perm), jnp.int32)
    else:
        p = ip = None
    return StreamOperator(op_args=mv.op_args, perm=p, iperm=ip, diag=diag,
                          apply_fn=mv.apply, apply_t_fn=mv.apply_t,
                          shape=op.shape, nnz=mv.nnz,
                          padded_len=mv.padded_len)
