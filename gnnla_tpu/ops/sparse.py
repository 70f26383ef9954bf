"""HBM-resident sparse operators as JAX pytrees.

The reference stores matrices as torch sparse COO tensors and edge lists
(/root/reference/pytorch/UtilsGNN.py:53-78, TrainableJacobiDiag/Data.py:216-283).
Here the matrix *is* the graph: a `SparseOperator` is a registered pytree of
device arrays (rows, cols, vals) sorted by row, with static shape metadata, so
it can flow through `jit`, `grad`, `vmap` and `shard_map` unchanged.

Key choices for TPU:
  * row-sorted COO is the canonical layout — segment reductions over the row
    index become linear scans (`indices_are_sorted=True`),
  * a CSR row-pointer array is carried alongside for kernels that need it
    (Pallas ELL conversion, partitioning),
  * construction/coalescing happens on host in numpy (setup phase); everything
    after construction is pure JAX,
  * SpMV is `gather -> multiply -> segment_sum`, which XLA fuses into a single
    scatter-add pass; `ops.pallas_spmv` provides the hand-fused ELL fast path.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnnla_tpu.ops.segment import segment_sum

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SparseOperator:
    """Square (or rectangular) sparse matrix in row-sorted COO + row pointers.

    rows, cols : int32 [nnz]    row/col index per nonzero (sorted by row, then col)
    vals       : float  [nnz]   nonzero values
    row_ptr    : int32 [n_rows+1] CSR offsets (derived, carried for kernels)
    shape      : static (n_rows, n_cols)
    """

    rows: Array
    cols: Array
    vals: Array
    row_ptr: Array
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))

    # ---------------------------------------------------------------- alias
    @property
    def n_rows(self) -> int:
        return self.shape[0]

    @property
    def n_cols(self) -> int:
        return self.shape[1]

    @property
    def nnz(self) -> int:
        return self.rows.shape[0]

    @property
    def senders(self) -> Array:
        """Graph view: edge (i, j) aggregates into vertex i (the row)."""
        return self.rows

    @property
    def receivers(self) -> Array:
        """Graph view: edge (i, j) reads features of vertex j (the column)."""
        return self.cols

    # ---------------------------------------------------------- construction
    @staticmethod
    def from_coo(rows, cols, vals, shape, *, dtype=jnp.float32,
                 coalesce: bool = True) -> "SparseOperator":
        """Build from host COO triplets (numpy or lists). Sorts by (row, col)
        and sums duplicates, mirroring torch's `coalesce`
        (reference UtilsGNN.py:74-78)."""
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals, dtype=np.float64)
        if coalesce:
            # lexsort by (row, col); merge duplicates by summation
            key = rows * shape[1] + cols
            order = np.argsort(key, kind="stable")
            key, rows, cols, vals = key[order], rows[order], cols[order], vals[order]
            uniq, inverse = np.unique(key, return_inverse=True)
            summed = np.zeros(uniq.shape[0], dtype=np.float64)
            np.add.at(summed, inverse, vals)
            rows = (uniq // shape[1])
            cols = (uniq % shape[1])
            vals = summed
        row_ptr = np.zeros(shape[0] + 1, dtype=np.int64)
        np.add.at(row_ptr, rows + 1, 1)
        row_ptr = np.cumsum(row_ptr)
        # dtype conversion happens in NUMPY first: jnp.asarray with a
        # dtype change compiles a convert program per distinct shape
        # (0.4 s each on the tunneled remote compiler — multilevel setups
        # paid 37 of these in round 3); same-dtype asarray is a pure
        # device_put.
        out = SparseOperator(
            rows=jnp.asarray(rows.astype(np.int32)),
            cols=jnp.asarray(cols.astype(np.int32)),
            vals=jnp.asarray(np.asarray(vals, np.dtype(dtype))),
            row_ptr=jnp.asarray(row_ptr.astype(np.int32)),
            shape=(int(shape[0]), int(shape[1])),
        )
        # Cache the host-side COO triplets on the instance (NOT a pytree
        # field — jit-reconstructed copies simply lack it). Host-phase ops
        # (AMG setup, DIA conversion, scipy export) read this instead of
        # pulling device arrays back: on the tunneled TPU backend the first
        # device->host transfer of a process costs minutes, so the setup
        # path must never be the one to trigger it.
        object.__setattr__(out, "_host_coo",
                           (rows.astype(np.int64), cols.astype(np.int64),
                            np.asarray(vals, dtype=np.float64)))
        return out

    @staticmethod
    def from_scipy(A, *, dtype=jnp.float32) -> "SparseOperator":
        coo = A.tocoo()
        return SparseOperator.from_coo(coo.row, coo.col, coo.data, coo.shape,
                                       dtype=dtype)

    @staticmethod
    def from_dense(A, *, dtype=jnp.float32, tol: float = 0.0) -> "SparseOperator":
        A = np.asarray(A)
        rows, cols = np.nonzero(np.abs(A) > tol)
        return SparseOperator.from_coo(rows, cols, A[rows, cols], A.shape,
                                       dtype=dtype)

    # ------------------------------------------------------------- export
    def host_coo(self):
        """(rows, cols, vals) as host numpy arrays — cached at construction.

        Falls back to a device->host transfer (and re-caches) only for
        operators that were rebuilt inside a transform.
        """
        h = getattr(self, "_host_coo", None)
        if h is None:
            h = (np.asarray(self.rows, dtype=np.int64),
                 np.asarray(self.cols, dtype=np.int64),
                 np.asarray(self.vals, dtype=np.float64))
            object.__setattr__(self, "_host_coo", h)
        return h

    def host_diagonal(self) -> np.ndarray:
        """diag(A) as a host numpy vector (setup-phase twin of diagonal())."""
        rows, cols, vals = self.host_coo()
        n = min(self.shape)
        d = np.zeros(n, dtype=np.float64)
        m = rows == cols
        np.add.at(d, rows[m], vals[m])
        return d

    def to_scipy(self):
        import scipy.sparse as sp
        rows, cols, vals = self.host_coo()
        return sp.coo_matrix((vals, (rows, cols)), shape=self.shape).tocsr()

    def to_dense(self) -> Array:
        out = jnp.zeros(self.shape, dtype=self.vals.dtype)
        return out.at[self.rows, self.cols].add(self.vals)

    # ------------------------------------------------------------- algebra
    def matvec(self, x: Array) -> Array:
        """y = A @ x for x of shape [n_cols] or [n_cols, K].

        The GN-block reading: edge update c_ij = A_ij * x_j followed by the
        row-wise segment-sum aggregation (reference MatVecGNN.py:43-84).
        """
        if x.shape[0] != self.n_cols:
            raise ValueError(
                f"matvec: x has leading dim {x.shape[0]}, operator expects "
                f"{self.n_cols} (shape {self.shape})")
        gathered = x[self.cols]          # [nnz] or [nnz, K]
        if gathered.ndim > 1:
            products = gathered * self.vals[:, None]
        else:
            products = gathered * self.vals
        return segment_sum(products, self.rows, self.n_rows, is_sorted=True)

    def __matmul__(self, x: Array) -> Array:
        return self.matvec(x)

    def rmatvec(self, y: Array) -> Array:
        """x = A^T @ y without materialising the transpose (scatter by cols)."""
        if y.shape[0] != self.n_rows:
            raise ValueError(
                f"rmatvec: y has leading dim {y.shape[0]}, operator expects "
                f"{self.n_rows} (shape {self.shape})")
        gathered = y[self.rows]
        if gathered.ndim > 1:
            products = gathered * self.vals[:, None]
        else:
            products = gathered * self.vals
        return segment_sum(products, self.cols, self.n_cols, is_sorted=False)

    def sddmm(self, U: Array, V: Array) -> Array:
        """Sampled dense-dense matmul: e_k = <U[rows_k], V[cols_k]>.

        Returns the per-edge values of (U @ V^T) sampled on this pattern —
        the standard GNN companion kernel to SpMM (FusedMM-style fusion:
        XLA fuses the two gathers with the contraction into one pass).
        U: [n_rows, F], V: [n_cols, F] -> [nnz].
        """
        if U.ndim == 1:
            U = U[:, None]
        if V.ndim == 1:
            V = V[:, None]
        return jnp.sum(U[self.rows] * V[self.cols], axis=-1)

    def diagonal(self) -> Array:
        """Dense diagonal vector (zeros where the diagonal is not stored)."""
        n = min(self.shape)
        is_diag = self.rows == self.cols
        contrib = jnp.where(is_diag, self.vals, jnp.zeros_like(self.vals))
        idx = jnp.where(is_diag, self.rows, jnp.zeros_like(self.rows))
        # scatter-add: off-diag entries all land on row 0 with value 0
        return jnp.zeros((n,), self.vals.dtype).at[idx].add(contrib)

    def with_values(self, vals: Array) -> "SparseOperator":
        """Same sparsity pattern, new values (a 'pattern view' update).

        When `vals` is host numpy, the host-COO cache carries over; device
        or traced values leave the new operator cache-less (host-phase ops
        on it would trigger a device->host pull)."""
        out = dataclasses.replace(self, vals=jnp.asarray(vals))
        if isinstance(vals, np.ndarray):
            h = getattr(self, "_host_coo", None)
            if h is not None:
                object.__setattr__(
                    out, "_host_coo",
                    (h[0], h[1], np.asarray(vals, dtype=np.float64)))
        # the dense-row aggregation layout depends only on the pattern
        lay = getattr(self, "_row_layout", None)
        if lay is not None:
            object.__setattr__(out, "_row_layout", lay)
        return out

    def row_layout(self):
        """Pattern-cached DenseRowLayout (the fast 4-way aggregation path;
        ops/segment.py). Needs host rows: cached host COO, or a concrete
        (non-traced) rows array as the one-time fallback."""
        lay = getattr(self, "_row_layout", None)
        if lay is None:
            from gnnla_tpu.ops.segment import DenseRowLayout
            h = getattr(self, "_host_coo", None)
            rows = h[0] if h is not None else np.asarray(self.rows)
            lay = DenseRowLayout(rows, self.n_rows)
            object.__setattr__(self, "_row_layout", lay)
        return lay

    def scale(self, s) -> "SparseOperator":
        out = self.with_values(self.vals * s)
        h = getattr(self, "_host_coo", None)
        if h is not None and isinstance(s, (int, float)):
            object.__setattr__(out, "_host_coo", (h[0], h[1], h[2] * s))
        return out

    # ------------------------------------------------------- pattern views
    def remove_diagonal(self) -> "SparseOperator":
        """Return the operator restricted to off-diagonal entries.

        SOC and direct interpolation operate on the diagonal-removed pattern
        (reference UtilsGNN.py:69-72, VCycle.py:80,97). Host-side: changes nnz,
        so this is a setup-phase op.
        """
        rows, cols, vals = self.host_coo()
        keep = rows != cols
        return SparseOperator.from_coo(rows[keep], cols[keep], vals[keep],
                                       self.shape, dtype=self.vals.dtype,
                                       coalesce=False)

    def eliminate_zeros(self, tol: float = 0.0) -> "SparseOperator":
        """Drop stored zeros (host-side; changes the pattern).

        Note the reference's Laplacian fixture *keeps* explicit zeros (scipy
        kron emits them, UtilsGNN.py:56-60, and torch coalesce preserves
        them), so conversions here default to preserving storage; call this
        to get the tight pattern.
        """
        rows, cols, vals = self.host_coo()
        keep = np.abs(vals) > tol
        return SparseOperator.from_coo(
            rows[keep], cols[keep], vals[keep], self.shape,
            dtype=self.vals.dtype, coalesce=False)

    def transpose(self) -> "SparseOperator":
        """A^T with re-sorted row-major layout (host-side setup op)."""
        rows, cols, vals = self.host_coo()
        return SparseOperator.from_coo(
            cols, rows, vals, (self.shape[1], self.shape[0]),
            dtype=self.vals.dtype, coalesce=True)
