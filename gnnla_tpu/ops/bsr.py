"""BSR (block-sparse row) format — the TPU answer for *general* graphs.

The COO gather/scatter SpMV is scatter-bound on TPU (no vector gather in
hardware; observed ~6e7 edges/s). The DIA path (ops/dia.py) fixes this for
banded operators. For general sparsity the TPU-native restructuring is
block-sparse: partition into B x B dense blocks (B = 128, one MXU/VPU
tile), keep only nonempty blocks, and turn the SpMV into

    gather x tiles  ->  batched dense block matvec  ->  segment-sum tiles

where the gather/scatter now move whole 128-element tiles (coarse,
layout-friendly) and the arithmetic is dense tile work. Storage and traffic
are nb * B^2 words, so efficiency = block density; even at a few percent
density this beats the scatter path by ~2 orders of magnitude, and for
multi-column X (SpMM — the spectral-loss probe blocks) the batched
block-matmul runs on the MXU.

Ordering matters: BSR rewards locality. Use bandwidth-reducing orderings
(the FEM generators' natural orderings are already local; reverse
Cuthill-McKee for arbitrary graphs) to raise block density.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnnla_tpu.ops.segment import segment_sum
from gnnla_tpu.ops.sparse import SparseOperator

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BSROperator:
    """Square block-sparse operator.

    blocks     : [nb, B, B] dense blocks (block k is A[block_rows[k]*B :,
                 block_cols[k]*B :])
    block_rows : [nb] int32, sorted (segment-sum fast path)
    block_cols : [nb] int32
    """

    blocks: Array
    block_rows: Array
    block_cols: Array
    n: int = dataclasses.field(metadata=dict(static=True))
    block_size: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def n_block_rows(self) -> int:
        return -(-self.n // self.block_size)

    def matvec(self, x: Array) -> Array:
        """y = A @ x for x of shape [n] or [n, m].

        Single vector: batched block matvec on the VPU (memory-bound — the
        block stream dominates). Multi-column: batched block matmul on the
        MXU.
        """
        if x.shape[0] != self.n:
            raise ValueError(f"matvec: x has {x.shape[0]} rows, operator "
                             f"expects {self.n}")
        B = self.block_size
        nbr = self.n_block_rows
        pad = nbr * B - self.n
        vec = x.ndim == 1
        x2 = x[:, None] if vec else x
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        xt = x2.reshape(nbr, B, -1)                       # [nbr, B, m]
        gathered = xt[self.block_cols]                    # [nb, B, m]
        prod = jnp.einsum("kij,kjm->kim", self.blocks, gathered,
                          preferred_element_type=self.blocks.dtype)
        y = segment_sum(prod, self.block_rows, nbr, is_sorted=True)
        y = y.reshape(nbr * B, -1)[: self.n]
        return y[:, 0] if vec else y

    def __matmul__(self, x: Array) -> Array:
        return self.matvec(x)

    def diagonal(self) -> Array:
        """diag(A) assembled from the diagonal blocks."""
        B = self.block_size
        is_diag = self.block_rows == self.block_cols
        contrib = jnp.where(is_diag[:, None],
                            jnp.diagonal(self.blocks, axis1=1, axis2=2),
                            0.0)
        out = segment_sum(contrib, self.block_rows, self.n_block_rows,
                          is_sorted=True)
        return out.reshape(-1)[: self.n]


def to_bsr(op: SparseOperator, block_size: int = 128,
           max_blocks: int = 1 << 22) -> BSROperator:
    """Convert to BSR (host-side setup). Raises when the pattern would
    need more than `max_blocks` blocks (then block density is too low for
    BSR to pay off — stay on COO or reorder first)."""
    if op.shape[0] != op.shape[1]:
        raise ValueError("BSR requires a square operator")
    n = op.shape[0]
    B = block_size
    rows, cols, vals = op.host_coo()
    br = rows // B
    bc = cols // B
    key = br * (-(-n // B)) + bc
    uniq, inv = np.unique(key, return_inverse=True)
    nb = uniq.size
    if nb > max_blocks:
        raise ValueError(f"pattern needs {nb} blocks (> {max_blocks})")
    blocks = np.zeros((nb, B, B), dtype=np.float64)
    np.add.at(blocks, (inv, rows % B, cols % B), vals)
    nbc = -(-n // B)
    return BSROperator(
        blocks=jnp.asarray(blocks, op.vals.dtype),
        block_rows=jnp.asarray(uniq // nbc, jnp.int32),
        block_cols=jnp.asarray(uniq % nbc, jnp.int32),
        n=n, block_size=B, nnz=op.nnz)


def rcm_permutation(op: SparseOperator) -> np.ndarray:
    """Reverse Cuthill-McKee ordering (host, scipy) — apply before `to_bsr`
    on arbitrary graphs to concentrate nonzeros near the diagonal."""
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    return np.asarray(reverse_cuthill_mckee(op.to_scipy(), symmetric_mode=False))


def permute(op: SparseOperator, perm: np.ndarray) -> Tuple[SparseOperator,
                                                           np.ndarray]:
    """(P A P^T, inverse permutation) for a symmetric reordering: entry
    (i, j) moves to (inv[i], inv[j]); x/b vectors reorder as x[perm]."""
    rows, cols, vals = op.host_coo()
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    out = SparseOperator.from_coo(inv[rows], inv[cols], vals, op.shape,
                                  dtype=op.vals.dtype)
    return out, inv
