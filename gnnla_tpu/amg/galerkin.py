"""Galerkin triple product Ac = P^T A P.

The reference computes this with torch sparse matmuls inside every V-cycle
(VCycle.py:209). It is a *pattern-changing* SpGEMM, so in the TPU design it
belongs to the host-side AMG setup phase (computed once per operator, reused
across cycles) — the cycle itself then runs only fixed-pattern device kernels.
scipy's native SpGEMM does the work.
"""

from __future__ import annotations

from gnnla_tpu.ops.sparse import SparseOperator


def galerkin_product(A: SparseOperator, P: SparseOperator,
                     *, dtype=None) -> SparseOperator:
    dtype = dtype or A.vals.dtype
    A_h = A.to_scipy()
    P_h = P.to_scipy()
    Ac = (P_h.T @ A_h @ P_h).tocsr()
    # canonicalize in scipy (C++ in-row sort, no duplicates after
    # sum_duplicates) so from_coo can skip its global argsort+unique
    # coalesce pass — the setup-phase hot spot at >= 1M rows
    Ac.sum_duplicates()
    Ac.sort_indices()
    Ac = Ac.tocoo()
    return SparseOperator.from_coo(Ac.row, Ac.col, Ac.data, Ac.shape,
                                   dtype=dtype, coalesce=False)
