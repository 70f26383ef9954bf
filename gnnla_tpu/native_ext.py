"""ctypes bindings for the native C++ runtime (native/graphbuild.cpp).

Exposes the host-side setup hot paths — COO coalescing, CSR row pointers,
CLJP splitting — with transparent numpy fallbacks when the shared library
has not been built (`make -C native`). The device compute path never comes
through here; this is the graph-builder/AMG-setup runtime that the reference
gets from torch/pyamg native extensions (SURVEY.md §2.4).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                         "native", "libgnnla_native.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.coalesce_coo.restype = ctypes.c_int64
    lib.coalesce_coo.argtypes = [ctypes.c_int64, i64p, i64p, f64p,
                                 ctypes.c_int64]
    lib.csr_row_ptr.restype = None
    lib.csr_row_ptr.argtypes = [ctypes.c_int64, i64p, ctypes.c_int64, i64p]
    lib.cljp_split.restype = None
    lib.cljp_split.argtypes = [ctypes.c_int64, i64p, i64p, ctypes.c_uint64,
                               i64p]
    if hasattr(lib, "vanek_aggregate"):
        lib.vanek_aggregate.restype = ctypes.c_int64
        lib.vanek_aggregate.argtypes = [ctypes.c_int64, i64p, i64p, i64p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def coalesce_coo(rows, cols, vals, n_cols_matrix: int
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sort by (row, col), sum duplicates. Native when built, numpy else.

    The native routine rewrites its buffers in place, so copy here — callers
    keep their arrays.
    """
    rows = np.array(rows, dtype=np.int64, copy=True)
    cols = np.array(cols, dtype=np.int64, copy=True)
    vals = np.array(vals, dtype=np.float64, copy=True)
    lib = _load()
    if lib is not None:
        n_out = lib.coalesce_coo(
            len(rows), _i64p(rows), _i64p(cols),
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            int(n_cols_matrix))
        return rows[:n_out].copy(), cols[:n_out].copy(), vals[:n_out].copy()
    # numpy fallback (same algorithm as SparseOperator.from_coo)
    key = rows * n_cols_matrix + cols
    order = np.argsort(key, kind="stable")
    key, rows, cols, vals = key[order], rows[order], cols[order], vals[order]
    uniq, inverse = np.unique(key, return_inverse=True)
    summed = np.zeros(uniq.shape[0])
    np.add.at(summed, inverse, vals)
    return (uniq // n_cols_matrix, uniq % n_cols_matrix, summed)


def csr_row_ptr(rows_sorted, n_rows: int) -> np.ndarray:
    rows_sorted = np.ascontiguousarray(rows_sorted, dtype=np.int64)
    lib = _load()
    if lib is not None:
        out = np.zeros(n_rows + 1, dtype=np.int64)
        lib.csr_row_ptr(len(rows_sorted), _i64p(rows_sorted), n_rows,
                        _i64p(out))
        return out
    out = np.zeros(n_rows + 1, dtype=np.int64)
    np.add.at(out, rows_sorted + 1, 1)
    return np.cumsum(out)


def cljp_split(S_csr, seed: int = 0) -> np.ndarray:
    """CLJP splitting; native when built, python fallback otherwise."""
    lib = _load()
    if lib is None:
        from gnnla_tpu.amg.splitting import split_cljp
        return split_cljp(S_csr, seed=seed)
    import scipy.sparse as sp
    S = sp.csr_matrix(S_csr)
    n = S.shape[0]
    indptr = np.ascontiguousarray(S.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(S.indices, dtype=np.int64)
    out = np.zeros(n, dtype=np.int64)
    lib.cljp_split(n, _i64p(indptr), _i64p(indices),
                   ctypes.c_uint64(seed), _i64p(out))
    return out


def vanek_aggregate(G_csr) -> Optional[np.ndarray]:
    """Sequential Vanek aggregation over a symmetrized strength graph
    (native only — returns None when the library isn't built or is an
    older build without the symbol; callers fall back to the numpy
    sequential implementation in amg/aggregation.py)."""
    lib = _load()
    if lib is None or not hasattr(lib, "vanek_aggregate"):
        return None
    import scipy.sparse as sp
    G = sp.csr_matrix(G_csr)
    indptr = np.ascontiguousarray(G.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(G.indices, dtype=np.int64)
    agg = np.full(G.shape[0], -1, dtype=np.int64)
    lib.vanek_aggregate(G.shape[0], _i64p(indptr), _i64p(indices),
                        _i64p(agg))
    return agg
