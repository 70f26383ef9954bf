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
    if hasattr(lib, "rcm_order"):
        f32p_ = ctypes.POINTER(ctypes.c_float)
        lib.rcm_order.restype = None
        lib.rcm_order.argtypes = [ctypes.c_int64, i64p, i64p, i64p]
        lib.csr_permute_sym.restype = None
        lib.csr_permute_sym.argtypes = [ctypes.c_int64, i64p, i64p, f32p_,
                                        i64p, i64p, i64p, f32p_]
    if hasattr(lib, "stream_pack_plan"):
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.stream_pack_plan.restype = None
        lib.stream_pack_plan.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64p, i64p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i64p, i64p, i64p]
        lib.stream_pack_fill.restype = None
        lib.stream_pack_fill.argtypes = [
            ctypes.c_int64, ctypes.c_int64, i64p, i64p, f32p,
            ctypes.c_int64, i64p, i64p, i64p,
            i32p, i32p, i32p, i32p, i32p, f32p, i32p]
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


def stream_pack(indptr, cols, vals, n: int, n_cols: int, nb: int,
                kb: Optional[int], min_w_sc: int):
    """Native stream-SpMV packer (graphbuild.cpp::stream_pack_plan/fill).

    Returns a dict of StreamFormat arrays bit-identical to the numpy
    packer in ops/pallas_stream.py::build_stream, or None when the native
    library is unavailable / the input falls outside the native fast path
    (the caller then runs the numpy reference packer).

    Raises ValueError for the same too-wide-window condition the numpy
    packer rejects (status 1), so both paths fail identically.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "stream_pack_plan"):
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    n_tiles = -(-n // 1024)
    header = np.zeros(8, np.int64)
    tile_wstart = np.zeros(n_tiles, np.int64)
    unit_offsets = np.zeros(n_tiles + 1, np.int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.stream_pack_plan(n, n_cols, len(cols), _i64p(indptr), _i64p(cols),
                         nb, -1 if kb is None else int(kb), min_w_sc,
                         _i64p(header), _i64p(tile_wstart),
                         _i64p(unit_offsets))
    status = int(header[5])
    if status == 1:
        lx_tiles = -(-n_cols // 1024)
        raise ValueError(
            f"column window ({int(header[0])} superchunks) exceeds the "
            f"padded vector ({lx_tiles}); matrix too small or ordering too "
            "diffuse for the stream kernel — use the COO path")
    if status != 0:
        return None  # out of native range; numpy fallback
    w_sc, kb_out, _, n_units, n_steps = (int(x) for x in header[:5])
    meta = np.zeros(n_steps * nb, np.int32)
    gmeta = np.zeros(n_units * 8, np.int32)
    step_meta = np.zeros(n_steps * 8, np.int32)
    out_idx = np.zeros(n_steps, np.int32)
    word = np.zeros(n_units * 8 * 128, np.int32)
    vals_out = np.zeros(n_units * 8 * 128, np.float32)
    tile_of_unit = np.zeros(n_units, np.int32)
    lib.stream_pack_fill(
        n, len(cols), _i64p(indptr), _i64p(cols),
        vals.ctypes.data_as(f32p), nb, _i64p(header), _i64p(tile_wstart),
        _i64p(unit_offsets),
        meta.ctypes.data_as(i32p), gmeta.ctypes.data_as(i32p),
        step_meta.ctypes.data_as(i32p), out_idx.ctypes.data_as(i32p),
        word.ctypes.data_as(i32p), vals_out.ctypes.data_as(f32p),
        tile_of_unit.ctypes.data_as(i32p))
    return dict(
        meta=meta.reshape(n_steps, 1, nb),
        gmeta=gmeta.reshape(n_steps, nb * 8 // 128, 128),
        step_meta=step_meta.reshape(n_steps, 1, 8),
        out_idx=out_idx,
        word=word.reshape(n_units, 8, 128),
        vals=vals_out.reshape(n_units, 8, 128),
        tile_of_unit=tile_of_unit,
        tile_wstart=tile_wstart.astype(np.int32),
        w_sc=w_sc, kb=kb_out)


def rcm_order(A_csr) -> Optional[np.ndarray]:
    """Reverse Cuthill-McKee permutation of a symmetric-pattern CSR
    matrix (native/graphbuild.cpp::rcm_order). Returns None when the
    library isn't built; callers fall back to scipy's
    reverse_cuthill_mckee (same George-Liu algorithm)."""
    lib = _load()
    if lib is None or not hasattr(lib, "rcm_order"):
        return None
    n = A_csr.shape[0]
    indptr = np.ascontiguousarray(A_csr.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(A_csr.indices, dtype=np.int64)
    perm = np.zeros(n, dtype=np.int64)
    lib.rcm_order(n, _i64p(indptr), _i64p(indices), _i64p(perm))
    return perm


def csr_permute_sym(A_csr, perm) -> "Optional[object]":
    """B = A[perm][:, perm] with sorted indices, as a scipy CSR (float32).
    OpenMP-parallel native path; None when the library isn't built."""
    lib = _load()
    if lib is None or not hasattr(lib, "csr_permute_sym"):
        return None
    import scipy.sparse as sp
    n = A_csr.shape[0]
    indptr = np.ascontiguousarray(A_csr.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(A_csr.indices, dtype=np.int64)
    data = np.ascontiguousarray(A_csr.data, dtype=np.float32)
    perm = np.ascontiguousarray(perm, dtype=np.int64)
    out_indptr = np.zeros(n + 1, dtype=np.int64)
    out_indices = np.zeros(indices.size, dtype=np.int64)
    out_data = np.zeros(data.size, dtype=np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.csr_permute_sym(n, _i64p(indptr), _i64p(indices),
                        data.ctypes.data_as(f32p), _i64p(perm),
                        _i64p(out_indptr), _i64p(out_indices),
                        out_data.ctypes.data_as(f32p))
    idt = np.int32 if (indices.size < 2 ** 31 and n < 2 ** 31) else np.int64
    B = sp.csr_matrix((out_data, out_indices.astype(idt),
                       out_indptr.astype(idt)), shape=A_csr.shape)
    B.has_sorted_indices = True
    return B


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
