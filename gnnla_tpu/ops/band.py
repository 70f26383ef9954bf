"""Band-layout edge storage: the zero-gather aggregation path.

The learned models' hot op is the 4-way (min, mean, sum, max) edge->vertex
aggregation (reference TrainableJacobiGNN.py:65-68,
LearnDiffusionCoeffs.py:303-341, executed there by torch_scatter). On TPU
*any* per-element gather/scatter runs at ~7e7 elem/s (measured, bench.py
`agg4_segment_edges_per_s` / round-3 `coo_segment_edges_per_s`) — two
orders of magnitude under HBM bandwidth — so both the scatter segment path
and the padded-row gather path (`ops.segment.DenseRowLayout`) are
gather-bound.

The fix is a *layout*, not a kernel: store edge data in DIA band form
`bands[k, i] = e(i, i + off_k)` (the same [K, N] layout `ops.dia` uses for
operator values). Then

  * every reduction over a row's edges is a masked reduction over axis 0 —
    pure streaming reads, VPU reductions, zero gathers;
  * the source-vertex value of every edge is a contiguous *shift* of x
    (`band_neighbor_values`), the destination-vertex value is a broadcast;
  * edge-wise MLPs apply elementwise on [K, N, F] exactly as on [E, F].

Packing [E] -> [K, N] happens ON THE HOST at setup time (numpy; every
sparsity pattern here is fixed), so the device never sees edge order at
all. Non-banded patterns keep the segment/dense-row twins — every FEM
family in the reference is banded (possibly with periodic wrap offsets,
which are just additional bands).

Semantics match `ops.segment` / torch_scatter exactly: empty rows fill
with 0, mean divides by max(degree, 1). Parity-tested in
tests/test_band.py.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnnla_tpu.ops.sparse import SparseOperator

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BandPattern:
    """Jit-side view of a `BandLayout`: what a GN block needs to run
    band-native (mask/deg as pytree leaves, offsets static).

    The method surface (`neighbor`/`broadcast`/`mask_pads`/`multi`/
    `global_multi`) is shared with `GridPattern`, so GN-block code is
    layout-agnostic.
    """

    mask: Array    # [K, N] bool
    deg: Array     # [N] float, clamped >= 1
    offsets: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    n_edges: int = dataclasses.field(metadata=dict(static=True))

    @property
    def k(self) -> int:
        return len(self.offsets)

    @classmethod
    def from_layout(cls, lay: "BandLayout") -> "BandPattern":
        return cls(mask=jnp.asarray(lay.mask),
                   deg=jnp.asarray(np.maximum(lay.deg, 1), jnp.float32),
                   offsets=lay.offsets, n_edges=lay.n_edges)

    @classmethod
    def from_operator(cls, op: SparseOperator) -> "BandPattern":
        return cls.from_layout(BandLayout(op))

    # ------------------------------------------- GN-block method surface
    def neighbor(self, x: Array) -> Array:
        return band_neighbor_values(x, self.offsets)

    def broadcast(self, y: Array) -> Array:
        return band_broadcast(y, self.k)

    def mask_pads(self, e: Array) -> Array:
        return jnp.where(self.mask[:, :, None], e, 0.0)

    def multi(self, reduces: Sequence[str], e: Array) -> Array:
        return band_multi_reduce(reduces, e, self.mask, self.deg)

    def global_multi(self, reduces: Sequence[str], e: Array) -> Array:
        return band_global_multi(reduces, e, self.mask, self.n_edges)


class GridBandLayout:
    """Stencil-class edge layout for *uniform periodic grid* patterns —
    the diffusion FEM family (`DiffCoeffs/FEM.py` periodic assembly).

    Edges classify by modular (dy, dx) displacement on the h x w grid
    (`ops.pallas_stencil.stencil_classes`); a uniform periodic pattern has
    exactly one edge per (class, vertex), so the [K, N] layout is
    mask-free (no pad slots, no where's, mean = sum/K) and the source
    read is a 2-D `jnp.roll` — strictly cheaper than the general
    `BandLayout` (the periodic wraps otherwise explode into ~2.5x more
    bands than stencil classes). Raises ValueError on non-uniform
    patterns; callers fall back to `BandLayout`.
    """

    __slots__ = ("shifts", "h", "w", "n", "k", "n_edges",
                 "_k_of_edge", "_pos_of_edge")

    def __init__(self, op: SparseOperator, h: int, w: int):
        from gnnla_tpu.ops.pallas_stencil import stencil_classes

        rows, cols, _ = op.host_coo()
        if op.n_rows != h * w:
            raise ValueError(f"n_rows {op.n_rows} != {h}x{w}")
        shifts, k_idx = stencil_classes(rows, cols, h, w)
        k = len(shifts)
        if rows.size != k * h * w:
            raise ValueError(
                f"not uniform: {rows.size} edges != {k} classes x {h * w} "
                f"vertices — use BandLayout")
        cnt = np.zeros((k, h * w), np.int32)
        np.add.at(cnt, (k_idx, rows), 1)
        if not (cnt == 1).all():
            raise ValueError("not uniform: some (class, vertex) slot is "
                             "empty or duplicated — use BandLayout")
        self.shifts = tuple((int(dy), int(dx)) for dy, dx in shifts)
        self.h, self.w = int(h), int(w)
        self.n = h * w
        self.k = k
        self.n_edges = int(rows.size)
        self._k_of_edge = k_idx.astype(np.int64)
        self._pos_of_edge = rows.astype(np.int64)

    def pack(self, vals: np.ndarray) -> np.ndarray:
        """[..., E] edge-order host values -> [..., K, N] class order."""
        vals = np.asarray(vals)
        if vals.shape[-1] != self.n_edges:
            raise ValueError(f"pack: last axis {vals.shape[-1]} != "
                             f"n_edges {self.n_edges}")
        out = np.zeros(vals.shape[:-1] + (self.k, self.n), vals.dtype)
        out[..., self._k_of_edge, self._pos_of_edge] = vals
        return out

    def unpack(self, bands: np.ndarray) -> np.ndarray:
        bands = np.asarray(bands)
        return bands[..., self._k_of_edge, self._pos_of_edge]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GridPattern:
    """Jit-side view of a `GridBandLayout` (all-static pytree; the layout
    has no mask/deg arrays). Same method surface as `BandPattern`."""

    shifts: Tuple[Tuple[int, int], ...] = dataclasses.field(
        metadata=dict(static=True))
    h: int = dataclasses.field(metadata=dict(static=True))
    w: int = dataclasses.field(metadata=dict(static=True))

    @property
    def k(self) -> int:
        return len(self.shifts)

    @property
    def n_edges(self) -> int:
        return self.k * self.h * self.w

    @classmethod
    def from_layout(cls, lay: GridBandLayout) -> "GridPattern":
        return cls(shifts=lay.shifts, h=lay.h, w=lay.w)

    # ------------------------------------------- GN-block method surface
    def neighbor(self, x: Array) -> Array:
        """out[k, i] = x[neighbor of i in class k] via 2-D rolls."""
        f = x.shape[1:]
        x2 = x.reshape((self.h, self.w) + f)
        outs = [jnp.roll(x2, (-dy, -dx), axis=(0, 1))
                for dy, dx in self.shifts]
        return jnp.stack(outs, axis=0).reshape((self.k, self.h * self.w)
                                               + f)

    def broadcast(self, y: Array) -> Array:
        return band_broadcast(y, self.k)

    def mask_pads(self, e: Array) -> Array:
        return e  # no pad slots

    def multi(self, reduces: Sequence[str], e: Array) -> Array:
        """[K, N, F] -> [N, len(reduces)*F]; uniform degree K."""
        e3 = e if e.ndim == 3 else e[:, :, None]
        outs = []
        s = None
        for r in reduces:
            if r in ("sum", "mean"):
                if s is None:
                    s = jnp.sum(e3, axis=0)
                outs.append(s if r == "sum" else s / self.k)
            elif r == "max":
                outs.append(jnp.max(e3, axis=0))
            elif r == "min":
                outs.append(jnp.min(e3, axis=0))
            else:
                raise ValueError(f"unknown reducer {r!r}")
        return jnp.concatenate(outs, axis=-1)

    def global_multi(self, reduces: Sequence[str], e: Array) -> Array:
        e3 = e if e.ndim == 3 else e[:, :, None]
        outs = []
        s = None
        for r in reduces:
            if r in ("sum", "mean"):
                if s is None:
                    s = jnp.sum(e3, axis=(0, 1))
                outs.append(s if r == "sum" else s / self.n_edges)
            elif r == "max":
                outs.append(jnp.max(e3, axis=(0, 1)))
            elif r == "min":
                outs.append(jnp.min(e3, axis=(0, 1)))
            else:
                raise ValueError(f"unknown reducer {r!r}")
        return jnp.concatenate(outs, axis=-1)


class BandLayout:
    """Host-side band layout of a fixed sparsity pattern.

    Built once from host COO; `pack` shuffles edge-order value arrays into
    [K, N] band order with numpy (free at setup time). The jit-side
    consumers (`band_multi_reduce`, `band_neighbor_values`) take the
    packed arrays plus `mask`/`deg` as explicit arguments so callers
    control whether they ride as jit arguments (large patterns) or trace
    constants (small training buckets).
    """

    __slots__ = ("offsets", "mask", "deg", "n", "k", "n_edges",
                 "_band_of_edge", "_col_of_edge")

    def __init__(self, op: SparseOperator):
        rows, cols, _ = op.host_coo()
        n = op.n_rows
        offs = cols.astype(np.int64) - rows.astype(np.int64)
        uniq = np.unique(offs) if offs.size else np.zeros(1, np.int64)
        k = int(uniq.size)
        band_of_edge = np.searchsorted(uniq, offs).astype(np.int64)
        mask = np.zeros((k, n), bool)
        mask[band_of_edge, rows] = True
        if int(mask.sum()) != rows.size:
            raise ValueError("duplicate edges: coalesce the operator "
                             "before building a BandLayout")
        self.offsets: Tuple[int, ...] = tuple(int(o) for o in uniq)
        self.mask = mask
        self.deg = np.bincount(rows, minlength=n).astype(np.int32)
        self.n = int(n)
        self.k = k
        self.n_edges = int(rows.size)
        self._band_of_edge = band_of_edge
        self._col_of_edge = rows.astype(np.int64)

    # ------------------------------------------------------------- host
    def pack(self, vals: np.ndarray) -> np.ndarray:
        """[..., E] edge-order host values -> [..., K, N] band order.

        Pad slots (mask False) are zero.
        """
        vals = np.asarray(vals)
        if vals.shape[-1] != self.n_edges:
            raise ValueError(f"pack: last axis {vals.shape[-1]} != "
                             f"n_edges {self.n_edges}")
        out = np.zeros(vals.shape[:-1] + (self.k, self.n), vals.dtype)
        out[..., self._band_of_edge, self._col_of_edge] = vals
        return out

    def unpack(self, bands: np.ndarray) -> np.ndarray:
        """[..., K, N] band order -> [..., E] edge order (host)."""
        bands = np.asarray(bands)
        return bands[..., self._band_of_edge, self._col_of_edge]


def band_shift(x: Array, off: int) -> Array:
    """Value of x at index i + off, 0 outside [0, n) — the band-k source
    read (`ops.dia.DIAOperator.matvec`'s shift, exposed for GN blocks).

    x may be [N] or [N, F]; shifts along axis 0.
    """
    if off == 0:
        return x
    n = x.shape[0]
    zero_shape = (min(abs(off), n),) + x.shape[1:]
    z = jnp.zeros(zero_shape, x.dtype)
    if off > 0:
        return jnp.concatenate([x[off:], z], axis=0) if off < n else \
            jnp.zeros_like(x)
    o = -off
    return jnp.concatenate([z, x[:n - o]], axis=0) if o < n else \
        jnp.zeros_like(x)


def band_neighbor_values(x: Array, offsets: Sequence[int]) -> Array:
    """Source-vertex values per band: out[k, i] = x[i + off_k] (0 outside).

    The gather-free x[cols] : [N] or [N, F] -> [K, N] or [K, N, F].
    """
    return jnp.stack([band_shift(x, o) for o in offsets], axis=0)


def band_broadcast(y: Array, k: int) -> Array:
    """Destination-vertex values per band: out[k, i] = y[i].

    [N] or [N, F] -> [K, N] or [K, N, F].
    """
    return jnp.broadcast_to(y[None], (k,) + y.shape)


def band_multi_reduce(reduces: Sequence[str], bands: Array, mask: Array,
                      deg: Array) -> Array:
    """Concatenated masked reductions over the band axis.

    bands : [K, N] or [K, N, F] (pad slots may hold anything)
    mask  : [K, N] bool (True on real edges)
    deg   : [N] float (row degree; clamped to >= 1 internally)
    returns [N, len(reduces) * F] (F = 1 for 2-d input), matching
    `ops.segment.multi_segment_reduce` semantics (empty rows -> 0).
    """
    b3 = bands if bands.ndim == 3 else bands[:, :, None]
    m3 = mask[:, :, None]
    outs = []
    s = None
    for r in reduces:
        if r in ("sum", "mean"):
            if s is None:
                s = jnp.sum(jnp.where(m3, b3, 0.0), axis=0)
            outs.append(s if r == "sum"
                        else s / jnp.maximum(deg, 1)[:, None])
        elif r == "max":
            out = jnp.max(jnp.where(m3, b3, -jnp.inf), axis=0)
            outs.append(jnp.where(jnp.isneginf(out),
                                  jnp.zeros_like(out), out))
        elif r == "min":
            out = jnp.min(jnp.where(m3, b3, jnp.inf), axis=0)
            outs.append(jnp.where(jnp.isposinf(out),
                                  jnp.zeros_like(out), out))
        else:
            raise ValueError(f"unknown reducer {r!r}")
    return jnp.concatenate(outs, axis=-1)


def band_global_multi(reduces: Sequence[str], bands: Array, mask: Array,
                      n_edges: int) -> Array:
    """Whole-graph edge aggregation (rho^{e->g}) in band layout.

    [K, N, F] -> [len(reduces) * F], matching the single-graph
    `core.block.NodeAggregator` semantics (mean divides by the real edge
    count).
    """
    b3 = bands if bands.ndim == 3 else bands[:, :, None]
    m3 = mask[:, :, None]
    outs = []
    s = None
    for r in reduces:
        if r in ("sum", "mean"):
            if s is None:
                s = jnp.sum(jnp.where(m3, b3, 0.0), axis=(0, 1))
            outs.append(s if r == "sum" else s / max(n_edges, 1))
        elif r == "max":
            outs.append(jnp.max(jnp.where(m3, b3, -jnp.inf), axis=(0, 1)))
        elif r == "min":
            outs.append(jnp.min(jnp.where(m3, b3, jnp.inf), axis=(0, 1)))
        else:
            raise ValueError(f"unknown reducer {r!r}")
    return jnp.concatenate(outs, axis=-1)


class EllLayout:
    """Slot-per-neighbor [K, N] edge layout — the zero-gather aggregation
    path for UNSTRUCTURED patterns (k-NN / meshfree graphs, where
    `BandLayout`'s K = #unique diagonal offsets explodes to thousands).

    K = max row degree; the edges of row i occupy slots 0..deg[i]-1 in CSR
    order, so the pad mask is simply `slot < deg[i]` — generated on the fly
    inside jit from the [N] degree vector (one int32 stream) instead of a
    [K, N] bool array. The 4-way (min, mean, sum, max) edge->vertex
    aggregation (reference TrainableJacobiGNN.py:65-68,
    LearnDiffusionCoeffs.py:303-341, torch_scatter there) is then a masked
    reduction over axis 0: pure streaming reads, VPU reductions, ZERO
    gathers. Packing [E] -> [K, N] happens on the host at setup
    (fixed sparsity patterns), exactly like `BandLayout.pack`.

    The source-vertex read (`EllPattern.neighbor`) is the one op that
    stays a gather here (x[cols], no shift structure to exploit) — but the
    aggregation, the broadcast, and the edge MLPs are all layout-native.
    """

    __slots__ = ("n", "k", "n_edges", "deg", "cols_ell",
                 "_slot_of_edge", "_row_of_edge")

    def __init__(self, rows: np.ndarray, cols: np.ndarray, n_vertices: int):
        rows = np.asarray(rows)
        cols = np.asarray(cols)
        n = int(n_vertices)
        n_edges = int(rows.shape[0])
        deg = np.bincount(rows, minlength=n).astype(np.int32)
        k = int(deg.max()) if n_edges else 1
        starts = np.zeros(n + 1, np.int64)
        np.cumsum(deg, out=starts[1:])
        if n_edges and bool((np.diff(rows) >= 0).all()):
            slot = np.arange(n_edges, dtype=np.int64) - starts[rows]
        else:
            order = np.argsort(rows, kind="stable")
            slot = np.empty(n_edges, np.int64)
            slot[order] = np.arange(n_edges, dtype=np.int64) - \
                starts[rows[order]]
        cols_ell = np.zeros((k, n), np.int32)   # pad slots point at 0
        cols_ell[slot, rows] = cols.astype(np.int32)
        self.n = n
        self.k = max(k, 1)
        self.n_edges = n_edges
        self.deg = deg
        self.cols_ell = cols_ell
        self._slot_of_edge = slot
        self._row_of_edge = rows.astype(np.int64)

    @classmethod
    def from_operator(cls, op: SparseOperator) -> "EllLayout":
        rows, cols, _ = op.host_coo()
        return cls(rows, cols, op.n_rows)

    # ------------------------------------------------------------- host
    def pack(self, vals: np.ndarray) -> np.ndarray:
        """[..., E] edge-order host values -> [..., K, N] slot order.

        Pad slots (slot >= deg) are zero.
        """
        vals = np.asarray(vals)
        if vals.shape[-1] != self.n_edges:
            raise ValueError(f"pack: last axis {vals.shape[-1]} != "
                             f"n_edges {self.n_edges}")
        out = np.zeros(vals.shape[:-1] + (self.k, self.n), vals.dtype)
        out[..., self._slot_of_edge, self._row_of_edge] = vals
        return out

    def unpack(self, slots: np.ndarray) -> np.ndarray:
        slots = np.asarray(slots)
        return slots[..., self._slot_of_edge, self._row_of_edge]


def ell_mask(k: int, deg: Array) -> Array:
    """[K, N] bool pad mask from the [N] int degree vector (fused by XLA
    into whatever reduction consumes it — no [K, N] memory stream)."""
    return jax.lax.broadcasted_iota(jnp.int32, (k, deg.shape[0]), 0) \
        < deg[None, :]


def ell_multi_reduce(reduces: Sequence[str], slots: Array,
                     deg: Array) -> Array:
    """Concatenated masked reductions over the slot axis.

    slots : [K, N] or [K, N, F] (pad slots may hold anything)
    deg   : [N] int32 row degrees
    returns [N, len(reduces) * F], matching
    `ops.segment.multi_segment_reduce` semantics (empty rows -> 0).
    """
    k = slots.shape[0]
    m = ell_mask(k, deg)
    degf = jnp.maximum(deg, 1).astype(
        slots.dtype if jnp.issubdtype(slots.dtype, jnp.floating)
        else jnp.float32)
    return band_multi_reduce(reduces, slots, m, degf)


def ell_global_multi(reduces: Sequence[str], slots: Array, deg: Array,
                     n_edges: int) -> Array:
    k = slots.shape[0]
    return band_global_multi(reduces, slots, ell_mask(k, deg), n_edges)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EllPattern:
    """Jit-side view of an `EllLayout`. Same GN-block method surface as
    `BandPattern` / `GridPattern`, so block code is layout-agnostic.
    `cols`/`deg` ride as pytree leaves (jit arguments for big patterns)."""

    cols: Array    # [K, N] int32 (pad slots -> 0)
    deg: Array     # [N] int32
    n_edges: int = dataclasses.field(metadata=dict(static=True))

    @property
    def k(self) -> int:
        return self.cols.shape[0]

    @classmethod
    def from_layout(cls, lay: EllLayout) -> "EllPattern":
        return cls(cols=jnp.asarray(lay.cols_ell),
                   deg=jnp.asarray(lay.deg), n_edges=lay.n_edges)

    @classmethod
    def from_operator(cls, op: SparseOperator) -> "EllPattern":
        return cls.from_layout(EllLayout.from_operator(op))

    # ------------------------------------------- GN-block method surface
    def neighbor(self, x: Array) -> Array:
        return x[self.cols]          # [K, N] (+feature axes) gather

    def broadcast(self, y: Array) -> Array:
        return band_broadcast(y, self.k)

    def mask_pads(self, e: Array) -> Array:
        return jnp.where(ell_mask(self.k, self.deg)[:, :, None], e, 0.0)

    def multi(self, reduces: Sequence[str], e: Array) -> Array:
        return ell_multi_reduce(reduces, e, self.deg)

    def global_multi(self, reduces: Sequence[str], e: Array) -> Array:
        return ell_global_multi(reduces, e, self.deg, self.n_edges)


# cap on ELL slot count (K_max * N): 2^28 slots = 1 GiB of f32 per edge
# feature — beyond this a degree-skewed pattern must not silently OOM
ELL_MAX_SLOTS = 1 << 28


def choose_edge_layout(op: SparseOperator, grid_shape=None):
    """Pick the cheapest zero-gather edge layout for a fixed pattern.

    Returns (layout, pattern, kind) with kind in {"grid", "band", "ell"}:
      grid  uniform periodic grid pattern (mask-free, roll neighbor reads)
      band  banded pattern whose #unique-offsets is within 4x the max
            degree (shift neighbor reads, masked reduce)
      ell   everything else — unstructured graphs, where the diagonal-
            offset count explodes; slot-per-neighbor layout (gather
            neighbor reads, zero-gather reduce)

    A non-uniform pattern that *requested* grid_shape logs a warning
    (the fallback costs ~2x edge storage — a production run should know).
    """
    import warnings

    if grid_shape is not None:
        try:
            lay = GridBandLayout(op, *grid_shape)
            return lay, GridPattern.from_layout(lay), "grid"
        except ValueError as e:
            warnings.warn(
                f"grid layout requested but pattern is not uniform "
                f"({e}); falling back to a masked layout (~2x edge "
                f"storage)", stacklevel=2)
    rows, cols, _ = op.host_coo()
    n_offsets = int(np.unique(cols.astype(np.int64)
                              - rows.astype(np.int64)).size) if rows.size \
        else 1
    max_deg = int(np.bincount(rows, minlength=op.n_rows).max()) \
        if rows.size else 1
    if n_offsets <= 4 * max_deg:
        lay = BandLayout(op)
        return lay, BandPattern.from_layout(lay), "band"
    # ELL memory is K_max x N slots; a single hub row on a degree-skewed
    # graph would blow it up. Fail loudly with guidance instead of OOMing.
    if max_deg * op.n_rows > ELL_MAX_SLOTS:
        raise ValueError(
            f"ELL layout would allocate {max_deg} x {op.n_rows} = "
            f"{max_deg * op.n_rows:.2e} slots for {op.nnz} edges (max "
            f"row degree {max_deg} dominates). This degree-skewed "
            "pattern has no zero-gather layout here yet — run the "
            "edge-order path (ops.segment / make_edge_aggregator), or "
            "split the hub rows before building the layout.")
    lay = EllLayout(rows, cols, op.n_rows)
    return lay, EllPattern.from_layout(lay), "ell"


def band_spmv(bands: Array, offsets: Sequence[int], x: Array) -> Array:
    """y = A @ x from band-layout values — sum_k bands_k * shift(x, off_k).

    Identical to `ops.dia.DIAOperator.matvec` numerics; provided so
    GN-style code holding edge data in band layout can also apply the
    operator without rebuilding a DIAOperator (pad slots must be 0, which
    `BandLayout.pack` guarantees).
    """
    y = jnp.zeros_like(x)
    for kk, off in enumerate(offsets):
        d = bands[kk] if x.ndim == 1 else bands[kk][:, None]
        y = y + d * band_shift(x, off)
    return y
