"""Segment reductions — the TPU-native replacement for torch_scatter.

The reference delegates its entire aggregation layer to torch_scatter's C++/CUDA
segment ops (e.g. /root/reference/pytorch/MatVecGNN.py:60,
SOCClassicGNN.py:69, TrainableJacobiGNN.py:65-68). Here the same surface is a
thin set of pure functions over `jax.ops.segment_*`: XLA lowers these to fused
gather/scatter-add on TPU, and they are differentiable (the VJP of a
segment-sum is a gather, which is exactly SpMV-transpose).

All functions take `segment_ids` of shape [E] (the *row* index of each edge in
matrix terms), operate on `data` of shape [E] or [E, F], and return
[num_segments] / [num_segments, F].

Empty segments follow the reference semantics of torch_scatter:
  sum/mean -> 0, max -> 0, min -> 0 (torch_scatter fills empty segments with 0).
JAX fills empty max/min segments with -inf/+inf, so we mask them back to 0.

`indices_are_sorted=True` may be passed when edges are sorted by row (the
`SparseOperator` invariant) — this lets XLA emit a linear segment scan rather
than a generic scatter.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def segment_sum(data: Array, segment_ids: Array, num_segments: int,
                is_sorted: bool = False) -> Array:
    return jax.ops.segment_sum(data, segment_ids, num_segments,
                               indices_are_sorted=is_sorted)


def segment_mean(data: Array, segment_ids: Array, num_segments: int,
                 is_sorted: bool = False) -> Array:
    total = jax.ops.segment_sum(data, segment_ids, num_segments,
                                indices_are_sorted=is_sorted)
    ones = jnp.ones(data.shape[:1], dtype=data.dtype)
    count = jax.ops.segment_sum(ones, segment_ids, num_segments,
                                indices_are_sorted=is_sorted)
    if data.ndim > 1:
        count = jnp.expand_dims(count, tuple(range(1, data.ndim)))
    return total / jnp.maximum(count, 1)


def segment_max(data: Array, segment_ids: Array, num_segments: int,
                is_sorted: bool = False) -> Array:
    out = jax.ops.segment_max(data, segment_ids, num_segments,
                              indices_are_sorted=is_sorted)
    # torch_scatter fills empty segments with 0 — match that so SOC rows with
    # no off-diagonal entries behave identically (SOCClassicGNN.py:69).
    return jnp.where(jnp.isneginf(out), jnp.zeros_like(out), out)


def segment_min(data: Array, segment_ids: Array, num_segments: int,
                is_sorted: bool = False) -> Array:
    out = jax.ops.segment_min(data, segment_ids, num_segments,
                              indices_are_sorted=is_sorted)
    return jnp.where(jnp.isposinf(out), jnp.zeros_like(out), out)


_REDUCERS = {
    "sum": segment_sum,
    "mean": segment_mean,
    "max": segment_max,
    "min": segment_min,
}


def segment_reduce(reduce: str, data: Array, segment_ids: Array,
                   num_segments: int, is_sorted: bool = False) -> Array:
    """Dispatch on reducer name ('sum' | 'mean' | 'max' | 'min')."""
    try:
        fn = _REDUCERS[reduce]
    except KeyError:
        raise ValueError(f"unknown reducer {reduce!r}; "
                         f"expected one of {sorted(_REDUCERS)}") from None
    return fn(data, segment_ids, num_segments, is_sorted=is_sorted)


def multi_segment_reduce(reduces: Sequence[str], data: Array,
                         segment_ids: Array, num_segments: int,
                         is_sorted: bool = False) -> Array:
    """Concatenate several reductions feature-wise.

    The learned models use a fixed 4-way (min, mean, sum, max) aggregation
    (reference: TrainableJacobiGNN.py:53-70, LearnDiffusionCoeffs.py:291-342).
    Input [E, F] -> output [num_segments, len(reduces) * F].
    """
    data2d = data if data.ndim > 1 else data[:, None]
    outs = [segment_reduce(r, data2d, segment_ids, num_segments, is_sorted=is_sorted)
            for r in reduces]
    return jnp.concatenate(outs, axis=-1)


@functools.partial(jax.jit, static_argnames=("num_segments",))
def segment_normalize(data: Array, segment_ids: Array,
                      num_segments: int) -> Array:
    """Divide each element by the L2 norm of its segment."""
    sq = segment_sum(data * data, segment_ids, num_segments)
    norms = jnp.sqrt(sq)
    return data / norms[segment_ids]


class DenseRowLayout:
    """Padded row-major edge layout: the TPU fast path for the learned
    models' 4-way (min, mean, sum, max) edge->vertex aggregation
    (reference TrainableJacobiGNN.py:65-68, LearnDiffusionCoeffs.py:303-341).

    A scatter-based segment reduce is the slowest idiom on TPU (measured
    6.3e7 edges/s vs 9.5e8 on host CPU in round 3). For a *fixed* sparsity
    pattern — every training bucket and every assembled operator — the
    edge list can instead be laid out host-side as a dense [N, K] grid
    (K = max row degree, rows padded with a mask). At run time a single
    static gather (or a pure reshape when all rows have equal degree and
    edges are row-contiguous) produces [N, K, F], and every reduction is a
    vectorized axis reduction; `multi` shares the one gather across all
    four reducers. The VJP of the gather is one scatter-add, shared too.

    Built from *host* numpy rows at setup/trace time. Layout index arrays
    are embedded as program constants, so this path is gated to patterns
    small enough for that to be free (see `make_edge_aggregator`).

    Empty rows follow the torch_scatter fill-with-0 semantics, matching
    the segment_* twins above (parity-tested in tests/test_kernels.py).
    """

    __slots__ = ("n_vertices", "k", "gather_idx", "mask", "deg",
                 "is_reshape", "n_edges")

    def __init__(self, rows: np.ndarray, n_vertices: int):
        rows = np.asarray(rows)
        if rows.ndim != 1:
            raise ValueError("DenseRowLayout needs a 1-d host row array")
        n_edges = rows.shape[0]
        deg = np.bincount(rows, minlength=n_vertices)
        k = int(deg.max()) if n_edges else 1
        sorted_contig = bool((np.diff(rows) >= 0).all()) if n_edges else True
        uniform = bool((deg == k).all())
        self.n_vertices = int(n_vertices)
        self.k = k
        self.n_edges = int(n_edges)
        self.deg = deg.astype(np.int32)
        self.is_reshape = uniform and sorted_contig and n_edges == n_vertices * k
        if self.is_reshape:
            self.gather_idx = None
            self.mask = None
            return
        # slot of each edge within its row (edges need not be row-sorted)
        if sorted_contig:
            starts = np.zeros(n_vertices + 1, np.int64)
            np.cumsum(deg, out=starts[1:])
            slot = np.arange(n_edges, dtype=np.int64) - starts[rows]
        else:
            order = np.argsort(rows, kind="stable")
            slot = np.empty(n_edges, np.int64)
            starts = np.zeros(n_vertices + 1, np.int64)
            np.cumsum(deg, out=starts[1:])
            slot[order] = np.arange(n_edges, dtype=np.int64) - \
                starts[rows[order]]
        gather = np.zeros((n_vertices, k), np.int32)  # pad -> edge 0
        mask = np.zeros((n_vertices, k), bool)
        gather[rows, slot] = np.arange(n_edges, dtype=np.int32)
        mask[rows, slot] = True
        self.gather_idx = gather
        self.mask = mask

    # ------------------------------------------------------------ runtime
    def padded(self, data: Array) -> Array:
        """[E, F] (or [E]) -> [N, K, F] with pad slots zeroed."""
        data2d = data if data.ndim > 1 else data[:, None]
        if self.is_reshape:
            return data2d.reshape(self.n_vertices, self.k, data2d.shape[-1])
        p = data2d[jnp.asarray(self.gather_idx)]
        return jnp.where(jnp.asarray(self.mask)[:, :, None], p,
                         jnp.zeros_like(p))

    def _reduce_all(self, reduces: Sequence[str], data: Array,
                    keep_2d: bool = True) -> Array:
        was_1d = data.ndim == 1
        data2d = data if data.ndim > 1 else data[:, None]
        p = self.padded(data2d)                       # [N, K, F], pads = 0
        outs = []
        s = cnt = None
        if self.is_reshape:
            m3 = None
        else:
            m3 = jnp.asarray(self.mask)[:, :, None]
        for r in reduces:
            if r in ("sum", "mean"):
                if s is None:
                    s = jnp.sum(p, axis=1)
                if r == "sum":
                    outs.append(s)
                else:
                    if cnt is None:
                        cnt = jnp.maximum(
                            jnp.asarray(self.deg, data2d.dtype), 1)[:, None]
                    outs.append(s / cnt)
            elif r == "max":
                q = p if m3 is None else jnp.where(m3, p, -jnp.inf)
                out = jnp.max(q, axis=1)
                outs.append(jnp.where(jnp.isneginf(out),
                                      jnp.zeros_like(out), out))
            elif r == "min":
                q = p if m3 is None else jnp.where(m3, p, jnp.inf)
                out = jnp.min(q, axis=1)
                outs.append(jnp.where(jnp.isposinf(out),
                                      jnp.zeros_like(out), out))
            else:
                raise ValueError(f"unknown reducer {r!r}")
        out = jnp.concatenate(outs, axis=-1)
        if was_1d and not keep_2d:
            return out[:, 0]  # match segment_* 1-d in -> 1-d out
        return out

    # EdgeAggregator-compatible surface ---------------------------------
    def sum(self, data: Array) -> Array:
        return self._reduce_all(("sum",), data, keep_2d=False)

    def mean(self, data: Array) -> Array:
        return self._reduce_all(("mean",), data, keep_2d=False)

    def max(self, data: Array) -> Array:
        return self._reduce_all(("max",), data, keep_2d=False)

    def min(self, data: Array) -> Array:
        return self._reduce_all(("min",), data, keep_2d=False)

    def multi(self, reduces: Sequence[str], data: Array) -> Array:
        """All reductions off ONE gather ([E, F] -> [N, len(reduces)*F])."""
        return self._reduce_all(tuple(reduces), data)
