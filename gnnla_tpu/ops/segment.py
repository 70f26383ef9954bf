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
