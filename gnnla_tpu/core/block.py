"""The GN-block engine: one functional core instead of nine MetaLayers.

A full Battaglia-et-al. graph-network block in the reference's ordering
(documented at /root/reference/matlab/gnn.m:47-54 and implemented by
torch_geometric.nn.MetaLayer):

    1. edge update      e' = edge_fn(v_i, v_j, e, g)           (phi^e)
    2. e->v aggregation + vertex update v' = vertex_fn(...)    (rho^{e->v}, phi^v)
    3. e->g / v->g aggregation + global update g' = ...        (rho^{e->g}, rho^{v->g}, phi^g)

Updates are *pure functions*, not nn.Modules: learned updates close over
parameter pytrees, fixed-kernel updates close over nothing. Aggregation is
exposed to the update functions as lightweight aggregator objects so a vertex
update can reduce arbitrary edge expressions (the reference passes aggregation
functions into its VertexUpdate modules the same way, e.g.
DirectInterpGNN.py:71-97 reduces two different edge products).

Everything here traces cleanly under `jit`, `vmap`, `grad`, `lax.scan` and
`shard_map`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from gnnla_tpu.core.graph import GraphBatch, GraphState
from gnnla_tpu.ops import segment
from gnnla_tpu.ops.sparse import SparseOperator

Array = jax.Array


class EdgeAggregator:
    """Reduces per-edge data onto vertices over the row index (rho^{e->v}).

    Edges are row-sorted (SparseOperator invariant) so reductions use the
    sorted fast path. Any [E] or [E, F] array may be reduced, not just the
    current edge features.
    """

    __slots__ = ("rows", "n_vertices", "mask")

    def __init__(self, rows: Array, n_vertices: int,
                 mask: Optional[Array] = None):
        self.rows = rows
        self.n_vertices = n_vertices
        self.mask = mask

    def _masked(self, data: Array, fill: float) -> Array:
        if self.mask is None:
            return data
        m = self.mask if data.ndim == 1 else self.mask[:, None]
        return jnp.where(m, data, jnp.full_like(data, fill))

    def sum(self, data: Array) -> Array:
        return segment.segment_sum(self._masked(data, 0.0), self.rows,
                                   self.n_vertices, is_sorted=True)

    def mean(self, data: Array) -> Array:
        # mean over *real* edges only
        total = self.sum(data)
        ones = jnp.ones(data.shape[:1], data.dtype)
        if self.mask is not None:
            ones = jnp.where(self.mask, ones, jnp.zeros_like(ones))
        count = segment.segment_sum(ones, self.rows, self.n_vertices,
                                    is_sorted=True)
        if data.ndim > 1:
            count = count[:, None]
        return total / jnp.maximum(count, 1)

    def max(self, data: Array) -> Array:
        return segment.segment_max(self._masked(data, -jnp.inf), self.rows,
                                   self.n_vertices, is_sorted=True)

    def min(self, data: Array) -> Array:
        return segment.segment_min(self._masked(data, jnp.inf), self.rows,
                                   self.n_vertices, is_sorted=True)

    def multi(self, reduces: Sequence[str], data: Array) -> Array:
        """Feature-wise concat of several reductions ([E,F] -> [N, len*F])."""
        data2d = data if data.ndim > 1 else data[:, None]
        outs = [getattr(self, r)(data2d) for r in reduces]
        return jnp.concatenate(outs, axis=-1)


# Above this nnz, embedding the dense layout's [N, K] index constants in
# the program would outweigh the scatter it replaces (and on the tunneled
# TPU backend, large closed-over constants make the remote compile
# pathological) — so big operators stay on the segment path.
DENSE_LAYOUT_MAX_EDGES = 1 << 22


def make_edge_aggregator(op: SparseOperator, n_vertices: int,
                         mask: Optional[Array] = None):
    """Fastest available rho^{e->v} aggregator for this operator.

    Fixed small/medium patterns with host-known rows get the gather-free
    DenseRowLayout (one static gather, all reducers share it — the TPU
    replacement for the reference's per-reducer torch_scatter calls,
    TrainableJacobiGNN.py:65-68). Masked batches, traced patterns, and
    very large operators use the scatter-based EdgeAggregator.
    """
    if (mask is None and n_vertices == op.n_rows
            and not isinstance(op.rows, jax.core.Tracer)
            and op.nnz <= DENSE_LAYOUT_MAX_EDGES):
        return op.row_layout()
    return EdgeAggregator(op.rows, n_vertices, mask=mask)


class NodeAggregator:
    """Reduces per-vertex (or per-edge) data onto graphs (rho^{v->g}, rho^{e->g}).

    For a single graph (batch None) reductions collapse to full-array
    reductions — these are the points that become `psum` collectives when the
    vertex axis is sharded (see gnnla_tpu.parallel).
    """

    __slots__ = ("graph_ids", "n_graphs", "mask")

    def __init__(self, graph_ids: Optional[Array], n_graphs: int,
                 mask: Optional[Array] = None):
        self.graph_ids = graph_ids
        self.n_graphs = n_graphs
        self.mask = mask

    def _masked(self, data: Array, fill: float) -> Array:
        if self.mask is None:
            return data
        m = self.mask if data.ndim == 1 else self.mask[:, None]
        return jnp.where(m, data, jnp.full_like(data, fill))

    def sum(self, data: Array) -> Array:
        if self.graph_ids is None:
            return jnp.sum(self._masked(data, 0.0), axis=0)
        return segment.segment_sum(self._masked(data, 0.0), self.graph_ids,
                                   self.n_graphs)

    def mean(self, data: Array) -> Array:
        if self.graph_ids is None:
            if self.mask is None:
                return jnp.mean(data, axis=0)
            total = self.sum(data)
            count = jnp.sum(self.mask.astype(data.dtype))
            return total / jnp.maximum(count, 1)
        total = self.sum(data)
        ones = jnp.ones(data.shape[:1], data.dtype)
        if self.mask is not None:
            ones = jnp.where(self.mask, ones, jnp.zeros_like(ones))
        count = segment.segment_sum(ones, self.graph_ids, self.n_graphs)
        if data.ndim > 1:
            count = count[:, None]
        return total / jnp.maximum(count, 1)

    def max(self, data: Array) -> Array:
        if self.graph_ids is None:
            return jnp.max(self._masked(data, -jnp.inf), axis=0)
        return segment.segment_max(self._masked(data, -jnp.inf),
                                   self.graph_ids, self.n_graphs)

    def min(self, data: Array) -> Array:
        if self.graph_ids is None:
            return jnp.min(self._masked(data, jnp.inf), axis=0)
        return segment.segment_min(self._masked(data, jnp.inf),
                                   self.graph_ids, self.n_graphs)

    def multi(self, reduces: Sequence[str], data: Array) -> Array:
        data2d = data if data.ndim > 1 else data[:, None]
        outs = [getattr(self, r)(data2d) for r in reduces]
        return jnp.concatenate(outs, axis=-1)


# Update-function signatures:
#   edge_fn(v_i, v_j, e, g)               -> e'
#       v_i = vertices gathered at edge rows   [E, Fv]
#       v_j = vertices gathered at edge cols   [E, Fv]
#       g   = per-edge globals ([Fg] single graph, [E, Fg] batched)
#   vertex_fn(v, e, agg, g)               -> v'
#       agg: EdgeAggregator over the row index
#       g  : per-vertex globals ([Fg] single, [N, Fg] batched)
#   global_fn(v, e, g, vagg, eagg)        -> g'
#       vagg: NodeAggregator over vertices; eagg: NodeAggregator over edges
EdgeFn = Callable[[Array, Array, Array, Optional[Array]], Array]
VertexFn = Callable[[Array, Array, EdgeAggregator, Optional[Array]], Array]
GlobalFn = Callable[[Array, Array, Optional[Array], NodeAggregator,
                     NodeAggregator], Array]


@dataclasses.dataclass(frozen=True)
class GNBlock:
    """One graph-network block; apply with `block(op, state [, batch])`.

    Any of the three update functions may be None (identity), matching the
    reference's partially-populated MetaLayers (e.g. SOCSAGNN.py:91 is
    edge-only; TrainableJacobiGNN.py:49-51 is vertex-only).
    """

    edge_fn: Optional[EdgeFn] = None
    vertex_fn: Optional[VertexFn] = None
    global_fn: Optional[GlobalFn] = None

    def __call__(self, op: SparseOperator, state: GraphState,
                 batch: Optional[GraphBatch] = None) -> GraphState:
        v, e, g = state.vertices, state.edges, state.globals_
        edge_mask = batch.edge_mask if batch is not None else None
        vertex_mask = batch.vertex_mask if batch is not None else None

        # ---- phi^e ------------------------------------------------------
        if self.edge_fn is not None:
            v_i = v[op.rows] if v is not None else None
            v_j = v[op.cols] if v is not None else None
            g_e = g
            if batch is not None and g is not None and g.ndim == 2:
                g_e = g[batch.edge_graph]
            e = self.edge_fn(v_i, v_j, e, g_e)

        # ---- rho^{e->v}, phi^v ------------------------------------------
        if self.vertex_fn is not None:
            agg = make_edge_aggregator(op, op.n_rows, mask=edge_mask)
            g_v = g
            if batch is not None and g is not None and g.ndim == 2:
                g_v = g[batch.vertex_graph]
            v = self.vertex_fn(v, e, agg, g_v)

        # ---- rho^{v->g}, rho^{e->g}, phi^g ------------------------------
        if self.global_fn is not None:
            if batch is None:
                vagg = NodeAggregator(None, 1, mask=vertex_mask)
                eagg = NodeAggregator(None, 1, mask=edge_mask)
            else:
                vagg = NodeAggregator(batch.vertex_graph, batch.n_graphs,
                                      mask=vertex_mask)
                eagg = NodeAggregator(batch.edge_graph, batch.n_graphs,
                                      mask=edge_mask)
            g = self.global_fn(v, e, g, vagg, eagg)

        return GraphState(vertices=v, edges=e, globals_=g)


def chain(blocks: Sequence[GNBlock], op: SparseOperator, state: GraphState,
          batch: Optional[GraphBatch] = None) -> GraphState:
    """Run blocks in sequence (the reference's layer lists, unrolled)."""
    for b in blocks:
        state = b(op, state, batch)
    return state
