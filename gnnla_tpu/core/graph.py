"""Graph containers: immutable feature state threaded through GN blocks.

The reference threads (vertex_attr, edge_attr, g) through torch_geometric
MetaLayers, mutating column-by-column (e.g. JacobiGNN.py:91-123). Here the
same data is an immutable `GraphState` pytree — update functions return new
states, which makes the engine compatible with `jit`, `lax.scan`, `grad` and
`shard_map` without aliasing hazards.

Topology lives in `SparseOperator` (rows = aggregation targets, cols = gather
sources); `GraphState` carries only features. For batched training graphs,
`GraphBatch` holds the segment ids that map vertices/edges to their graph
(the analogue of PyG's `batch` vector, reference MatVecGNN.py:140).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphState:
    """Features of one (or a batch of) graph(s).

    vertices : [N, Fv]  per-vertex features (matrix rows/cols)
    edges    : [E, Fe]  per-edge features (matrix nonzeros)
    globals_ : [Fg] for a single graph, or [G, Fg] for a batch
    """

    vertices: Optional[Array] = None
    edges: Optional[Array] = None
    globals_: Optional[Array] = None

    def replace(self, **kw) -> "GraphState":
        return dataclasses.replace(self, **kw)

    @property
    def n_vertices(self) -> int:
        return self.vertices.shape[0]

    @property
    def n_edges(self) -> int:
        return self.edges.shape[0]

    def vertex_col(self, i: int) -> Array:
        """Column i of the vertex features as a flat [N] vector."""
        return self.vertices[:, i]

    def edge_col(self, i: int) -> Array:
        return self.edges[:, i]


def columns(*cols: Array) -> Array:
    """Stack flat [N] vectors into an [N, F] feature matrix."""
    return jnp.stack([jnp.ravel(c) for c in cols], axis=1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphBatch:
    """Segment ids for batched graphs (fixed shapes; pad + mask upstream).

    vertex_graph : int32 [N]  graph id per vertex
    edge_graph   : int32 [E]  graph id per edge
    n_graphs     : static int
    vertex_mask  : optional bool [N]  False on padding vertices
    edge_mask    : optional bool [E]  False on padding edges
    """

    vertex_graph: Array
    edge_graph: Array
    n_graphs: int = dataclasses.field(metadata=dict(static=True))
    vertex_mask: Optional[Array] = None
    edge_mask: Optional[Array] = None

    @staticmethod
    def single(n_vertices: int, n_edges: int) -> "GraphBatch":
        return GraphBatch(
            vertex_graph=jnp.zeros((n_vertices,), jnp.int32),
            edge_graph=jnp.zeros((n_edges,), jnp.int32),
            n_graphs=1,
        )
