"""Block-diagonal graph batching (the PyG `Batch`/`batch`-vector parity).

The reference batches graphs the torch_geometric way: stack edge lists with
vertex-index offsets into one big block-diagonal graph and carry a `batch`
vector mapping vertices to graphs (e.g. MatVecGNN.py:140, loss.py:196-199,
Data.py collate). Same-pattern graphs in this framework should use the
faster stacked-`vmap` route (`training.datasets.StackedGraphs`); this module
is for *mixed-pattern / mixed-size* batches, where block-diagonal is the
right (and only) static-shape layout.

Host-side construction; the result is an ordinary `SparseOperator` plus a
`GraphBatch`, so every kernel and `GNBlock` runs on it unchanged, and the
per-graph global aggregations come out as segment reductions over the batch
ids.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from gnnla_tpu.core.graph import GraphBatch, GraphState
from gnnla_tpu.ops.sparse import SparseOperator


def batch_operators(ops: Sequence[SparseOperator]
                    ) -> Tuple[SparseOperator, GraphBatch]:
    """Stack operators into one block-diagonal operator + batch ids.

    Graph k's vertices occupy rows [sum_{i<k} n_i, sum_{i<=k} n_i); edges
    keep their row-sorted order within each block, so the global edge list
    stays row-sorted (the SparseOperator invariant).
    """
    if not ops:
        raise ValueError("batch_operators needs at least one operator")
    rows, cols, vals = [], [], []
    v_ids, e_ids = [], []
    off = 0
    for k, op in enumerate(ops):
        if op.shape[0] != op.shape[1]:
            raise ValueError("batching expects square per-graph operators")
        r, c, v = op.host_coo()
        rows.append(r + off)
        cols.append(c + off)
        vals.append(v)
        v_ids.append(np.full(op.n_rows, k, dtype=np.int64))
        e_ids.append(np.full(r.shape[0], k, dtype=np.int64))
        off += op.n_rows

    big = SparseOperator.from_coo(
        np.concatenate(rows), np.concatenate(cols), np.concatenate(vals),
        (off, off), dtype=ops[0].vals.dtype, coalesce=False)
    batch = GraphBatch(
        vertex_graph=jnp.asarray(np.concatenate(v_ids), jnp.int32),
        edge_graph=jnp.asarray(np.concatenate(e_ids), jnp.int32),
        n_graphs=len(ops))
    return big, batch


def batch_states(states: Sequence[GraphState]) -> GraphState:
    """Concatenate per-graph feature states along the vertex/edge axes;
    globals stack to [G, Fg] (the batched-global convention GNBlock
    broadcasts per edge/vertex)."""
    def cat(xs):
        xs = [x for x in xs if x is not None]
        return jnp.concatenate(xs, axis=0) if xs else None

    globals_ = [s.globals_ for s in states]
    g = None
    if any(x is not None for x in globals_):
        g = jnp.stack([jnp.ravel(x) for x in globals_], axis=0)
    return GraphState(vertices=cat([s.vertices for s in states]),
                      edges=cat([s.edges for s in states]),
                      globals_=g)


def graph_sizes(ops: Sequence[SparseOperator]) -> List[int]:
    return [op.n_rows for op in ops]


def unbatch_vertices(v, sizes: Sequence[int],
                     axis: int = 0) -> List[jnp.ndarray]:
    """Split a stacked vertex array back into per-graph arrays (host-side
    convenience; the sizes are static)."""
    out, start = [], 0
    for n in sizes:
        idx = [slice(None)] * v.ndim
        idx[axis] = slice(start, start + n)
        out.append(v[tuple(idx)])
        start += n
    return out
