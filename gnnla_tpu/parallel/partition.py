"""Row-block partitioning of sparse operators for multi-device execution.

The reference is strictly single-device (SURVEY.md §2.5); this subsystem is
the TPU-native scaling design from BASELINE.json: edge-partition the sparse
matrix graph by *row blocks* over a mesh axis, keep x/b sharded by row, and
exchange only boundary (halo) vertex features over ICI.

Partitioning is a host-side setup op. It produces a `PartitionedOperator`
pytree whose leading axis is the shard axis, ready for `shard_map`:

  * rows are padded to a multiple of n_shards,
  * each shard's edges are padded to the max per-shard nnz (static shapes),
  * per-shard edges store the *local* row index and the *global* col index,
  * halo metadata: for banded operators (all FEM problems here) each shard's
    columns fall within [start - H, end + H) for a small H, so the exchange
    is one `ppermute` to each ring neighbor; the general fallback is
    `all_gather`. `halo_reach` records how many neighbor shards each side
    needs (0 = fully local, 1 = ring neighbors, >1 -> use all_gather).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gnnla_tpu.ops.sparse import SparseOperator

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartitionedOperator:
    """Row-block sharded sparse operator (leading axis = shard)."""

    rows_local: Array      # [S, E] int32, local row index within the block
    cols_ext: Array        # [S, E] int32, index into the halo-extended x
    cols_global: Array     # [S, E] int32, global column index (allgather path)
    vals: Array            # [S, E]
    mask: Array            # [S, E] bool, False on padding
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_rows_padded: int = dataclasses.field(metadata=dict(static=True))
    rows_per_shard: int = dataclasses.field(metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    halo: int = dataclasses.field(metadata=dict(static=True))
    halo_reach: int = dataclasses.field(metadata=dict(static=True))

    @property
    def edges_per_shard(self) -> int:
        return self.rows_local.shape[1]


def partition_rows(op: SparseOperator, n_shards: int) -> PartitionedOperator:
    """Partition a square operator into row blocks (host-side setup)."""
    n = op.n_rows
    rows, cols, vals = op.host_coo()

    rps = -(-n // n_shards)           # rows per shard (ceil)
    n_pad = rps * n_shards

    shard_of = rows // rps
    e_max = max(int(np.max(np.bincount(shard_of, minlength=n_shards))), 1)

    r_l = np.zeros((n_shards, e_max), dtype=np.int64)
    c_g = np.zeros((n_shards, e_max), dtype=np.int64)
    v = np.zeros((n_shards, e_max), dtype=np.float64)
    m = np.zeros((n_shards, e_max), dtype=bool)

    halo = 0
    reach = 0
    for s in range(n_shards):
        sel = shard_of == s
        k = int(sel.sum())
        start = s * rps
        r_l[s, :k] = rows[sel] - start
        c_g[s, :k] = cols[sel]
        v[s, :k] = vals[sel]
        m[s, :k] = True
        if k:
            c = cols[sel]
            left = max(0, start - int(c.min()))
            right = max(0, int(c.max()) - (start + rps - 1))
            halo = max(halo, left, right)
            # how many neighbor blocks away do we reach?
            reach = max(reach,
                        -(-left // rps) if left else 0,
                        -(-right // rps) if right else 0)

    # halo-extended local column index: x_ext = [left_halo | local | right_halo]
    halo = min(halo, rps)  # ring exchange ships whole neighbor blocks worth <= rps
    c_e = np.zeros_like(c_g)
    for s in range(n_shards):
        start = s * rps
        c_e[s] = c_g[s] - start + halo
    # clamp padding entries into range
    c_e = np.clip(c_e, 0, rps + 2 * halo - 1)

    return PartitionedOperator(
        rows_local=jnp.asarray(r_l, jnp.int32),
        cols_ext=jnp.asarray(c_e, jnp.int32),
        cols_global=jnp.asarray(c_g, jnp.int32),
        vals=jnp.asarray(v, op.vals.dtype),
        mask=jnp.asarray(m),
        n_rows=n, n_rows_padded=n_pad, rows_per_shard=rps,
        n_shards=n_shards, halo=int(halo), halo_reach=int(reach))


def shard_vector(x, part: PartitionedOperator) -> Array:
    """Pad [N] -> [S, R] row-block layout (host or device)."""
    x = jnp.ravel(x)
    pad = part.n_rows_padded - part.n_rows
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
    return x.reshape(part.n_shards, part.rows_per_shard)


def unshard_vector(xs: Array, part: PartitionedOperator) -> Array:
    """[S, R] -> [N]."""
    return xs.reshape(-1)[: part.n_rows]
