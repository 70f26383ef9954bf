"""Multi-host bring-up helpers.

The reference has no distributed backend at all (SURVEY.md §2.5 — no
torch.distributed/NCCL/MPI anywhere); this is the TPU-native layer that
takes the single-host `Mesh`/`shard_map` kernels in `gnnla_tpu.parallel`
across hosts: `jax.distributed.initialize` + a global mesh spanning every
process's devices. Intra-slice traffic rides ICI; cross-host DCN is handled
by the runtime — the kernels themselves are unchanged because the
collectives (`ppermute`, `psum`, `all_gather`) are expressed on mesh axis
names, not physical links.

Single-host (including the forced-multi-device CPU platform used in CI)
works through the same entry points with `initialize_distributed` skipped.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """`jax.distributed.initialize` with TPU-pod auto-detection.

    On TPU pods all three arguments are discovered from the environment;
    pass them explicitly for CPU/GPU multi-process runs. Call exactly once
    per process, before any jax computation.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_row_mesh(axis: str = "rows") -> Mesh:
    """1-D mesh over every device of every process — the layout the
    row-partitioned kernels expect. Devices are ordered process-major so
    ring `ppermute` neighbors are ICI neighbors within a host."""
    return Mesh(np.asarray(jax.devices()), axis_names=(axis,))


def grid_mesh(shape: Sequence[int],
              axis_names: Sequence[str] = ("data", "rows")) -> Mesh:
    """N-D mesh (e.g. data-parallel x row-sharded) over all devices."""
    devs = np.asarray(jax.devices())
    if int(np.prod(shape)) != devs.size:
        raise ValueError(f"mesh shape {tuple(shape)} needs "
                         f"{int(np.prod(shape))} devices, have {devs.size}")
    return Mesh(devs.reshape(tuple(shape)), axis_names=tuple(axis_names))


def to_global(tree, mesh: Mesh, axis: str = "rows"):
    """Host-replicated pytree -> global `jax.Array`s sharded on axis 0.

    The multi-host data path: every process constructs the same full host
    arrays deterministically (the setup phase is host numpy throughout this
    package), then each process materialises only its *addressable* shards
    via `jax.make_array_from_callback`. Under a single process this
    degrades to a plain `device_put` with the same sharding, so the
    identical worker code runs in CI and on a pod.

    Leading-axis size must equal the mesh axis size for sharded leaves
    (`PartitionedOperator` built with ``n_shards = mesh.shape[axis]`` and
    `[S, R]` vectors from `shard_vector` already satisfy this); 0-d leaves
    are replicated.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def leaf(a):
        a = np.asarray(a)
        spec = P(axis, *([None] * (a.ndim - 1))) if a.ndim else P()
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            a.shape, sharding, lambda idx, a=a: a[idx])

    return jax.tree.map(leaf, tree)


def replicate_global(tree, mesh: Mesh):
    """Host-replicated pytree -> fully-replicated global `jax.Array`s.

    The companion of `to_global` for arguments every device needs whole
    (e.g. the replicated coarse tail of `make_sharded_multigrid_cycle`).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def leaf(a):
        a = np.asarray(a)
        sharding = NamedSharding(mesh, P())
        return jax.make_array_from_callback(
            a.shape, sharding, lambda idx, a=a: a[idx])

    return jax.tree.map(leaf, tree)
