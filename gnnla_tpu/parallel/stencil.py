"""Row-block-sharded grid-stencil kernels + the scaling model.

The distributed twin of the structured fast paths in ops/pallas_stencil:
the grid's rows (H axis) are block-sharded over a mesh axis, each device
holds its [H/ndev, W] slab of the tap planes and the vector, and one
matvec is

  1. halo exchange — ring `ppermute` of the top/bottom `r` rows
     (r = the stencil's signed row reach, 1 for 9-point FEM stencils),
  2. local tap accumulation — K static row-slices + column rolls on the
     halo-extended slab (vectorizes on the VPU; XLA overlaps the
     ppermute with the interior taps).

The ring wraps at the global boundary, which implements the modular tap
semantics y[r,c] = sum_k p_k[r,c] * x[(r+dy)%H, (c+dx)%W] exactly:
periodic operators get their wrap from the ring, Dirichlet operators have
zero taps at the boundary so the wrapped values multiply zero.

This closes the round-2 gap that the sharded kernels only ran the
scatter-bound COO path (parallel/spmv.py): on grid operators the per-chip
work is now the same roll-based formulation as the single-chip stencil
fast path. No reference counterpart — the reference is single-device
(SURVEY.md §2.5); the scaling contract is BASELINE.md's >= 80%
edges/s efficiency, modeled here by `stencil_scaling_model` and measured
on real meshes by the same parity-tested code.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

Array = jax.Array

# v5e-class chip constants for the analytic model (bytes/s)
HBM_BW = 819e9          # HBM streaming bandwidth per chip
ICI_BW = 4.5e10         # ICI bandwidth per link direction (~45 GB/s)


def signed_row_shifts(shifts: List[Tuple[int, int]], h: int) -> List[int]:
    """Map modular dy in [0, H) to the signed shift in (-H/2, H/2]."""
    return [dy if dy <= h // 2 else dy - h for dy, _ in shifts]


def _halo_rows(x_l: Array, r: int, axis: str) -> Array:
    """[hl, W, ...] -> [hl + 2r, W, ...] with ring-wrapped row halos."""
    if r == 0:
        return x_l
    ndev = jax.lax.axis_size(axis)
    if ndev == 1:
        return jnp.concatenate([x_l[-r:], x_l, x_l[:r]], axis=0)
    # my top r rows are the bottom halo of the previous device; my bottom
    # r rows are the top halo of the next. Ring wrap = modular row index.
    top_halo = jax.lax.ppermute(
        x_l[-r:], axis, [(i, (i + 1) % ndev) for i in range(ndev)])
    bottom_halo = jax.lax.ppermute(
        x_l[:r], axis, [(i, (i - 1) % ndev) for i in range(ndev)])
    return jnp.concatenate([top_halo, x_l, bottom_halo], axis=0)


def _local_stencil(planes_l: Array, x_ext: Array, r: int,
                   shifts: List[Tuple[int, int]], sy: List[int]) -> Array:
    """Tap accumulation on a halo-extended slab. planes_l [K, hl, W],
    x_ext [hl + 2r, W] or [hl + 2r, W, m]."""
    hl = planes_l.shape[1]
    acc = None
    for k, (_, dx) in enumerate(shifts):
        xs = x_ext[r + sy[k]: r + sy[k] + hl]
        xs = jnp.roll(xs, -dx, axis=1)
        p = planes_l[k] if x_ext.ndim == 2 else planes_l[k][:, :, None]
        term = p * xs
        acc = term if acc is None else acc + term
    return acc


def _check_grid(h: int, ndev: int, r: int) -> int:
    if h % ndev:
        raise ValueError(f"grid H={h} not divisible by {ndev} shards")
    hl = h // ndev
    if r > hl:
        raise ValueError(f"stencil row reach {r} exceeds the {hl}-row "
                         f"shard; use fewer devices")
    return hl


def make_sharded_stencil_matvec(shifts: List[Tuple[int, int]],
                                grid_shape: Tuple[int, int], mesh: Mesh,
                                axis: str = "rows"):
    """Returns jitted (planes [K,H,W] row-sharded, x [H,W] row-sharded)
    -> y row-sharded. Also accepts x [H, W, m] probe blocks."""
    h, w = grid_shape
    ndev = mesh.shape[axis]
    sy = signed_row_shifts(shifts, h)
    r = max((abs(s) for s in sy), default=0)
    _check_grid(h, ndev, r)

    def body(planes_l, x_l):
        x_ext = _halo_rows(x_l, r, axis)
        return _local_stencil(planes_l, x_ext, r, shifts, sy)

    def run(planes, x):
        xspec = P(axis, None) if x.ndim == 2 else P(axis, None, None)
        fn = shard_map(body, mesh=mesh,
                       in_specs=(P(None, axis, None), xspec),
                       out_specs=xspec)
        return fn(planes, x)

    return jax.jit(run)


def make_sharded_stencil_jacobi(shifts: List[Tuple[int, int]],
                                grid_shape: Tuple[int, int], mesh: Mesh,
                                axis: str = "rows"):
    """Returns jitted (planes, diag2d, b2d, x2d, omega, n_iters static) ->
    x2d after n_iters weighted-Jacobi sweeps, all row-sharded, one halo
    exchange per sweep inside a single scanned shard_map region."""
    h, w = grid_shape
    ndev = mesh.shape[axis]
    sy = signed_row_shifts(shifts, h)
    r = max((abs(s) for s in sy), default=0)
    _check_grid(h, ndev, r)

    def body(planes_l, d_l, b_l, x_l, omega, n_iters):
        wgt = omega[0]
        d_safe = jnp.where(d_l == 0, jnp.ones_like(d_l), d_l)

        def sweep(x, _):
            ax = _local_stencil(planes_l, _halo_rows(x, r, axis), r,
                                shifts, sy)
            return x + wgt * (b_l - ax) / d_safe, None

        x, _ = jax.lax.scan(sweep, x_l, None, length=n_iters)
        return x

    vspec = P(axis, None)

    @partial(jax.jit, static_argnames=("n_iters",))
    def run(planes, diag2d, b2d, x2d, omega, n_iters):
        fn = shard_map(partial(body, n_iters=n_iters), mesh=mesh,
                       in_specs=(P(None, axis, None), vspec, vspec, vspec,
                                 P(None)),
                       out_specs=vspec)
        return fn(planes, diag2d, b2d, x2d,
                  jnp.asarray([omega], jnp.float32))

    return run


def shard_planes(planes, mesh: Mesh, axis: str = "rows"):
    """Place tap planes [K, H, W] with the H axis sharded."""
    return jax.device_put(planes, NamedSharding(mesh, P(None, axis, None)))


def shard_vec2d(x, mesh: Mesh, axis: str = "rows"):
    """Place a grid vector [H, W] (or probe block [H, W, m]) with the H
    axis sharded."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def stencil_scaling_model(h: int, w: int, k_taps: int, ndev: int, *,
                          halo: int = 1, dtype_bytes: int = 4,
                          hbm_bw: float = HBM_BW,
                          ici_bw: float = ICI_BW) -> dict:
    """Analytic comm-vs-local-work accounting for one sharded stencil SpMV.

    Local time = per-chip HBM traffic / bandwidth (the kernel is
    memory-bound: K tap planes + in/out vectors stream once).
    Comm time = halo bytes over one ICI link (top + bottom rows, sent and
    received concurrently on different links).
    Reported efficiencies: `overlapped` assumes the interior taps hide the
    halo exchange (XLA schedules the ppermute first; the interior
    accumulation needs no halo), `serial` assumes no overlap — the true
    number lies between, >= 80% is the BASELINE.md north star.
    """
    n = h * w
    local_bytes = (k_taps * n + 2 * n) * dtype_bytes / ndev
    t_local = local_bytes / hbm_bw
    comm_bytes = 2 * halo * w * dtype_bytes if ndev > 1 else 0
    t_comm = comm_bytes / ici_bw
    nnz = k_taps * n  # one tap entry per (class, row) pair upper bound
    eff_serial = t_local / (t_local + t_comm) if t_local else 1.0
    eff_overlap = min(1.0, t_local / max(t_local, t_comm)) \
        if t_local else 1.0
    return {
        "ndev": ndev,
        "local_bytes_per_chip": local_bytes,
        "comm_bytes_per_chip": comm_bytes,
        "t_local_us": t_local * 1e6,
        "t_comm_us": t_comm * 1e6,
        "efficiency_serial": eff_serial,
        "efficiency_overlapped": eff_overlap,
        "edges_per_s_aggregate": nnz / max(t_local + t_comm, 1e-30) * ndev
        if ndev > 1 else nnz / max(t_local, 1e-30),
    }
