"""Sharded SpMV and iterative kernels under `shard_map`.

The distributed design from BASELINE.json: each device owns a row block of
the operator and the matching slice of x/b. One SpMV =

  1. halo exchange — `ppermute` the boundary slices of x to ring neighbors
     (banded operators reach only ring neighbors; general operators fall
     back to `all_gather`),
  2. local gather -> multiply -> segment-sum over the block's rows,

with global reductions (norms, Rayleigh quotients) as `psum` collectives.
XLA overlaps the ppermute with the local-interior aggregation since the
interior product depends only on local x.

All functions take/return [S, R] row-block-sharded arrays; wrap them with
`shard_map` via `make_sharded_*` which bind a mesh axis name.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gnnla_tpu.ops.segment import segment_sum
from gnnla_tpu.parallel.partition import PartitionedOperator

Array = jax.Array


def _halo_exchange(x_local: Array, halo: int, axis: str) -> Array:
    """Build x_ext = [left_halo | x_local | right_halo] via ring ppermute."""
    n_dev = jax.lax.axis_size(axis)
    if halo == 0 or n_dev == 1:
        pad = jnp.zeros((halo,), x_local.dtype)
        return jnp.concatenate([pad, x_local, pad])
    idx = jax.lax.axis_index(axis)
    # send my first `halo` entries to the left neighbor (they become its
    # right halo); my last `halo` entries to the right neighbor.
    right_halo = jax.lax.ppermute(
        x_local[:halo], axis,
        [(i, (i - 1) % n_dev) for i in range(n_dev)])
    left_halo = jax.lax.ppermute(
        x_local[-halo:], axis,
        [(i, (i + 1) % n_dev) for i in range(n_dev)])
    # global edge blocks have no real neighbor; the partitioner guarantees
    # no column references outside [0, N), so wrapped halo values are never
    # gathered by real edges — but zero them for safety.
    left_halo = jnp.where(idx == 0, jnp.zeros_like(left_halo), left_halo)
    right_halo = jnp.where(idx == n_dev - 1,
                           jnp.zeros_like(right_halo), right_halo)
    return jnp.concatenate([left_halo, x_local, right_halo])


def make_sharded_matvec(part: PartitionedOperator, mesh: Mesh,
                        axis: str = "rows"):
    """Returns a jitted y = A @ x over [S, R]-sharded vectors.

    Uses ring-halo exchange when the operator is banded (halo_reach <= 1),
    otherwise an all_gather of x.
    """
    rps, halo = part.rows_per_shard, part.halo
    use_halo = part.halo_reach <= 1

    def body(rows_l, cols_e, cols_g, vals, mask, x_local):
        # leading shard axis sliced off by shard_map
        rows_l, cols_e, cols_g = rows_l[0], cols_e[0], cols_g[0]
        vals, mask, x_local = vals[0], mask[0], x_local[0]
        if use_halo:
            x_ext = _halo_exchange(x_local, halo, axis)
            prod = jnp.where(mask, vals * x_ext[cols_e], 0.0)
        else:
            x_full = jax.lax.all_gather(x_local, axis, tiled=True)
            prod = jnp.where(mask, vals * x_full[cols_g], 0.0)
        y = segment_sum(prod, rows_l, rps, is_sorted=True)
        return y[None]

    spec = P(axis)
    fn = shard_map(body, mesh=mesh,
                   in_specs=(spec, spec, spec, spec, spec, spec),
                   out_specs=spec)
    # operator arrays are jit *arguments*, not closure constants — closures
    # inline large arrays into the compiled program on remote-compile
    # backends (see bench.py backend notes)
    jfn = jax.jit(fn)

    def matvec(x_sharded):
        return jfn(part.rows_local, part.cols_ext, part.cols_global,
                   part.vals, part.mask, x_sharded)

    return matvec


def make_sharded_jacobi(part: PartitionedOperator, mesh: Mesh,
                        axis: str = "rows"):
    """Returns jitted (b, x, diag, omega, n_iters static) -> x after sweeps,
    scanned entirely inside one shard_map region (halo exchange per sweep)."""
    rps, halo = part.rows_per_shard, part.halo
    use_halo = part.halo_reach <= 1

    def body(rows_l, cols_e, cols_g, vals, mask, b, x, d, omega, n_iters):
        rows_l, cols_e, cols_g = rows_l[0], cols_e[0], cols_g[0]
        vals, mask = vals[0], mask[0]
        b, x, d = b[0], x[0], d[0]
        w = omega[0][0]

        d_safe = jnp.where(d == 0, jnp.ones_like(d), d)  # padding rows

        def spmv(x_local):
            if use_halo:
                x_ext = _halo_exchange(x_local, halo, axis)
                prod = jnp.where(mask, vals * x_ext[cols_e], 0.0)
            else:
                x_full = jax.lax.all_gather(x_local, axis, tiled=True)
                prod = jnp.where(mask, vals * x_full[cols_g], 0.0)
            return segment_sum(prod, rows_l, rps, is_sorted=True)

        def step(x, _):
            return x + w * (b - spmv(x)) / d_safe, None

        x, _ = jax.lax.scan(step, x, None, length=n_iters)
        return x[None]

    spec = P(axis)

    @partial(jax.jit, static_argnames=("n_iters",))
    def jrun(rows_l, cols_e, cols_g, vals, mask, b, x, d, omega_arr,
             n_iters):
        fn = shard_map(
            partial(body, n_iters=n_iters), mesh=mesh,
            in_specs=(spec, spec, spec, spec, spec, spec, spec, spec,
                      P(None)),
            out_specs=spec)
        return fn(rows_l, cols_e, cols_g, vals, mask, b, x, d, omega_arr)

    def run(b, x, d, omega, n_iters):
        omega_arr = jnp.asarray([[omega]], part.vals.dtype)
        return jrun(part.rows_local, part.cols_ext, part.cols_global,
                    part.vals, part.mask, b, x, d, omega_arr,
                    n_iters=n_iters)

    return run


def make_sharded_power_method(part: PartitionedOperator, mesh: Mesh,
                              axis: str = "rows"):
    """Returns jitted (b0 sharded, n_iters static) -> (lambda_max, b).

    The distributed version of models.power_method: row-block SpMV with
    halo exchange per iteration, iterate normalisation and the Rayleigh
    quotient as `psum` full-graph reductions (the collectives the
    reference's torch.sum global aggregations map to,
    PowerMethodGNN.py:50-61)."""
    rps, halo = part.rows_per_shard, part.halo
    use_halo = part.halo_reach <= 1

    def body(rows_l, cols_e, cols_g, vals, mask, b, n_iters):
        rows_l, cols_e, cols_g = rows_l[0], cols_e[0], cols_g[0]
        vals, mask, b = vals[0], mask[0], b[0]

        def spmv(x_local):
            if use_halo:
                x_ext = _halo_exchange(x_local, halo, axis)
                prod = jnp.where(mask, vals * x_ext[cols_e], 0.0)
            else:
                x_full = jax.lax.all_gather(x_local, axis, tiled=True)
                prod = jnp.where(mask, vals * x_full[cols_g], 0.0)
            return segment_sum(prod, rows_l, rps, is_sorted=True)

        def pnorm(v):
            return jnp.sqrt(jax.lax.psum(jnp.sum(v * v), axis))

        def step(b, _):
            ab = spmv(b)
            return ab / pnorm(ab), None

        b, _ = jax.lax.scan(step, b, None, length=n_iters)
        ab = spmv(b)
        lam = (jax.lax.psum(jnp.sum(b * ab), axis) /
               jax.lax.psum(jnp.sum(b * b), axis))
        return lam[None], b[None]

    spec = P(axis)

    @partial(jax.jit, static_argnames=("n_iters",))
    def jrun(rows_l, cols_e, cols_g, vals, mask, b0, n_iters):
        fn = shard_map(
            partial(body, n_iters=n_iters), mesh=mesh,
            in_specs=(spec, spec, spec, spec, spec, spec),
            out_specs=(spec, spec))
        lam, b = fn(rows_l, cols_e, cols_g, vals, mask, b0)
        return lam[0], b

    def run(b0, n_iters):
        return jrun(part.rows_local, part.cols_ext, part.cols_global,
                    part.vals, part.mask, b0, n_iters=n_iters)

    return run


def make_sharded_norm(part: PartitionedOperator, mesh: Mesh,
                      axis: str = "rows"):
    """Returns jitted ||x||_2 over a sharded vector via psum."""
    def body(x):
        local = jnp.sum(x[0] * x[0])
        return jnp.sqrt(jax.lax.psum(local, axis))[None]

    fn = shard_map(body, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis))

    @jax.jit
    def norm(x_sharded):
        return fn(x_sharded)[0]

    return norm


def device_put_sharded(x_blocks: Array, mesh: Mesh, axis: str = "rows"):
    """Place an [S, ...] array with its leading axis over the mesh axis."""
    return jax.device_put(x_blocks, NamedSharding(mesh, P(axis)))
