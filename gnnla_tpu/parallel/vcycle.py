"""Distributed two-grid V-cycle under `shard_map`.

The flagship composition (models/vcycle.py), scaled over a device mesh:

  * A is row-block partitioned (parallel/partition.py); smoothing and the
    residual run shard-locally with ring `ppermute` halo exchange,
  * P is row-partitioned with the same row blocks; restriction
    rc = P^T r is a per-shard scatter over *coarse* indices followed by a
    `psum` (each shard owns a row slice of P, contributions sum across the
    mesh), after which rc is replicated on every device,
  * the coarse-grid Chebyshev solve runs replicated (the coarse space is
    small — redundant compute beats communicating it),
  * prolongation x += P xc is shard-local (xc is replicated).

No reference counterpart (the reference is single-device, SURVEY.md §2.5).
Numerics match the single-device `vcycle` exactly; tests assert parity on
the virtual 8-device CPU mesh.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gnnla_tpu.models.chebyshev import chebyshev
from gnnla_tpu.models.vcycle import TwoGridSetup
from gnnla_tpu.ops.segment import segment_sum
from gnnla_tpu.ops.sparse import SparseOperator
from gnnla_tpu.parallel.partition import PartitionedOperator, partition_rows
from gnnla_tpu.parallel.spmv import _halo_exchange

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartitionedRect:
    """Row-block sharded rectangular operator (prolongation P [n, nc])."""

    rows_local: Array   # [S, E] int32
    cols_global: Array  # [S, E] int32 (coarse index — small, replicated)
    vals: Array         # [S, E]
    mask: Array         # [S, E] bool
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    rows_per_shard: int = dataclasses.field(metadata=dict(static=True))


def partition_rows_rect(op: SparseOperator, n_shards: int,
                        rows_per_shard: int) -> PartitionedRect:
    """Partition a rectangular operator by the same row blocks as its
    square companion (host-side setup)."""
    rows, cols, vals = op.host_coo()
    rps = rows_per_shard
    shard_of = rows // rps
    e_max = max(int(np.max(np.bincount(shard_of, minlength=n_shards))), 1)

    r_l = np.zeros((n_shards, e_max), dtype=np.int64)
    c_g = np.zeros((n_shards, e_max), dtype=np.int64)
    v = np.zeros((n_shards, e_max), dtype=np.float64)
    m = np.zeros((n_shards, e_max), dtype=bool)
    for s in range(n_shards):
        sel = shard_of == s
        k = int(sel.sum())
        r_l[s, :k] = rows[sel] - s * rps
        c_g[s, :k] = cols[sel]
        v[s, :k] = vals[sel]
        m[s, :k] = True
    return PartitionedRect(
        rows_local=jnp.asarray(r_l, jnp.int32),
        cols_global=jnp.asarray(c_g, jnp.int32),
        vals=jnp.asarray(v, op.vals.dtype),
        mask=jnp.asarray(m),
        n_cols=op.shape[1], rows_per_shard=rps)


def make_sharded_vcycle(setup: TwoGridSetup, mesh: Mesh,
                        axis: str = "rows", *, n_pre: int = 3,
                        n_post: int = 3, omega: float = 0.7,
                        coarse_deg: int = 4, coarse_c: float = -3.4,
                        coarse_d: float = -4.0):
    """Returns (cycle_fn, part) where cycle_fn(b_sh, x_sh) runs one
    distributed V-cycle on [S, R]-sharded vectors.

    `setup` must carry COO operators (build with `setup_twogrid`, not the
    DIA-swapped variant — partitioning reads the COO pattern).
    """
    if not isinstance(setup.A, SparseOperator):
        raise ValueError("make_sharded_vcycle needs a COO TwoGridSetup "
                         "(use setup_twogrid without setup_with_dia)")
    n_shards = int(np.prod([mesh.shape[a] for a in (axis,)]))
    part = partition_rows(setup.A, n_shards)
    part_p = partition_rows_rect(setup.P, n_shards, part.rows_per_shard)
    rps, halo = part.rows_per_shard, part.halo
    use_halo = part.halo_reach <= 1
    nc = part_p.n_cols
    Ac = setup.Ac

    from gnnla_tpu.parallel.partition import shard_vector
    d_blocks = shard_vector(setup.diag, part)

    def body(rows_l, cols_e, cols_g, vals, mask, p_rows, p_cols, p_vals,
             p_mask, ac_rows, ac_cols, ac_vals, ac_ptr, b, x, d):
        rows_l, cols_e, cols_g = rows_l[0], cols_e[0], cols_g[0]
        vals, mask = vals[0], mask[0]
        p_rows, p_cols = p_rows[0], p_cols[0]
        p_vals, p_mask = p_vals[0], p_mask[0]
        b, x, d = b[0], x[0], d[0]
        d_safe = jnp.where(d == 0, jnp.ones_like(d), d)

        def spmv(x_local):
            if use_halo:
                x_ext = _halo_exchange(x_local, halo, axis)
                prod = jnp.where(mask, vals * x_ext[cols_e], 0.0)
            else:
                x_full = jax.lax.all_gather(x_local, axis, tiled=True)
                prod = jnp.where(mask, vals * x_full[cols_g], 0.0)
            return segment_sum(prod, rows_l, rps, is_sorted=True)

        def smooth(x, n_iters):
            def step(x, _):
                return x + omega * (b - spmv(x)) / d_safe, None
            x, _ = jax.lax.scan(step, x, None, length=n_iters)
            return x

        x = smooth(x, n_pre)

        # restriction: rc = P^T r, summed across shards
        r = b - spmv(x)
        rc_part = segment_sum(jnp.where(p_mask, p_vals * r[p_rows], 0.0),
                              p_cols, nc)
        rc = jax.lax.psum(rc_part, axis)

        # coarse solve, replicated on every device
        ac = SparseOperator(rows=ac_rows, cols=ac_cols, vals=ac_vals,
                            row_ptr=ac_ptr, shape=(nc, nc))
        xc = chebyshev(ac, rc, jnp.zeros_like(rc), c=coarse_c, d=coarse_d,
                       deg=coarse_deg)

        # prolongation: shard-local rows of P against replicated xc
        x = x + segment_sum(
            jnp.where(p_mask, p_vals * xc[p_cols], 0.0), p_rows, rps,
            is_sorted=True)

        x = smooth(x, n_post)
        return x[None]

    spec = P(axis)
    repl = P(None)

    @jax.jit
    def jrun(part_args, p_args, ac_args, b, x, d):
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(spec,) * 5 + (spec,) * 4 + (repl,) * 4
            + (spec, spec, spec),
            out_specs=spec)
        return fn(*part_args, *p_args, *ac_args, b, x, d)

    part_args = (part.rows_local, part.cols_ext, part.cols_global,
                 part.vals, part.mask)
    p_args = (part_p.rows_local, part_p.cols_global, part_p.vals,
              part_p.mask)
    ac_args = (Ac.rows, Ac.cols, Ac.vals, Ac.row_ptr)

    def cycle(b_sharded, x_sharded):
        return jrun(part_args, p_args, ac_args, b_sharded, x_sharded,
                    d_blocks)

    return cycle, part


def make_sharded_multigrid_cycle(setup, mesh: Mesh, axis: str = "rows", *,
                                 n_pre: int = 3, n_post: int = 3,
                                 omega: float = 0.7, coarse_deg: int = 8,
                                 gamma: int = 1,
                                 min_sharded_rows: int = 32768,
                                 n_sharded_levels: int | None = None,
                                 globalize=None):
    """Distributed *multilevel* V/W-cycle: the finest K levels run
    row-sharded (halo `ppermute` smoothing, `psum` restriction), the
    coarse tail runs the replicated `multigrid_cycle` recursion.

    `globalize(sharded_tree, replicated_tree) -> (sharded, replicated)`
    lets multi-process callers materialise the operator pytrees as global
    arrays (e.g. `lambda s, r: (to_global(s, mesh), replicate_global(r,
    mesh))`) — required whenever the mesh spans processes, a no-op
    single-host.

    The completion of `make_sharded_vcycle` for real hierarchies
    (`setup_multigrid` / `setup_sa_multigrid`): with ~4x coarsening the
    finest levels carry nearly all the work, so sharding levels down to
    `min_sharded_rows` rows captures the parallel fraction while the tiny
    tail is computed redundantly on every device (redundant compute beats
    communicating it — same call as the two-grid coarse solve).

    Level-i+1 hand-off when both levels are sharded: the psum-replicated
    coarse residual is sliced back to this shard's row block
    (`dynamic_slice` at `axis_index`), recursed on, and the correction is
    `all_gather`ed for the shard-local prolongation rows.

    Returns (cycle_fn, part0): cycle_fn(b_sh, x_sh) advances one cycle on
    `[S, R]` vectors sharded by `part0` (build with
    `shard_vector(v, part0)`). Numerics match the single-device
    `multigrid_cycle` on the same setup (fp32 reassociation only). No
    reference counterpart — the reference is single-device and two-grid
    (SURVEY.md §2.5, pytorch/VCycle.py:175-237).
    """
    from gnnla_tpu.models.multigrid import MultigridSetup, multigrid_cycle
    from gnnla_tpu.parallel.partition import shard_vector

    L = setup.n_levels
    for A in setup.As:
        if not isinstance(A, SparseOperator):
            raise ValueError(
                "make_sharded_multigrid_cycle needs COO operators on every "
                "level (build with setup_multigrid/setup_sa_multigrid, "
                "without the DIA swap)")
    ndev = int(mesh.shape[axis])

    if n_sharded_levels is None:
        K = 0
        for A in setup.As[: L - 1]:
            if A.n_rows >= min_sharded_rows:
                K += 1
            else:
                break
        K = max(K, 1)
    else:
        K = int(n_sharded_levels)
    K = max(1, min(K, L - 1))

    parts = tuple(partition_rows(setup.As[i], ndev) for i in range(K))
    part_ps = tuple(
        partition_rows_rect(setup.Ps[i], ndev, parts[i].rows_per_shard)
        for i in range(K))
    d_blocks = tuple(shard_vector(setup.diags[i], parts[i])
                     for i in range(K))
    tail = MultigridSetup(As=setup.As[K:], Ps=setup.Ps[K:],
                          diags=setup.diags[K:], coarse_c=setup.coarse_c,
                          coarse_d=setup.coarse_d)
    if globalize is not None:
        (parts, part_ps, d_blocks), tail = globalize(
            (parts, part_ps, d_blocks), tail)

    # static per-level facts (halo geometry, block sizes, coarse dims)
    lev = [(p.halo, p.halo_reach <= 1, p.rows_per_shard) for p in parts]
    ncs = [setup.As[i + 1].n_rows for i in range(K)]

    def body(parts_a, pps_a, dbs_a, tail_s, b, x):
        # strip the sliced-off leading shard axis from every array leaf
        parts_l = jax.tree.map(lambda a: a[0], parts_a)
        pps_l = jax.tree.map(lambda a: a[0], pps_a)
        dbs_l = jax.tree.map(lambda a: a[0], dbs_a)
        b, x = b[0], x[0]

        def spmv(i, x_local):
            part = parts_l[i]
            halo, use_halo, rps = lev[i]
            if use_halo:
                x_ext = _halo_exchange(x_local, halo, axis)
                prod = jnp.where(part.mask,
                                 part.vals * x_ext[part.cols_ext], 0.0)
            else:
                x_full = jax.lax.all_gather(x_local, axis, tiled=True)
                prod = jnp.where(part.mask,
                                 part.vals * x_full[part.cols_global], 0.0)
            return segment_sum(prod, part.rows_local, rps, is_sorted=True)

        def cycle(i, b, x):
            pp, d = pps_l[i], dbs_l[i]
            rps = lev[i][2]
            d_safe = jnp.where(d == 0, jnp.ones_like(d), d)

            def smooth(x, n_iters):
                def step(x, _):
                    return x + omega * (b - spmv(i, x)) / d_safe, None
                x, _ = jax.lax.scan(step, x, None, length=n_iters)
                return x

            x = smooth(x, n_pre)
            nc = ncs[i]
            for _ in range(gamma):
                # restriction: rc = P^T r, psum-replicated across shards
                r = b - spmv(i, x)
                rc_part = segment_sum(
                    jnp.where(pp.mask, pp.vals * r[pp.rows_local], 0.0),
                    pp.cols_global, nc)
                rc = jax.lax.psum(rc_part, axis)

                if i + 1 < K:
                    rps_c = lev[i + 1][2]
                    idx = jax.lax.axis_index(axis)
                    rc_pad = jnp.pad(rc, (0, rps_c * ndev - nc))
                    rc_loc = jax.lax.dynamic_slice(rc_pad, (idx * rps_c,),
                                                   (rps_c,))
                    xc_loc = cycle(i + 1, rc_loc, jnp.zeros_like(rc_loc))
                    xc = jax.lax.all_gather(xc_loc, axis, tiled=True)[:nc]
                else:
                    xc = multigrid_cycle(tail_s, rc, jnp.zeros_like(rc),
                                         n_pre=n_pre, n_post=n_post,
                                         omega=omega, coarse_deg=coarse_deg,
                                         gamma=gamma)

                # prolongation: shard-local rows of P against replicated xc
                x = x + segment_sum(
                    jnp.where(pp.mask, pp.vals * xc[pp.cols_global], 0.0),
                    pp.rows_local, rps, is_sorted=True)
            return smooth(x, n_post)

        return cycle(0, b, x)[None]

    spec = P(axis)
    repl = P(None)
    fn = shard_map(body, mesh=mesh,
                   in_specs=(spec, spec, spec, repl, spec, spec),
                   out_specs=spec, check_vma=False)

    @jax.jit
    def jrun(parts_a, pps_a, dbs_a, tail_s, b, x):
        return fn(parts_a, pps_a, dbs_a, tail_s, b, x)

    def cycle_fn(b_sharded, x_sharded):
        return jrun(parts, part_ps, d_blocks, tail, b_sharded, x_sharded)

    return cycle_fn, parts[0]


def make_sharded_stream_vcycle(setup: TwoGridSetup, mesh: Mesh,
                               axis: str = "rows", *, n_pre: int = 3,
                               n_post: int = 3, omega: float = 0.7,
                               coarse_deg: int = 4, coarse_c: float = -3.4,
                               coarse_d: float = -4.0, nb: int = 32,
                               kb=None, interpret: bool = False):
    """Distributed two-grid V-cycle with the fine level on the sharded
    stream kernel (parallel/stream.py) instead of the COO gather path.

    The whole fine-level problem is permuted into the kernel's RCM order
    at setup — A becomes per-shard Pallas stream packs with ring-ppermute
    halos, P's rows are permuted to match, the smoother diagonal rides in
    padded superchunk layout — so smoothing and the residual (the
    dominant fine-level work of a cycle) run at the stream kernel's rate
    while restriction/coarse-solve/prolongation keep `make_sharded_vcycle`'s
    psum/replicated structure. Numerics match the single-device `vcycle`
    on the same setup (fp32 reassociation only).

    Returns (cycle, kern): cycle(b3, x3) advances one V-cycle on padded
    superchunk [t, 8, 128] vectors sharded over `axis` (build them with
    kern.shard(kern.to_padded(v)) from caller-order vectors; map results
    back with kern.from_padded). No reference counterpart — the reference
    is single-device (SURVEY.md §2.5); this is the distributed-throughput
    twin of `models.vcycle.setup_with_stream`.
    """
    from gnnla_tpu.parallel.stream import build_sharded_stream

    if not isinstance(setup.A, SparseOperator):
        raise ValueError("make_sharded_stream_vcycle needs a COO "
                         "TwoGridSetup (build with setup_twogrid)")
    kern = build_sharded_stream(setup.A, mesh, axis, nb=nb, kb=kb,
                                interpret=interpret)
    ndev = mesh.shape[axis]
    n, N = kern.n, kern.padded_len
    R = N // ndev
    t_loc = R // 1024
    nc = setup.P.shape[1]
    Ac = setup.Ac

    import scipy.sparse as sp

    # P with rows in kernel (RCM) order, padded rows empty
    Pk = setup.P.to_scipy().tocsr()
    if kern.perm is not None:
        Pk = Pk[kern.perm]
    Pk = sp.vstack([Pk, sp.csr_matrix((N - n, nc), dtype=Pk.dtype)],
                   format="csr")
    part_p = partition_rows_rect(SparseOperator.from_scipy(Pk), ndev, R)

    # smoother diagonal in kernel order; padded rows carry the padding
    # identity's unit diagonal (their b is 0, so x stays 0 through sweeps)
    d_host = np.asarray(setup.diag, np.float64)
    if kern.perm is not None:
        d_host = d_host[kern.perm]
    d_pad = np.concatenate([d_host, np.ones(N - n)])
    d_pad[d_pad == 0] = 1.0
    d3 = kern.shard(jnp.asarray(d_pad, jnp.float32).reshape(-1, 8, 128))

    local_apply = kern.local_apply

    def body(oi, sm, me, gm, wo, va, p_rows, p_cols, p_vals, p_mask,
             ac_rows, ac_cols, ac_vals, ac_ptr, b3, x3, d3):
        pack = (oi[0], sm[0], me[0], gm[0], wo[0], va[0])
        p_rows, p_cols = p_rows[0], p_cols[0]
        p_vals, p_mask = p_vals[0], p_mask[0]

        def spmv(x3):
            return local_apply(*pack, x3)

        w_over_d = omega / d3

        def smooth(x3, n_iters):
            def step(x3, _):
                return x3 + w_over_d * (b3 - spmv(x3)), None
            x3, _ = jax.lax.scan(step, x3, None, length=n_iters)
            return x3

        x3 = smooth(x3, n_pre)

        # restriction: rc = P^T r, summed across shards, then replicated
        r = (b3 - spmv(x3)).reshape(R)
        rc_part = segment_sum(jnp.where(p_mask, p_vals * r[p_rows], 0.0),
                              p_cols, nc)
        rc = jax.lax.psum(rc_part, axis)

        ac = SparseOperator(rows=ac_rows, cols=ac_cols, vals=ac_vals,
                            row_ptr=ac_ptr, shape=(nc, nc))
        xc = chebyshev(ac, rc, jnp.zeros_like(rc), c=coarse_c, d=coarse_d,
                       deg=coarse_deg)

        # prolongation: shard-local rows of P against replicated xc
        xf = x3.reshape(R) + segment_sum(
            jnp.where(p_mask, p_vals * xc[p_cols], 0.0), p_rows, R,
            is_sorted=True)
        x3 = xf.reshape(t_loc, 8, 128)

        return smooth(x3, n_post)

    spec = P(axis)
    repl = P(None)
    vspec = P(axis, None, None)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=kern.pack_specs + (spec,) * 4 + (repl,) * 4
        + (vspec, vspec, vspec),
        out_specs=vspec, check_vma=False)

    @jax.jit
    def jrun(packs, p_args, ac_args, b3, x3, d3):
        return fn(*packs, *p_args, *ac_args, b3, x3, d3)

    p_args = (part_p.rows_local, part_p.cols_global, part_p.vals,
              part_p.mask)
    ac_args = (Ac.rows, Ac.cols, Ac.vals, Ac.row_ptr)

    def cycle(b3, x3):
        return jrun(kern.packs, p_args, ac_args, b3, x3, d3)

    return cycle, kern
