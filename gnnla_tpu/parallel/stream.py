"""Row-block-sharded stream SpMV: the general-graph fast path on a mesh.

The distributed twin of ops/pallas_stream (the kernel that replaces the
reference's `torch_scatter.scatter` execution model, MatVecGNN.py:43-62).
Partitioning is the same RCM insight that makes the single-chip kernel
work: after reverse-Cuthill-McKee ordering, the rows of a block shard
reference a *bounded* column window, so each device only needs

  its own x block  +  `h` superchunks of halo from each ring neighbor,

exchanged with two `ppermute`s — exactly the stencil path's halo pattern
(parallel/stencil.py) generalized to unstructured operators, with the
halo reach measured from the matrix instead of the stencil shape.

SPMD uniformity: `shard_map` traces ONE program for all devices, but each
shard's stream pack is data-dependent (different nnz, window width, step
count). The packs are therefore built per shard with forced-uniform
statics — shared chunk-class bits `kb`, window width `w_sc = max over
shards`, step count padded with no-op steps (`pad_steps`) — then stacked
on a leading mesh axis so every device reads its own slice while the
single `pallas_call` shape fits all of them.

Differentiable (round 4): `build_sharded_stream(..., with_grad=True)`
adds a custom VJP to the sharded apply — the x cotangent runs the
TRANSPOSED per-shard packs (A_d^T on the halo-extended column window)
followed by the REVERSED halo exchange (the halo slabs of the gradient
are scattered-ADDED back to their owner shards), and the vals cotangent
is the real per-slot gradient ybar[row] * x_ext[col] reconstructed from
the packed words, exactly like the single-chip StreamSpMV. This lets the
spectral loss train THROUGH a row-sharded operator (model-parallel
training over one large matrix — the north-star scaling story). No
reference counterpart — the reference is single-device (SURVEY.md §2.5);
the scaling contract is BASELINE.md's >= 80% edges/s efficiency, modeled
by `stream_scaling_model`.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnnla_tpu.ops.pallas_stream import (NSUB, TILE, _make_call,
                                         build_stream, pad_steps, rcm_csr)
from gnnla_tpu.parallel.stencil import HBM_BW, ICI_BW


def _pad_square(A_csr, n_pad: int):
    """Pad A to n_pad x n_pad with unit diagonal on the new rows (keeps
    every shard's pack non-empty; the padded region of x is zero so the
    extra rows never change real outputs)."""
    from scipy import sparse as sp

    n = A_csr.shape[0]
    if n_pad == n:
        return A_csr
    eye = sp.identity(n_pad - n, dtype=np.float32, format="csr")
    return sp.bmat([[A_csr, None], [None, eye]], format="csr")


def _shard_halo_tiles(A_csr, ndev: int, rows_per_shard: int) -> int:
    """Max over shards of the column overreach beyond the shard's own row
    range, in whole superchunk tiles."""
    h = 0
    for d in range(ndev):
        sub = A_csr[d * rows_per_shard: (d + 1) * rows_per_shard]
        if sub.nnz == 0:
            continue
        cmin = int(sub.indices.min())
        cmax = int(sub.indices.max())
        lo = d * rows_per_shard - cmin
        hi = cmax + 1 - (d + 1) * rows_per_shard
        h = max(h, -(-lo // TILE) if lo > 0 else 0,
                -(-hi // TILE) if hi > 0 else 0)
    return h


@dataclasses.dataclass
class ShardedStreamSpMV:
    """Compiled sharded stream SpMV over a 1D mesh axis.

    apply(packs, x3) : jitted; x3 is the GLOBAL padded vector in
                       superchunk layout [t_global, 8, 128], row-sharded
                       over the mesh axis; returns y3 in the same layout
                       and sharding (chainable — solvers iterate on it).
    matvec(x)        : convenience on caller-order [n] host/global vectors.
    """

    packs: Tuple
    mesh: Mesh
    axis: str
    n: int
    nnz: int
    t_global: int
    h_tiles: int
    w_sc: int
    n_steps: int
    nb: int
    perm: Optional[np.ndarray]
    apply: callable = None
    local_apply: callable = None  # per-shard body for composition inside
    #                               a caller's shard_map (see vcycle)
    pack_specs: Tuple = ()
    # --- differentiable path (with_grad=True) -------------------------
    # diff_args = (fwd packs, transposed packs, (tile_of_unit stacks,
    # tile_wstart stacks)); apply_diff(diff_args, x3) has a full custom
    # VJP: d/dx = A^T ybar (transposed packs + reversed halo scatter-add),
    # d/dvals = ybar[row] * x_ext[col] per packed slot.
    diff_args: Optional[Tuple] = None
    apply_diff: callable = None

    @property
    def padded_len(self) -> int:
        return self.t_global * TILE

    def to_padded(self, x):
        xk = x[self.perm] if self.perm is not None else x
        pad = self.padded_len - self.n
        return jnp.pad(jnp.asarray(xk, jnp.float32), (0, pad)
                       ).reshape(-1, 8, 128)

    def shard(self, x3):
        return jax.device_put(
            x3, NamedSharding(self.mesh, P(self.axis, None, None)))

    def from_padded(self, y3) -> np.ndarray:
        """Padded superchunk layout -> caller-order [n] host vector."""
        yk = np.asarray(y3).reshape(-1)[: self.n]
        if self.perm is not None:
            return yk[np.argsort(self.perm)]
        return yk

    def matvec(self, x):
        return self.from_padded(
            self.apply(self.packs, self.shard(self.to_padded(x))))


def build_sharded_stream(op, mesh: Mesh, axis: str = "rows", *,
                         reorder: bool = True, nb: int = 32,
                         kb: Optional[int] = None,
                         interpret: bool = False,
                         with_grad: bool = False,
                         min_halo_tiles: int = 0) -> ShardedStreamSpMV:
    """Build the sharded stream kernel from a SparseOperator (host setup).

    Row blocks are contiguous ranges of the (RCM-ordered) operator, one
    per device on `axis`; the halo reach is measured from the matrix and
    must stay below one shard's tile count (true whenever the RCM
    bandwidth is small relative to n/ndev — the same regime where the
    single-chip kernel's windows are narrow).
    """
    A = op.to_scipy().tocsr() if hasattr(op, "to_scipy") else op.tocsr()
    A.sort_indices()
    perm = None
    if reorder:
        A, perm = rcm_csr(A)
    n = A.shape[0]
    ndev = mesh.shape[axis]

    t_global = -(-n // TILE)
    t_global = -(-t_global // ndev) * ndev
    N = t_global * TILE
    A = _pad_square(A, N)
    R = N // ndev
    t_loc = R // TILE

    # min_halo_tiles > 0 forces the halo-exchange path (concat + ring
    # ppermute) even when the matrix needs none — e.g. a 1-device mesh on
    # real hardware, where the self-permute still emits a collective-permute
    # HLO so Mosaic compiles the exact multichip program (hardware_check)
    h = max(_shard_halo_tiles(A, ndev, R), min_halo_tiles)
    if h > t_loc:  # h == t_loc is the whole neighbor block — still ring
        raise ValueError(
            f"halo reach {h} tiles >= {t_loc}-tile shard: RCM bandwidth too "
            f"wide for {ndev} shards at n={n}; use fewer devices or the "
            "COO sharded path (parallel/spmv.py)")
    ncol_ext = R + 2 * h * TILE

    from scipy import sparse as sp

    def shard_fmt(d, kb_use, min_w_sc):
        sub = A[d * R: (d + 1) * R].tocsr()
        base = d * R - h * TILE
        if sub.nnz == 0:  # pragma: no cover — padded diag prevents this
            sub = sp.csr_matrix(
                (np.zeros(1, np.float32),
                 np.array([d * R - base], np.int64),
                 np.concatenate([[0], np.ones(R, np.int64)])),
                shape=(R, ncol_ext))
        else:
            sub = sp.csr_matrix(
                (sub.data.astype(np.float32), sub.indices - base,
                 sub.indptr), shape=(R, ncol_ext))
        return build_stream(sub, nb=nb, kb=kb_use, n_cols=ncol_ext,
                            min_w_sc=min_w_sc)

    fmts = []
    kb_use = kb
    for d in range(ndev):
        f = shard_fmt(d, kb_use, 0)
        kb_use = f.kb  # shard 0's auto-pick becomes the shared kb
        fmts.append(f)
    w_max = max(f.w_sc for f in fmts)
    fmts = [f if f.w_sc == w_max else shard_fmt(d, kb_use, w_max)
            for d, f in enumerate(fmts)]
    s_max = max(f.n_steps for f in fmts)
    fmts = [pad_steps(f, s_max) for f in fmts]

    def stack(field):
        return jnp.asarray(np.stack([getattr(f, field) for f in fmts]))

    packs = (stack("out_idx"), stack("step_meta"), stack("meta"),
             stack("gmeta"), stack("word"), stack("vals"))
    pack_specs = tuple(P(axis, *([None] * (p.ndim - 1))) for p in packs)
    packs = tuple(jax.device_put(p, NamedSharding(mesh, s))
                  for p, s in zip(packs, pack_specs))

    call = _make_call(fmts[0], interpret=interpret)

    def local_apply(oi, sm, me, gm, wo, va, x_l):
        """Per-shard stream SpMV on a LOCAL [t_loc, 8, 128] block (pack
        operands already stripped of the shard axis). Callable only inside
        a shard_map body over `mesh`/`axis` — it issues the halo ppermutes
        itself. Exposed so larger compositions (parallel/vcycle.py's
        stream-backed cycle) can embed the fast SpMV beside collectives."""
        if h > 0:
            top = jax.lax.ppermute(
                x_l[-h:], axis, [(i, (i + 1) % ndev) for i in range(ndev)])
            bot = jax.lax.ppermute(
                x_l[:h], axis, [(i, (i - 1) % ndev) for i in range(ndev)])
            x_ext = jnp.concatenate([top, x_l, bot], axis=0)
        else:
            x_ext = x_l
        return call(oi, sm, me, gm, wo, va, x_ext)

    def body(oi, sm, me, gm, wo, va, x_l):
        return local_apply(oi[0], sm[0], me[0], gm[0], wo[0], va[0], x_l)

    vspec = P(axis, None, None)
    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, which the default vma checker rejects inside shard_map
    fn = shard_map(body, mesh=mesh, in_specs=pack_specs + (vspec,),
                   out_specs=vspec, check_vma=False)
    apply = jax.jit(lambda packs, x3: fn(*packs, x3))

    nnz = sum(f.nnz for f in fmts) - (N - n)  # minus the padding diagonal
    kern = ShardedStreamSpMV(
        packs=packs, mesh=mesh, axis=axis, n=n, nnz=nnz,
        t_global=t_global, h_tiles=h, w_sc=w_max, n_steps=s_max, nb=nb,
        perm=perm, apply=apply, local_apply=local_apply,
        pack_specs=pack_specs)
    if with_grad:
        _attach_sharded_vjp(kern, A, fmts, call, local_apply, h, R, t_loc,
                            ncol_ext, ndev, nb, interpret)
    return kern


def _attach_sharded_vjp(kern: ShardedStreamSpMV, A, fmts, call_f,
                        local_apply, h, R, t_loc, ncol_ext, ndev, nb,
                        interpret):
    """Build the differentiable sharded apply (see module docstring).

    Backward structure per shard d (all inside one shard_map):
      x_ext  = [x_{d-1}[-h:], x_d, x_{d+1}[:h]]     (same ring as forward)
      g_ext  = A_d^T ybar_d            (transposed pack, rectangular:
                                        R rows of A -> ncol_ext outputs)
      xbar_d = g_ext[center]
               + slab from d+1 (its g_ext top = grads for x_d's tail)
               + slab from d-1 (its g_ext bottom = grads for x_d's head)
      dvals  = ybar[row] * x_ext[col] per packed slot (word decode)
    """
    from scipy import sparse as sp

    mesh, axis = kern.mesh, kern.axis

    # transposed per-shard packs: A_d^T maps ybar [R] -> g_ext [ncol_ext]
    def shard_fmt_t(d, kb_use, min_w_sc):
        base = d * R - h * TILE
        sub = A[d * R: (d + 1) * R].tocsr()
        sub = sp.csr_matrix(
            (sub.data.astype(np.float32), sub.indices - base, sub.indptr),
            shape=(R, ncol_ext))
        At = sub.T.tocsr()
        At.sort_indices()
        return build_stream(At, nb=nb, kb=kb_use, n_cols=R,
                            min_w_sc=min_w_sc)

    fmts_t = []
    kb_t = None
    for d in range(ndev):
        f = shard_fmt_t(d, kb_t, 0)
        kb_t = f.kb
        fmts_t.append(f)
    w_max_t = max(f.w_sc for f in fmts_t)
    fmts_t = [f if f.w_sc == w_max_t else shard_fmt_t(d, kb_t, w_max_t)
              for d, f in enumerate(fmts_t)]
    s_max_t = max(f.n_steps for f in fmts_t)
    fmts_t = [pad_steps(f, s_max_t) for f in fmts_t]

    def stack(fs, field):
        return jnp.asarray(np.stack([getattr(f, field) for f in fs]))

    packs_t = (stack(fmts_t, "out_idx"), stack(fmts_t, "step_meta"),
               stack(fmts_t, "meta"), stack(fmts_t, "gmeta"),
               stack(fmts_t, "word"), stack(fmts_t, "vals"))
    specs_t = tuple(P(axis, *([None] * (p.ndim - 1))) for p in packs_t)
    packs_t = tuple(jax.device_put(p, NamedSharding(mesh, s))
                    for p, s in zip(packs_t, specs_t))
    call_t = _make_call(fmts_t[0], interpret=interpret)

    # per-shard decode tables for the vals cotangent (fwd-pack layout)
    tou = stack(fmts, "tile_of_unit")
    tws = stack(fmts, "tile_wstart")
    aux = (jax.device_put(tou, NamedSharding(mesh, P(axis, None))),
           jax.device_put(tws, NamedSharding(mesh, P(axis, None))))
    aux_specs = (P(axis, None), P(axis, None))
    n_units_f = fmts[0].n_units

    def exchange(x_l):
        if h == 0:
            return x_l
        top = jax.lax.ppermute(
            x_l[-h:], axis, [(i, (i + 1) % ndev) for i in range(ndev)])
        bot = jax.lax.ppermute(
            x_l[:h], axis, [(i, (i - 1) % ndev) for i in range(ndev)])
        return jnp.concatenate([top, x_l, bot], axis=0)

    def vals_cot_local(me, gm, wo, tou_l, tws_l, x_ext, ybar_l):
        word = wo.reshape(n_units_f, NSUB, 128)
        sc = jnp.bitwise_and(me.reshape(n_units_f), 0x7FFF)
        rg = jnp.bitwise_and(gm.reshape(n_units_f, NSUB), 7)
        rowl1 = jnp.bitwise_and(jnp.right_shift(word, 18), 255)
        m = jnp.bitwise_and(jnp.right_shift(word, 7), 7)
        lo = jnp.bitwise_and(word, 127)
        row = (tou_l[:, None, None] * TILE + rg[:, :, None] * 128
               + rowl1 - 1)
        col = ((tws_l[tou_l] + sc)[:, None, None] * TILE + m * 128 + lo)
        valid = rowl1 >= 1
        g = (ybar_l.reshape(-1)[jnp.where(valid, row, 0)]
             * x_ext.reshape(-1)[col])
        return jnp.where(valid, g, 0.0)

    def body_bwd(oi_t, sm_t, me_t, gm_t, wo_t, va_t,
                 me_f, gm_f, wo_f, tou_s, tws_s, x_l, ybar_l):
        x_ext = exchange(x_l)
        g_ext = call_t(oi_t[0], sm_t[0], me_t[0], gm_t[0], wo_t[0],
                       va_t[0], ybar_l)
        own = g_ext[h: h + t_loc] if h > 0 else g_ext
        if h > 0:
            # d+1's top slab holds grads for x_d's tail; d-1's bottom slab
            # holds grads for x_d's head — reversed ring, scatter-ADD
            from_next = jax.lax.ppermute(
                g_ext[:h], axis, [(i, (i - 1) % ndev) for i in range(ndev)])
            from_prev = jax.lax.ppermute(
                g_ext[t_loc + h:], axis,
                [(i, (i + 1) % ndev) for i in range(ndev)])
            own = own.at[-h:].add(from_next).at[:h].add(from_prev)
        dvals = vals_cot_local(me_f[0], gm_f[0], wo_f[0], tou_s[0],
                               tws_s[0], x_ext, ybar_l)
        return own, dvals[None]  # leading mesh axis for the stacked pack

    vspec = P(axis, None, None)
    fwd_specs = kern.pack_specs
    fn_bwd = shard_map(
        body_bwd, mesh=mesh,
        in_specs=specs_t + fwd_specs[2:5] + aux_specs + (vspec, vspec),
        out_specs=(vspec, P(axis, None, None, None)), check_vma=False)
    jit_bwd = jax.jit(lambda pt, pf, ax, x3, yb: fn_bwd(
        *pt, pf[2], pf[3], pf[4], ax[0], ax[1], x3, yb))

    fwd_apply = kern.apply

    @jax.custom_vjp
    def apply_diff(diff_args, x3):
        packs_f, _, _ = diff_args
        return fwd_apply(packs_f, x3)

    def vfwd(diff_args, x3):
        return apply_diff(diff_args, x3), (diff_args, x3)

    def _zero_cot(x):
        # integer layout arrays carry float0 tangents (jax convention)
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    def vbwd(res, ybar):
        diff_args, x3 = res
        packs_f, packs_t_, aux_ = diff_args
        xbar, dvals = jit_bwd(packs_t_, packs_f, aux_, x3, ybar)
        zf = jax.tree_util.tree_map(_zero_cot, packs_f)
        zt = jax.tree_util.tree_map(_zero_cot, packs_t_)
        za = jax.tree_util.tree_map(_zero_cot, aux_)
        cot = ((zf[:5] + (dvals.astype(packs_f[5].dtype),)), zt, za)
        return (cot, xbar)

    apply_diff.defvjp(vfwd, vbwd)
    kern.diff_args = (kern.packs, packs_t, aux)
    kern.apply_diff = apply_diff


def stream_scaling_model(kern: ShardedStreamSpMV, *,
                         scale_rows: float = 1.0,
                         hbm_bw: float = HBM_BW,
                         ici_bw: float = ICI_BW) -> dict:
    """Comm-vs-local-work accounting for one sharded stream SpMV.

    Local HBM traffic per chip: 8 bytes per packed edge slot (word+val)
    + the window DMAs (w_sc superchunks x 4 KiB per tile) + the output
    write. Comm: 2h superchunk tiles of halo per chip over ICI (top and
    bottom ride different ring links concurrently).

    scale_rows > 1 projects the same operator family at a larger n: the
    halo is set by the RCM bandwidth (scale-free), local work grows with
    rows/chip — so efficiency is a floor, not a ceiling, at scale.
    """
    ndev = kern.mesh.shape[kern.axis]
    slots = kern.n_steps * kern.nb * NSUB * 128  # edge slots per shard
    t_loc = kern.t_global // ndev
    local_bytes = (slots * 8 + t_loc * kern.w_sc * TILE * 4
                   + t_loc * TILE * 4) * scale_rows
    t_local = local_bytes / hbm_bw
    comm_bytes = 2 * kern.h_tiles * TILE * 4 if ndev > 1 else 0
    t_comm = comm_bytes / ici_bw
    eff_serial = t_local / (t_local + t_comm) if t_local else 1.0
    eff_overlap = min(1.0, t_local / max(t_local, t_comm)) \
        if t_local else 1.0
    return {
        "ndev": ndev,
        "local_bytes_per_chip": local_bytes,
        "comm_bytes_per_chip": comm_bytes,
        "efficiency_serial": eff_serial,
        "efficiency_overlapped": eff_overlap,
        "edges_per_s_aggregate":
            kern.nnz * scale_rows / max(t_local + t_comm, 1e-30),
    }
