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

Forward-only: the sharded apply has no custom VJP (the single-chip
`StreamSpMV` is the differentiable path; sharded training shards the
*batch*, not one operator). No reference counterpart — the reference is
single-device (SURVEY.md §2.5); the scaling contract is BASELINE.md's
>= 80% edges/s efficiency, modeled by `stream_scaling_model`.
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
                         interpret: bool = False) -> ShardedStreamSpMV:
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

    h = _shard_halo_tiles(A, ndev, R)
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
    return ShardedStreamSpMV(
        packs=packs, mesh=mesh, axis=axis, n=n, nnz=nnz,
        t_global=t_global, h_tiles=h, w_sc=w_max, n_steps=s_max, nb=nb,
        perm=perm, apply=apply, local_apply=local_apply,
        pack_specs=pack_specs)


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
