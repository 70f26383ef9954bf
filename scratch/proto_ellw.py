"""Prototype: windowed-gather ELL SpMV for general (unstructured) graphs.

Validates on-chip: scalar prefetch + manual double-buffered window DMA +
dynamic fori_loop chunk bounds + tpu.dynamic_gather, vs scipy.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024  # rows per tile (8 lane-groups of 128)


def build_ellw(A_csr):
    """Host setup: CSR (cols sorted in-row) -> windowed-gather ELL arrays."""
    n = A_csr.shape[0]
    indptr = A_csr.indptr.astype(np.int64)
    cols = A_csr.indices.astype(np.int64)
    vals = A_csr.data.astype(np.float32)
    deg = np.diff(indptr)
    K = int(deg.max())
    n_tiles = -(-n // TILE)
    L = n_tiles * TILE

    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    slot = np.arange(cols.size, dtype=np.int64) - indptr[rows]
    tile = rows // TILE

    bnd = np.searchsorted(rows, np.arange(n_tiles) * TILE)
    min_c = np.minimum.reduceat(cols, bnd)
    max_c = np.maximum.reduceat(cols, bnd)
    start = (min_c // 128) * 128
    W = int((max_c - start + 1).max())
    W = -(-W // 128) * 128
    if W > L:
        raise ValueError(f"window {W} exceeds padded length {L}")
    start = np.minimum(start, L - W)

    # default idx per row = its first stored col (diag guaranteed present),
    # so padded slots never widen a unit's chunk range
    first_local = cols[indptr[:-1]] - start[np.arange(n) // TILE]
    first_local = np.concatenate(
        [first_local, np.full(L - n, first_local[-1] if n else 0)])
    # rows beyond n: point at tile of last row -> local idx of last real row
    g = (rows % TILE) // 128
    lane = rows % 128
    sub = slot * 8 + g

    idx = np.zeros((n_tiles, K * 8, 128), np.int32)
    idx[:] = first_local.reshape(n_tiles, 8, 128)[:, None, :, :].reshape(
        n_tiles, 1, 8, 128).repeat(K, 1).reshape(n_tiles, K * 8, 128)
    val = np.zeros((n_tiles, K * 8, 128), np.float32)
    idx[tile, sub, lane] = (cols - start[tile]).astype(np.int32)
    val[tile, sub, lane] = vals

    hi = idx >> 7
    bounds = np.stack([hi.reshape(n_tiles, K, 8 * 128).min(axis=2),
                       hi.reshape(n_tiles, K, 8 * 128).max(axis=2) + 1],
                      axis=-1).astype(np.int32)
    return dict(idx=idx, val=val, start=start.astype(np.int32),
                bounds=bounds, n=n, W=W, K=K, n_tiles=n_tiles, L=L,
                nnz=cols.size)


def make_call(meta, interpret=False):
    n_tiles, K, W, L = meta["n_tiles"], meta["K"], meta["W"], meta["L"]

    def kernel(start_ref, bounds_ref, idx_ref, val_ref, x_hbm, y_ref,
               win0, win1, sem0, sem1):
        i = pl.program_id(0)
        bufs = (win0, win1)
        sems = (sem0, sem1)

        def dma(slot, t):
            s = pl.multiple_of(start_ref[t], 128)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(s, W)], bufs[slot], sems[slot])

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        def compute(win):
            y = jnp.zeros((8, 128), jnp.float32)
            for k in range(K):
                idx_u = idx_ref[0, 8 * k:8 * k + 8, :]
                lo = jnp.bitwise_and(idx_u, 127)
                hi = jnp.right_shift(idx_u, 7)
                w0 = bounds_ref[i, k, 0]
                w1 = bounds_ref[i, k, 1]

                def body(w, acc):
                    chunk = jax.lax.broadcast_in_dim(
                        win[pl.ds(w * 128, 128)], (8, 128), (1,))
                    gathered = jnp.take_along_axis(chunk, lo, axis=1)
                    return jnp.where(hi == w, gathered, acc)

                acc = jax.lax.fori_loop(w0, w1, body,
                                        jnp.zeros((8, 128), jnp.float32))
                y = y + acc * val_ref[0, 8 * k:8 * k + 8, :]
            y_ref[0] = y

        for parity in (0, 1):
            @pl.when(i % 2 == parity)
            def _(parity=parity):
                @pl.when(i + 1 < n_tiles)
                def _():
                    dma(1 - parity, i + 1).start()
                dma(parity, i).wait()
                compute(bufs[parity])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, K * 8, 128), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, K * 8, 128), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((W,), jnp.float32),
            pltpu.VMEM((W,), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
        interpret=interpret)
    return call


def main():
    interpret = "--interpret" in sys.argv
    n = int(sys.argv[sys.argv.index("--n")+1]) if "--n" in sys.argv else 1 << 14
    rng = np.random.default_rng(7)
    import scipy.sparse as sp
    from scipy.spatial import Delaunay
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    pts = rng.random((n, 2))
    tri = Delaunay(pts)
    s = tri.simplices
    e = np.concatenate([s[:, [0, 1]], s[:, [1, 2]], s[:, [2, 0]]])
    e = np.concatenate([e, e[:, ::-1]])
    A = sp.coo_matrix((np.ones(e.shape[0]), (e[:, 0], e[:, 1])),
                      shape=(n, n)).tocsr()
    A.data[:] = 1.0
    A = A + A.T
    A.data[:] = -1.0
    lap = sp.diags(np.asarray(-A.sum(axis=1)).ravel()) + A
    perm = reverse_cuthill_mckee(lap.tocsr(), symmetric_mode=True)
    lap = lap.tocsr()[perm][:, perm].tocsr()
    lap.sort_indices()
    lap = lap.astype(np.float32)

    t0 = time.perf_counter()
    meta = build_ellw(lap)
    print(f"setup {time.perf_counter()-t0:.2f}s  K={meta['K']} W={meta['W']} "
          f"tiles={meta['n_tiles']} nnz={meta['nnz']}", file=sys.stderr)
    call = make_call(meta, interpret=interpret)

    x = rng.standard_normal(meta["n"]).astype(np.float32)
    x_pad = np.zeros(meta["L"] + meta["W"], np.float32)
    x_pad[:meta["n"]] = x
    run = jax.jit(lambda s_, b_, i_, v_, xp: call(s_, b_, i_, v_, xp))
    y = run(jnp.asarray(meta["start"]), jnp.asarray(meta["bounds"]),
            jnp.asarray(meta["idx"]), jnp.asarray(meta["val"]),
            jnp.asarray(x_pad))
    y = np.asarray(y).reshape(-1)[:meta["n"]]
    expect = lap @ x
    err = np.abs(y - expect).max() / (np.abs(expect).max() + 1e-30)
    print(f"rel err: {err:.3e}", file=sys.stderr)
    assert err < 1e-5


if __name__ == "__main__":
    main()
