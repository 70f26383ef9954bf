"""Mini probe of the stream-SpMV kernel building blocks on TPU:
  - window DMA (HBM 3D -> VMEM 3D scratch) with parity double-buffer driven
    by scalar-prefetch meta
  - dynamic leading-dim index into 3D VMEM scratch (superchunk select)
  - take_along_axis gather (m-select) + deposit gather with int8 indices
  - revisited out-block accumulation with index_map from scalar prefetch

Synthetic workload: 2 tiles of 1024 rows; random edges; checks y == A @ x.
"""
import sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024
NSUB = 8          # groups (sublanes) per block
MAXMULT = 4       # deposit passes


def kernel(meta_ref, idx_ref, val_ref, dep_ref, x_hbm, y_ref,
           win0, win1, sem0, sem1):
    u = pl.program_id(0)
    nsc = x_hbm.shape[0]  # unused; window rows
    bufs = (win0, win1)
    sems = (sem0, sem1)
    W_sc = win0.shape[0]

    tile = meta_ref[u, 0]
    first = meta_ref[u, 1]
    last = meta_ref[u, 2]
    sc_a = meta_ref[u, 3]
    sc_b = meta_ref[u, 4]
    has_b = meta_ref[u, 5]
    wstart = meta_ref[u, 6]       # window start in superchunk units
    next_wstart = meta_ref[u, 7]  # next tile's window start (or -1)

    def dma(slot, ws):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(ws, W_sc)], bufs[slot], sems[slot])

    # first unit of first tile: fetch window 0 synchronously-ish
    @pl.when(jnp.logical_and(u == 0, first == 1))
    def _():
        dma(0, wstart).start()

    # on the first unit of a tile, prefetch the NEXT tile's window
    @pl.when(jnp.logical_and(first == 1, next_wstart >= 0))
    def _():
        parity = tile % 2

        @pl.when(parity == 0)
        def _():
            dma(1, next_wstart).start()

        @pl.when(parity == 1)
        def _():
            dma(0, next_wstart).start()

    def compute(win):
        @pl.when(first == 1)
        def _():
            y_ref[0] = jnp.zeros_like(y_ref[0])

        SCa = win[sc_a]                       # (8,128) dynamic leading index
        SCb = win[sc_b]
        idx = idx_ref[0]                      # (NSUB,128) int32: scsel|m|lo
        lo = jnp.bitwise_and(idx, 127)
        m = jnp.bitwise_and(jnp.right_shift(idx, 7), 7)
        scsel = jnp.right_shift(idx, 10)
        g = jnp.zeros((NSUB, 128), jnp.float32)
        for mm in range(8):
            ca = jax.lax.broadcast_in_dim(SCa[mm], (NSUB, 128), (1,))
            ga = jnp.take_along_axis(ca, lo, axis=1)
            g = jnp.where(jnp.logical_and(scsel == 0, m == mm), ga, g)

        @pl.when(has_b == 1)
        def _():
            pass  # handled below via python-level trick; see note

        # NOTE: pl.when can't return values; fold b-pass unconditionally
        gb = g
        for mm in range(8):
            cb = jax.lax.broadcast_in_dim(SCb[mm], (NSUB, 128), (1,))
            gbb = jnp.take_along_axis(cb, lo, axis=1)
            gb = jnp.where(jnp.logical_and(scsel == 1, m == mm), gbb, gb)
        g = gb

        prod = g * val_ref[0]

        acc = y_ref[0]
        for p in range(MAXMULT):
            dsrc = dep_ref[0, p].astype(jnp.int32)   # (NSUB,128) int8->int32
            valid = dsrc >= 0
            dep = jnp.take_along_axis(prod, jnp.where(valid, dsrc, 0), axis=1)
            acc = acc + jnp.where(valid, dep, 0.0)
        y_ref[0] = acc

    for parity in (0, 1):
        @pl.when(tile % 2 == parity)
        def _(parity=parity):
            dma(parity, wstart).wait_with_check = None  # placeholder no-op
            compute(bufs[parity])


def kernel2(meta_ref, idx_ref, val_ref, dep_ref, x_hbm, y_ref,
            win0, win1, sem0, sem1):
    """Same as kernel but with correct DMA wait placement."""
    u = pl.program_id(0)
    bufs = (win0, win1)
    sems = (sem0, sem1)
    W_sc = win0.shape[0]

    tile = meta_ref[u, 0]
    first = meta_ref[u, 1]
    sc_a = meta_ref[u, 3]
    sc_b = meta_ref[u, 4]
    wstart = meta_ref[u, 6]
    next_wstart = meta_ref[u, 7]

    def dma(slot, ws):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(ws, W_sc)], bufs[slot], sems[slot])

    @pl.when(u == 0)
    def _():
        dma(0, wstart).start()

    @pl.when(jnp.logical_and(first == 1, next_wstart >= 0))
    def _():
        @pl.when(tile % 2 == 0)
        def _():
            dma(1, next_wstart).start()

        @pl.when(tile % 2 == 1)
        def _():
            dma(0, next_wstart).start()

    def compute(win):
        @pl.when(first == 1)
        def _():
            y_ref[0] = jnp.zeros_like(y_ref[0])

        SCa = win[sc_a]
        SCb = win[sc_b]
        idx = idx_ref[0]
        lo = jnp.bitwise_and(idx, 127)
        m = jnp.bitwise_and(jnp.right_shift(idx, 7), 7)
        scsel = jnp.right_shift(idx, 10)
        g = jnp.zeros((NSUB, 128), jnp.float32)
        for src, SC in ((0, SCa), (1, SCb)):
            for mm in range(8):
                c = jax.lax.broadcast_in_dim(SC[mm], (NSUB, 128), (1,))
                gg = jnp.take_along_axis(c, lo, axis=1)
                g = jnp.where(jnp.logical_and(scsel == src, m == mm), gg, g)

        prod = g * val_ref[0]
        dacc = jnp.zeros((NSUB, 128), jnp.float32)
        for p in range(MAXMULT):
            dsrc = dep_ref[0, p].astype(jnp.int32)
            valid = dsrc >= 0
            dep = jnp.take_along_axis(prod, jnp.where(valid, dsrc, 0), axis=1)
            dacc = dacc + jnp.where(valid, dep, 0.0)
        # route sublane-group s -> rowgroup meta[u, 8+s] via one-hot matmul
        rg = jnp.stack([meta_ref[u, 8 + s] for s in range(NSUB)])  # (8,) lanes
        oht = (jax.lax.broadcasted_iota(jnp.int32, (8, NSUB), 0)
               == jax.lax.broadcast_in_dim(rg, (8, NSUB), (1,))
               ).astype(jnp.float32)
        y_ref[0] = y_ref[0] + jax.lax.dot_general(
            oht, dacc, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    for parity in (0, 1):
        @pl.when(tile % 2 == parity)
        def _(parity=parity):
            # wait for this tile's window once, at its first unit
            @pl.when(first == 1)
            def _():
                dma(parity, wstart).wait()
            compute(bufs[parity])


def main():
    rng = np.random.default_rng(3)
    n = 2 * TILE
    W_sc = 2  # window = 2 superchunks
    # random edges: each row gets 5 edges within a window of 2048 cols
    K = 5
    tile_of = np.arange(n) // TILE
    wstart_sc = np.array([0, 0])  # both tiles' windows start at sc 0 (n=2048)
    cols = rng.integers(0, n, size=(n, K))
    vals = rng.standard_normal((n, K)).astype(np.float32)
    A = np.zeros((n, n), np.float32)
    for r in range(n):
        for k in range(K):
            A[r, cols[r, k]] += vals[r, k]

    # build groups: per (tile, rg): edges = 128 rows x K; distinct rows per
    # pass -> slot (lane=row%128), deposit pass p = k (K<=MAXMULT+1? K=5>4!)
    # use 2 groups per (tile,rg): k in 0..3 -> group A passes 0..3 is wrong;
    # simpler: group j = edges k=j (one edge per row per group) -> 5 groups
    # of 128 lanes each per (tile, rg), deposit pass 0 only.
    units = []
    for t in range(2):
        grp_list = []
        for rg in range(8):
            rows0 = t * TILE + rg * 128 + np.arange(128)
            for k in range(K):
                c = cols[rows0, k]
                v = vals[rows0, k]
                local = c - wstart_sc[t] * 1024
                scsel = (local // 1024 >= 1).astype(np.int32)
                mm = (local // 128) % 8
                lo = local % 128
                idx = (scsel << 10) | (mm << 7) | lo
                dep = np.full((MAXMULT, 128), -1, np.int8)
                dep[0] = np.arange(128, dtype=np.int8)  # lane e -> row lane e
                grp_list.append((idx.astype(np.int32), v, dep, rg))
        # pack groups into units of NSUB
        while len(grp_list) % NSUB:
            grp_list.append((np.zeros(128, np.int32),
                             np.zeros(128, np.float32),
                             np.full((MAXMULT, 128), -1, np.int8), 0))
        for j in range(0, len(grp_list), NSUB):
            chunk = grp_list[j:j + NSUB]
            units.append((t, 1 if j == 0 else 0,
                          np.stack([c[0] for c in chunk]),
                          np.stack([c[1] for c in chunk]),
                          np.stack([c[2] for c in chunk], axis=1),
                          np.array([c[3] for c in chunk], np.int32)))
    n_units = len(units)
    meta = np.zeros((n_units, 16), np.int32)
    idx_arr = np.zeros((n_units, NSUB, 128), np.int32)
    val_arr = np.zeros((n_units, NSUB, 128), np.float32)
    dep_arr = np.full((n_units, MAXMULT, NSUB, 128), -1, np.int8)
    for i, (t, first, idx, v, dep, rgs) in enumerate(units):
        meta[i, :8] = [t, first, 0, 0, 1, 1, wstart_sc[t],
                       wstart_sc[1] if (t == 0 and first) else -1]
        meta[i, 8:8 + NSUB] = rgs
        idx_arr[i] = idx
        val_arr[i] = v
        dep_arr[i] = dep

    x = rng.standard_normal(n).astype(np.float32)
    x3 = x.reshape(-1, 8, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_units,),
        in_specs=[
            pl.BlockSpec((1, NSUB, 128), lambda u, m: (u, 0, 0)),
            pl.BlockSpec((1, NSUB, 128), lambda u, m: (u, 0, 0)),
            pl.BlockSpec((1, MAXMULT, NSUB, 128), lambda u, m: (u, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda u, m: (m[u, 0], 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((W_sc, 8, 128), jnp.float32),
            pltpu.VMEM((W_sc, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    call = pl.pallas_call(
        kernel2, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, 8, 128), jnp.float32))
    y = jax.jit(call)(jnp.asarray(meta), jnp.asarray(idx_arr),
                      jnp.asarray(val_arr), jnp.asarray(dep_arr),
                      jnp.asarray(x3))
    y = np.asarray(y).reshape(-1)
    expect = A @ x
    err = np.abs(y - expect).max() / np.abs(expect).max()
    print(f"stream-kernel probe rel err: {err:.2e}", file=sys.stderr)
    assert err < 1e-5, "MISMATCH"
    print("OK", file=sys.stderr)


if __name__ == "__main__":
    main()
