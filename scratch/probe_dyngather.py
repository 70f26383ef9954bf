"""Probe tpu.dynamic_gather (via take_along_axis) inside Pallas on v5e.

Design being probed: general-graph SpMV with edges in ELL row order,
x-window in VMEM, gather decomposed into W/128 chunk passes:
  for w in range(W//128):  acc = where(hi==w, gather(chunk_w, lo), acc)
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_axis1(R=512, n_chunks=16, n_blocks=256, n_iters=20):
    """Edges laid [n_blocks, R, 128]; window [n_chunks*128] f32 in VMEM."""
    W = n_chunks * 128
    E = n_blocks * R * 128
    rng = np.random.default_rng(0)
    idx = rng.integers(0, W, size=(n_blocks, R, 128), dtype=np.int32)
    lo = idx % 128
    hi = idx // 128
    vals = rng.standard_normal((n_blocks, R, 128), dtype=np.float32)
    win = rng.standard_normal((W,), dtype=np.float32)

    def kernel(win_ref, lo_ref, hi_ref, vals_ref, out_ref):
        acc = jnp.zeros((R, 128), jnp.float32)
        loi = lo_ref[0]
        hii = hi_ref[0]
        for w in range(n_chunks):
            chunk = jax.lax.broadcast_in_dim(
                win_ref[pl.ds(w * 128, 128)], (R, 128), (1,))
            g = jnp.take_along_axis(chunk, loi, axis=1)
            acc = jnp.where(hii == w, g, acc)
        out_ref[0] = acc * vals_ref[0]

    grid = (n_blocks,)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((W,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_blocks, R, 128), jnp.float32),
    )
    jwin, jlo, jhi, jvals = map(jnp.asarray, (win, lo, hi, vals))
    run = jax.jit(lambda a, b, c, d: call(a, b, c, d))
    out = run(jwin, jlo, jhi, jvals)
    jax.block_until_ready(out)
    # correctness
    expect = win[idx] * vals
    got = np.asarray(out)
    err = np.abs(got - expect).max()
    print(f"axis1 W={W}: max err {err}", file=sys.stderr)
    t0 = time.perf_counter(); float(jnp.sum(out)); fetch = time.perf_counter()-t0
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = run(jwin, jlo, jhi, jvals)
    float(jnp.sum(out))
    dt = time.perf_counter() - t0 - fetch
    print(f"axis1 W={W} R={R}: {E*n_iters/dt:.3e} edges/s", file=sys.stderr)


def probe_axis0(R=512, n_blocks=64, n_iters=20):
    """axis=0 gather range test: operand [R,128], idx in [0,R)."""
    E = n_blocks * R * 128
    rng = np.random.default_rng(0)
    idx = rng.integers(0, R, size=(n_blocks, R, 128), dtype=np.int32)
    win = rng.standard_normal((R, 128), dtype=np.float32)

    def kernel(win_ref, idx_ref, out_ref):
        out_ref[0] = jnp.take_along_axis(win_ref[:], idx_ref[0], axis=0)

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((R, 128), lambda i: (0, 0)),
            pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_blocks, R, 128), jnp.float32),
    )
    jwin, jidx = jnp.asarray(win), jnp.asarray(idx)

    def kcall(w, i):
        # idx block is [1, R, 128]; squeeze inside
        return call(w, i)
    run = jax.jit(kcall)
    out = run(jwin, jidx)
    jax.block_until_ready(out)
    expect = win[idx, np.arange(128)[None, None, :]]
    err = np.abs(np.asarray(out) - expect).max()
    print(f"axis0 R={R}: max err {err}", file=sys.stderr)
    t0 = time.perf_counter(); float(jnp.sum(out)); fetch = time.perf_counter()-t0
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = run(jwin, jidx)
    float(jnp.sum(out))
    dt = time.perf_counter() - t0 - fetch
    print(f"axis0 R={R}: {E*n_iters/dt:.3e} gathers/s", file=sys.stderr)


if __name__ == "__main__":
    try:
        probe_axis0(R=8, n_blocks=512)
    except Exception as e:
        print(f"axis0 R=8 failed: {type(e).__name__}: {e}", file=sys.stderr)
    try:
        probe_axis0(R=512, n_blocks=64)
    except Exception as e:
        print(f"axis0 R=512 failed: {type(e).__name__}: {e}", file=sys.stderr)
    for nc in (8, 16, 32):
        try:
            probe_axis1(n_chunks=nc)
        except Exception as e:
            print(f"axis1 nc={nc} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
