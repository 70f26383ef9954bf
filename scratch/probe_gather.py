"""Probe raw gather/segment throughput on the TPU for general-graph SpMV design.

Measures, for n=1M vertices and K=8 nnz/row (E=8M edges):
  1. one big 1D gather x[cols]                       (E elements)
  2. ELL matvec: sum_k vals[:,k] * x[cols[:,k]]      (no scatter!)
  3. COO matvec: gather + multiply + sorted segment_sum
  4. ELL with 2D [n, K] single gather
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp


def bench(fn, args, work, label, n_iters=50):
    run = jax.jit(fn)
    y = run(*args)
    jax.block_until_ready(y)
    t0 = time.perf_counter(); float(jnp.sum(y)); fetch = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_iters):
        y = run(*args)
    float(jnp.sum(y))
    dt = time.perf_counter() - t0 - fetch
    print(f"{label:30s} {work * n_iters / dt:.3e} elems/s  ({dt:.3f}s)",
          file=sys.stderr)


def main():
    n = 1 << 20
    K = 8
    E = n * K
    rng = np.random.default_rng(0)
    # unstructured: random cols
    cols2d = rng.integers(0, n, size=(n, K), dtype=np.int32)
    rows = np.repeat(np.arange(n, dtype=np.int32), K)
    cols1d = cols2d.reshape(-1)
    vals2d = rng.standard_normal((n, K), dtype=np.float32) / K

    x = jnp.asarray(rng.standard_normal(n, dtype=np.float32))
    jcols2d = jnp.asarray(cols2d)
    jcols1d = jnp.asarray(cols1d)
    jrows = jnp.asarray(rows)
    jvals2d = jnp.asarray(vals2d)
    jvals1d = jnp.asarray(vals2d.reshape(-1))
    float(jnp.sum(x))  # d2h warmup

    # 1. one big flat gather
    bench(lambda c, x: x[c], (jcols1d, x), E, "flat gather E")

    # 2. ELL row-major: K separate gathers of n
    def ell_k(cols, vals, x):
        acc = vals[:, 0] * x[cols[:, 0]]
        for k in range(1, K):
            acc = acc + vals[:, k] * x[cols[:, k]]
        return acc
    bench(ell_k, (jcols2d, jvals2d, x), E, "ELL K-gathers")

    # 3. ELL via one 2D gather
    def ell_2d(cols, vals, x):
        return jnp.sum(vals * x[cols], axis=1)
    bench(ell_2d, (jcols2d, jvals2d, x), E, "ELL 2D gather")

    # 4. COO segment-sum (sorted)
    def coo(cols, rows, vals, x):
        return jax.ops.segment_sum(vals * x[cols], rows, num_segments=n,
                                   indices_are_sorted=True)
    bench(coo, (jcols1d, jrows, jvals1d, x), E, "COO gather+segsum", n_iters=5)

    # 5. take_along_axis variant
    def ell_taa(cols, vals, x):
        return jnp.sum(vals * jnp.take(x, cols, axis=0,
                                       indices_are_sorted=False), axis=1)
    bench(ell_taa, (jcols2d, jvals2d, x), E, "ELL jnp.take")


if __name__ == "__main__":
    main()
