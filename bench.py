"""Benchmark: SpMV message-passing throughput (edges/s/chip).

The BASELINE.json headline metric. The reference publishes no performance
numbers (BASELINE.md), so `vs_baseline` is measured against the reference's
*actual* execution model: single-process CPU sparse matvec (scipy CSR — the
same native kernel class torch sparse uses on CPU, where the reference runs,
TrainableJacobiDiag/train.py:59-60) on this host, same matrix, same dtype.

Workload: 2D 5-point FEM Laplacian (the reference's universal fixture,
scaled up), x <- A_s @ x iterated under one `lax.scan` program, where
A_s = A / ||A||_inf (same sparsity, same traffic; the scaling keeps the
iterate bounded without spending extra memory passes on normalisation —
a rescaled power iteration). Three device paths are measured — the
gather/segment-sum COO path (general graphs), the DIA banded path
(structured FEM), and the double-buffered Pallas DIA kernel — and the best
is reported, with the per-path breakdown on stderr. Prints exactly one JSON
line on stdout:
  {"metric": "spmv_edges_per_s", "value": ..., "unit": "edges/s",
   "vs_baseline": ...}

NOTE (axon/tunneled TPU backends): the first device->host transfer of a
process can cost minutes; this script therefore never fetches device values
— timing uses block_until_ready only.
"""

import json
import os
import sys
import time

import numpy as np


def _bench(matvec, x0, nnz, n_iters: int, n_repeat: int = 3,
           normalize: bool = False) -> float:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def step(x, _):
            y = matvec(x)
            if normalize:
                # the scatter-based COO path needs a reduction in the loop
                # body — a pure chained scatter scan tickles a pathological
                # TPU compile-time blowup (empirically: minutes)
                y = y * jax.lax.rsqrt(jnp.vdot(y, y))
            return y, None
        x, _ = jax.lax.scan(step, x, None, length=n_iters)
        return x

    run(x0).block_until_ready()  # compile + warm up
    best = np.inf
    for _ in range(n_repeat):
        t0 = time.perf_counter()
        run(x0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return nnz * n_iters / best


def bench_cpu_reference(A_scipy, n_iters: int) -> float:
    """Reference execution model: scipy CSR SpMV on host CPU, float32."""
    A = (A_scipy / 8.0).tocsr().astype(np.float32)
    x = np.ones((A.shape[0],), dtype=np.float32)
    y = A @ x  # warm up
    t0 = time.perf_counter()
    for _ in range(n_iters):
        x = A @ x
    dt = time.perf_counter() - t0
    return A.nnz * n_iters / dt


def main():
    n_grid = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    import jax.numpy as jnp

    from gnnla_tpu.ops.dia import to_dia
    from gnnla_tpu.problems import laplacian_2d

    # drop the kron-artifact explicit zeros: edges/s counts real nonzeros.
    # scale by 1/||A||_inf = 1/8 so the scanned iterate stays bounded.
    op_raw = laplacian_2d(n_grid).eliminate_zeros()
    op = op_raw.scale(1.0 / 8.0)
    dia = to_dia(op)
    x0 = jnp.ones((op.n_rows,), jnp.float32)

    dia_eps = _bench(dia.matvec, x0, dia.nnz, n_iters)
    print(f"dia/shift:       {dia_eps:.3e} edges/s", file=sys.stderr)

    # COO path: ~2 orders slower than DIA on TPU (scatter-bound) and its
    # scan costs minutes of XLA compile time on this backend — opt-in.
    coo_eps = 0.0
    if os.environ.get("BENCH_COO"):
        coo_eps = _bench(op.matvec, x0, op.nnz, max(10, n_iters // 10),
                         normalize=True)
        print(f"coo/segment-sum: {coo_eps:.3e} edges/s", file=sys.stderr)
    else:
        print("coo/segment-sum: skipped (set BENCH_COO=1)", file=sys.stderr)

    try:
        from gnnla_tpu.ops.pallas_spmv import make_dia_spmv_padded
        mv_pad, to_pad, _ = make_dia_spmv_padded(dia)
        pallas_eps = _bench(mv_pad, to_pad(x0), dia.nnz, n_iters)
        print(f"dia/pallas:      {pallas_eps:.3e} edges/s", file=sys.stderr)
    except Exception as e:  # pallas path optional
        print(f"dia/pallas unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)
        pallas_eps = 0.0

    tpu_edges_s = max(coo_eps, dia_eps, pallas_eps)
    cpu_edges_s = bench_cpu_reference(op_raw.to_scipy(), n_iters=10)
    print(f"cpu reference:   {cpu_edges_s:.3e} edges/s", file=sys.stderr)

    print(json.dumps({
        "metric": "spmv_edges_per_s",
        "value": tpu_edges_s,
        "unit": "edges/s",
        "vs_baseline": tpu_edges_s / cpu_edges_s,
    }))


if __name__ == "__main__":
    main()
