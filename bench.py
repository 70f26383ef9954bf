"""Benchmark: SpMV message-passing throughput (edges/s/chip).

The BASELINE.json headline metric. The reference publishes no performance
numbers (BASELINE.md), so `vs_baseline` is measured against the reference's
*actual* execution model: single-process CPU sparse matvec (scipy CSR — the
same native kernel class torch sparse uses on CPU, where the reference runs,
TrainableJacobiDiag/train.py:59-60) on this host, same matrix, same dtype.

Workload: 2D 5-point FEM Laplacian (the reference's universal fixture,
scaled up), y = A @ x iterated under jit. Two device paths are measured —
the gather/segment-sum COO path (general graphs) and the DIA banded path
(structured FEM) — and the best is reported, with the per-path breakdown on
stderr. Prints exactly one JSON line on stdout:
  {"metric": "spmv_edges_per_s", "value": ..., "unit": "edges/s",
   "vs_baseline": ...}
"""

import json
import sys
import time

import numpy as np


def _bench(matvec, n_rows, nnz, n_iters: int, n_repeat: int = 5) -> float:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def step(x, _):
            y = matvec(x)
            # keep values bounded across thousands of matvecs
            return y * jax.lax.rsqrt(jnp.vdot(y, y)), None
        x, _ = jax.lax.scan(step, x, None, length=n_iters)
        return x

    x0 = jnp.ones((n_rows,), jnp.float32)
    run(x0).block_until_ready()  # compile + warm up
    best = np.inf
    for _ in range(n_repeat):
        t0 = time.perf_counter()
        run(x0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return nnz * n_iters / best


def bench_cpu_reference(A_scipy, n_iters: int) -> float:
    """Reference execution model: scipy CSR SpMV on host CPU, float32."""
    A = A_scipy.tocsr().astype(np.float32)
    x = np.ones((A.shape[0],), dtype=np.float32)
    y = A @ x  # warm up
    t0 = time.perf_counter()
    for _ in range(n_iters):
        y = A @ x
        x = y / np.linalg.norm(y)
    dt = time.perf_counter() - t0
    return A.nnz * n_iters / dt


def main():
    n_grid = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    from gnnla_tpu.ops.dia import to_dia
    from gnnla_tpu.problems import laplacian_2d

    # drop the kron-artifact explicit zeros: edges/s counts real nonzeros
    op = laplacian_2d(n_grid).eliminate_zeros()
    dia = to_dia(op)

    coo_eps = _bench(op.matvec, op.n_rows, op.nnz, n_iters)
    print(f"coo/segment-sum: {coo_eps:.3e} edges/s", file=sys.stderr)
    dia_eps = _bench(dia.matvec, dia.n, dia.nnz, n_iters)
    print(f"dia/shift:       {dia_eps:.3e} edges/s", file=sys.stderr)

    try:
        from gnnla_tpu.ops.pallas_spmv import make_dia_spmv
        pallas_mv = make_dia_spmv(dia)
        pallas_eps = _bench(pallas_mv, dia.n, dia.nnz, n_iters)
        print(f"dia/pallas:      {pallas_eps:.3e} edges/s", file=sys.stderr)
    except Exception as e:  # pallas path optional
        print(f"dia/pallas unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)
        pallas_eps = 0.0

    tpu_edges_s = max(coo_eps, dia_eps, pallas_eps)
    cpu_edges_s = bench_cpu_reference(op.to_scipy(), n_iters=10)
    print(f"cpu reference:   {cpu_edges_s:.3e} edges/s", file=sys.stderr)

    print(json.dumps({
        "metric": "spmv_edges_per_s",
        "value": tpu_edges_s,
        "unit": "edges/s",
        "vs_baseline": tpu_edges_s / cpu_edges_s,
    }))


if __name__ == "__main__":
    main()
