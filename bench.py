"""Benchmark: SpMV message-passing throughput (edges/s/chip).

The BASELINE.json headline metric. The reference publishes no performance
numbers (BASELINE.md), so `vs_baseline` is measured against the reference's
*actual* execution model: single-process CPU sparse matvec (scipy CSR — the
same native kernel class torch sparse uses on CPU, where the reference runs,
TrainableJacobiDiag/train.py:59-60) on this host, same matrix, same dtype.

Workload: 2D 5-point FEM Laplacian (the reference's universal fixture,
scaled up), x <- A_s @ x iterated under one `lax.scan` program, where
A_s = A / ||A||_inf (same sparsity, same traffic; the scaling keeps the
iterate bounded without spending extra memory passes on normalisation — a
rescaled power iteration). Three device paths are measured — the
gather/segment-sum COO path (general graphs), the DIA banded path
(structured FEM), and the double-buffered Pallas DIA kernel — and the best
is reported, with the per-path breakdown on stderr. Prints exactly one JSON
line on stdout:
  {"metric": "spmv_edges_per_s", "value": ..., "unit": "edges/s",
   "vs_baseline": ...}

Backend notes (axon/tunneled TPU), learned the hard way:
  * the first device->host transfer of a process can cost minutes — timing
    uses block_until_ready only, never value fetches;
  * a jitted function that closes over a large device array inlines it as a
    constant into the program shipped to the remote compiler, making
    compile time scale with matrix bytes (minutes at 84 MB). All operator
    data is therefore threaded through jit as *arguments*.
"""

import json
import sys
import time

import numpy as np


def _bench(apply_fn, op_tree, x0, nnz, n_iters: int,
           n_chain: int = 3) -> float:
    """apply_fn(op_tree, x) -> x'; op_tree threaded as a jit argument.

    Timing protocol for remote/tunneled backends where block_until_ready
    has been observed to return before execution finishes: chain `n_chain`
    scan programs output->input (every call gets fresh arguments, so no
    layer can serve a cached result) and close with a single scalar fetch,
    which is a true synchronisation point. The fetch cost (~0.4 s once the
    per-process first-transfer warmup is paid by the caller) is amortised
    over n_chain * n_iters matvecs.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(op, x):
        def step(x, _):
            return apply_fn(op, x), None
        x, _ = jax.lax.scan(step, x, None, length=n_iters)
        return x

    x = run(op_tree, x0)          # compile + warm up
    float(jnp.sum(x))             # sync
    t0 = time.perf_counter()
    fetch_cost = 0.0
    float(jnp.sum(x))             # warm fetch cost, measured...
    fetch_cost = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(n_chain):
        x = run(op_tree, x)
    s = float(jnp.sum(x))         # sync + sanity
    dt = time.perf_counter() - t0
    assert np.isfinite(s), f"bench iterate diverged: {s}"
    # ...and subtracted, so the tail fetch doesn't tax short chains
    return nnz * n_iters * n_chain / max(dt - fetch_cost, 1e-9)


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


def _pallas_health_probe():
    """One trivial Mosaic compile. The axon pool assigns a terminal per
    process and some terminals' compile helpers are broken ("could not
    determine TPU accelerator type" -> HTTP 500 on every pallas compile,
    while plain XLA compiles fine). Probe cheaply; on failure re-exec so
    a fresh process claims a different terminal (bounded attempts)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    y = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.ones((8, 128), jnp.float32))
    y.block_until_ready()


def main():
    n_grid = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    import os

    attempt = int(os.environ.get("GNNLA_BENCH_ATTEMPT", "0"))
    try:
        _pallas_health_probe()
    except Exception as e:
        if attempt < 5:
            print(f"pallas compile-helper unhealthy "
                  f"({type(e).__name__}); re-claiming terminal "
                  f"(attempt {attempt + 1}/5)", file=sys.stderr)
            env = dict(os.environ, GNNLA_BENCH_ATTEMPT=str(attempt + 1))
            os.execve(sys.executable, [sys.executable] + sys.argv, env)
        print("pallas compile helper still unhealthy after 5 claims; "
              "continuing with XLA-only paths", file=sys.stderr)
    import jax.numpy as jnp

    from gnnla_tpu.ops.dia import to_dia
    from gnnla_tpu.problems import laplacian_2d

    # pay the per-process first device->host transfer cost (variable,
    # seconds to minutes on the tunneled backend) in a thread overlapped
    # with the host-side matrix construction below
    import threading
    t_start = time.perf_counter()

    def _warmup():
        float(jnp.sum(jnp.ones((8,), jnp.float32)))

    warmup = threading.Thread(target=_warmup)
    warmup.start()

    # drop the kron-artifact explicit zeros: edges/s counts real nonzeros.
    # scale by 1/||A||_inf = 1/8 so the scanned iterate stays bounded.
    op_raw = laplacian_2d(n_grid).eliminate_zeros()
    op = op_raw.scale(1.0 / 8.0)
    dia = to_dia(op)
    x0 = jnp.ones((op.n_rows,), jnp.float32)
    warmup.join()
    print(f"setup + d2h warmup: {time.perf_counter() - t_start:.1f}s",
          file=sys.stderr)

    dia_eps = _bench(lambda d, x: d.matvec(x), dia, x0, dia.nnz, n_iters,
                     n_chain=5)
    print(f"dia/shift:       {dia_eps:.3e} edges/s", file=sys.stderr)

    try:
        from gnnla_tpu.ops.pallas_spmv import make_dia_spmv_padded
        pmv = make_dia_spmv_padded(dia)
        pallas_eps = _bench(pmv.apply, pmv.op_args, pmv.to_padded(x0),
                            pmv.nnz, n_iters, n_chain=10)
        print(f"dia/pallas:      {pallas_eps:.3e} edges/s", file=sys.stderr)
    except Exception as e:  # pallas path optional
        print(f"dia/pallas unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)
        pallas_eps = 0.0

    # bf16 diagonal storage halves the dominant HBM stream; counts toward
    # the headline only when bit-exact on this matrix (the Laplacian's
    # values are bf16-representable, so it is)
    pallas16_eps = 0.0
    try:
        pmv16 = make_dia_spmv_padded(dia, diag_dtype=jnp.bfloat16)
        probe = jnp.asarray(
            np.linspace(-1.0, 1.0, op.n_rows, dtype=np.float32))
        exact = bool(jnp.all(pmv16.matvec(probe) == pmv.matvec(probe)))
        if exact:
            pallas16_eps = _bench(pmv16.apply, pmv16.op_args,
                                  pmv16.to_padded(x0), pmv16.nnz, n_iters,
                                  n_chain=10)
            print(f"dia/pallas-bf16: {pallas16_eps:.3e} edges/s (exact)",
                  file=sys.stderr)
        else:
            print("dia/pallas-bf16: not exact on this matrix; excluded",
                  file=sys.stderr)
    except Exception as e:
        print(f"dia/pallas-bf16 unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)

    # VMEM-resident roll-based stencil kernel: the iterate AND the tap
    # planes live in VMEM across all n_iters steps — zero HBM traffic per
    # matvec, VPU-roofline-bound. bf16 taps count toward the headline only
    # when the storage roundtrip is bit-exact on this matrix (host check).
    stencil_eps = 0.0
    try:
        from gnnla_tpu.ops.pallas_stencil import make_stencil_spmv
        tapf32 = None
        probe32 = np.asarray(dia.diags, np.float32)
        bf16_exact = bool(np.all(
            np.asarray(jnp.asarray(probe32, jnp.bfloat16), np.float32)
            == probe32))
        tap_dtype = jnp.bfloat16 if bf16_exact else jnp.float32
        st = make_stencil_spmv(op, (n_grid, n_grid), n_steps=n_iters,
                               tap_dtype=tap_dtype)
        run = __import__("jax").jit(st.apply)
        x2d = x0.reshape(n_grid, n_grid)
        y = run(st.taps, x2d)
        float(jnp.sum(y))
        t0 = time.perf_counter()
        float(jnp.sum(y))
        fetch = time.perf_counter() - t0
        n_chain = 5
        t0 = time.perf_counter()
        for _ in range(n_chain):
            y = run(st.taps, y)
        s = float(jnp.sum(y))
        dt = time.perf_counter() - t0 - fetch
        assert np.isfinite(s), f"stencil iterate diverged: {s}"
        if dt <= 2 * fetch:
            # timing below the fetch-overhead noise floor (tiny CLI sizes):
            # an inflated rate here must not win the headline max()
            raise RuntimeError(
                f"stencil run too short to time (dt={dt:.4f}s <= "
                f"2*fetch={2 * fetch:.4f}s); raise n_grid/n_iters")
        stencil_eps = st.nnz * n_iters * n_chain / dt
        print(f"stencil-resident ({jnp.dtype(tap_dtype).name}"
              f"{', exact' if bf16_exact else ''}): {stencil_eps:.3e} "
              f"edges/s", file=sys.stderr)
    except Exception as e:  # stencil path optional (needs grid structure)
        print(f"stencil-resident unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)

    # COO path is ~2 orders slower on TPU (scatter-bound): fewer iterations
    # keep its share of the wall-time bounded without hurting signal.
    coo_eps = _bench(lambda o, x: o.matvec(x), op, x0, op.nnz,
                     max(5, n_iters // 100), n_chain=1)
    print(f"coo/segment-sum: {coo_eps:.3e} edges/s", file=sys.stderr)

    tpu_edges_s = max(coo_eps, dia_eps, pallas_eps, pallas16_eps,
                      stencil_eps)
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
