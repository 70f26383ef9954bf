"""On-chip correctness + throughput for the stream SpMV.

Fixture: k-NN-32 graph Laplacian on scattered 2D points (the sparsity of
meshfree/RBF-FD discretizations) — unstructured, non-banded.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import scipy.sparse as sp


def knn_laplacian(n, k=32, seed=7):
    from scipy.spatial import cKDTree
    rng = np.random.default_rng(seed)
    pts = rng.random((n, 2))
    tree = cKDTree(pts)
    d, idx = tree.query(pts, k=k + 1)
    rows = np.repeat(np.arange(n), k)
    cols = idx[:, 1:].reshape(-1)
    w = np.exp(-(d[:, 1:] ** 2) / (d[:, 1:].mean() ** 2)).reshape(-1)
    A = sp.coo_matrix((w.astype(np.float32), (rows, cols)),
                      shape=(n, n)).tocsr()
    A = A + A.T
    lap = (sp.diags(np.asarray(A.sum(axis=1)).ravel()) - A).tocsr()
    lap.sort_indices()
    return lap.astype(np.float32)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    import jax, jax.numpy as jnp
    from gnnla_tpu.ops.pallas_stream import StreamSpMV, rcm_csr

    t0 = time.perf_counter()
    lap = knn_laplacian(n)
    lap = (lap / (abs(lap).sum(axis=1).max() * 1.01)).tocsr()
    lap.sort_indices()
    A, perm = rcm_csr(lap)
    print(f"fixture {time.perf_counter()-t0:.1f}s nnz={A.nnz}",
          file=sys.stderr)

    t0 = time.perf_counter()
    mv = StreamSpMV(A, with_transpose=True)
    f = mv.fmt
    print(f"build {time.perf_counter()-t0:.1f}s units={f.n_units} "
          f"steps={f.n_steps} w_sc={f.w_sc} kb={f.kb} "
          f"waste={f.n_units*8*128/A.nnz:.2f}", file=sys.stderr)

    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32)
    t0 = time.perf_counter()
    y = np.asarray(mv.matvec(jnp.asarray(x)))
    print(f"first matvec (compile) {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    expect = A @ x
    err = np.abs(y - expect).max() / np.abs(expect).max()
    print(f"on-chip rel err: {err:.2e}", file=sys.stderr)
    assert err < 1e-5, "MISMATCH"

    n_iters = 100

    @jax.jit
    def run(op_args, x3):
        def step(x3, _):
            return mv.apply(op_args, x3), None
        x3, _ = jax.lax.scan(step, x3, None, length=n_iters)
        return x3

    x3 = mv.to_padded(jnp.ones(n, jnp.float32))
    x3 = run(mv.op_args, x3)
    float(jnp.sum(x3))
    t0 = time.perf_counter(); float(jnp.sum(x3)); fetch = time.perf_counter()-t0
    n_chain = 5
    t0 = time.perf_counter()
    for _ in range(n_chain):
        x3 = run(mv.op_args, x3)
    s = float(jnp.sum(x3))
    dt = time.perf_counter() - t0 - fetch
    assert np.isfinite(s), s
    eps = A.nnz * n_iters * n_chain / dt
    print(f"stream spmv: {eps:.3e} edges/s  ({dt:.3f}s, "
          f"{dt/(n_iters*n_chain)*1e3:.3f} ms/mv)", file=sys.stderr)

    g = jax.grad(lambda x3: jnp.sum(mv.apply(mv.op_args, x3) ** 2))(
        mv.to_padded(jnp.asarray(x)))
    gx = np.asarray(g).reshape(-1)[:n]
    expect_g = 2 * (A.T @ (A @ x))
    gerr = np.abs(gx - expect_g).max() / np.abs(expect_g).max()
    print(f"vjp rel err: {gerr:.2e}", file=sys.stderr)
    assert gerr < 1e-4

    xx = x.copy()
    t0 = time.perf_counter()
    for _ in range(20):
        xx = A @ xx
    cpu = A.nnz * 20 / (time.perf_counter() - t0)
    print(f"cpu scipy:   {cpu:.3e} edges/s  (ratio {eps/cpu:.1f}x)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
