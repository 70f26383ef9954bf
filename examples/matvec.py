"""SpMV as a GN block, vs scipy (reference MatVecGNN.py:117-162)."""
import jax.numpy as jnp
import numpy as np

from gnnla_tpu.models import matvec, matvec_gnn
from gnnla_tpu.problems import laplacian_2d


def main(n=25, seed=24601):
    A = laplacian_2d(n)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random(n * n), jnp.float32)
    y = matvec(A, x)
    y_gnn = matvec_gnn(A, x)
    y_ref = A.to_scipy() @ np.asarray(x, np.float64)
    rel = np.linalg.norm(np.asarray(y) - y_ref) / np.linalg.norm(y_ref)
    rel_gnn = np.linalg.norm(np.asarray(y_gnn) - y_ref) / np.linalg.norm(y_ref)
    print(f"matvec     rel error: {rel:.3e}")
    print(f"matvec_gnn rel error: {rel_gnn:.3e}")
    # multi-column X (reference MatVecGNN.py:128-129)
    X = jnp.asarray(rng.random((n * n, 3)), jnp.float32)
    Y = matvec(A, X)
    rel_mc = np.linalg.norm(np.asarray(Y) - A.to_scipy() @ np.asarray(X, np.float64))
    print(f"multi-col  abs error: {rel_mc:.3e}")
    assert rel < 1e-5 and rel_gnn < 1e-5

    # multi-column at kernel speed: the shared-pack stream SpMM (all
    # columns in one pass over the edge packs; Mosaic on TPU, the numpy
    # emulator off-chip)
    import jax

    from gnnla_tpu.ops.pallas_stream import StreamSpMM, rcm_csr
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    B, _ = rcm_csr(A.to_scipy().tocsr().astype(np.float32))
    mm = StreamSpMM(B, 3, with_transpose=False,
                    backend="pallas" if on_tpu else "emulate")
    Xs = np.asarray(rng.random((n * n, 3)), np.float32)
    Ys = np.asarray(mm.matmat(Xs))
    rel_mm = np.linalg.norm(Ys - B @ Xs) / np.linalg.norm(B @ Xs)
    print(f"stream SpMM rel error: {rel_mm:.3e} "
          f"({'pallas' if on_tpu else 'emulate'} backend)")
    assert rel_mm < 1e-5


if __name__ == "__main__":
    main()
