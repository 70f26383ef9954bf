"""Weighted Jacobi: single-sweep parity + 100-sweep residual convergence
(reference JacobiGNN.py:150-201, matlab/test_jacobi.m)."""
import jax.numpy as jnp
import numpy as np

from gnnla_tpu.models import jacobi, jacobi_gnn, residual
from gnnla_tpu.problems import laplacian_2d


def main(n=5, seed=24601, omega=2.0 / 3.0):
    A = laplacian_2d(n)
    rng = np.random.default_rng(seed)
    b = jnp.asarray(rng.random(n * n), jnp.float32)
    x0 = jnp.asarray(rng.random(n * n), jnp.float32)

    # single-sweep parity vs the formula x + w D^-1 (b - A x)
    x1 = jacobi(A, b, x0, omega=omega, n_iters=1)
    d = np.asarray(A.diagonal(), np.float64)
    x_ref = (np.asarray(x0, np.float64) + omega / d *
             (np.asarray(b, np.float64)
              - A.to_scipy() @ np.asarray(x0, np.float64)))
    print(f"1-sweep rel error: "
          f"{np.linalg.norm(np.asarray(x1) - x_ref) / np.linalg.norm(x_ref):.3e}")
    x1g = jacobi_gnn(A, b, x0, omega=omega, n_iters=1)
    np.testing.assert_allclose(np.asarray(x1g), np.asarray(x1), rtol=1e-5,
                               atol=1e-6)

    # 100-sweep residual decrease, printed every 10 (JacobiGNN.py:190-201)
    x = x0
    for k in range(1, 11):
        x = jacobi(A, b, x, omega=omega, n_iters=10)
        print(f"after {10 * k:3d} sweeps: |r| = "
              f"{float(jnp.linalg.norm(residual(A, b, x))):.4e}")


if __name__ == "__main__":
    main()
