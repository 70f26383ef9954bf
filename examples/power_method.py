"""Power method lambda_max vs classical iteration
(reference PowerMethodGNN.py:336-383, matlab/test_power_method.m)."""
import jax.numpy as jnp
import numpy as np

from gnnla_tpu.models import power_method, power_method_gnn
from gnnla_tpu.problems import laplacian_2d


def main(n=25, seed=24601, n_iters=30):
    A = laplacian_2d(n)
    rng = np.random.default_rng(seed)
    b0 = jnp.asarray(rng.random(n * n), jnp.float32)

    lam, _ = power_method(A, b0, n_iters=n_iters)
    lam_gnn, _ = power_method_gnn(A, b0, n_iters=n_iters)

    # classical reference iteration in float64
    A_sp = A.to_scipy()
    b = np.asarray(b0, np.float64)
    for _ in range(n_iters):
        ab = A_sp @ b
        b = ab / np.linalg.norm(ab)
    lam_ref = (b @ (A_sp @ b)) / (b @ b)

    print(f"lambda_max: fast {float(lam):.6f}, gnn {float(lam_gnn):.6f}, "
          f"classical {lam_ref:.6f}")
    assert abs(float(lam) - lam_ref) / abs(lam_ref) < 1e-3


if __name__ == "__main__":
    main()
