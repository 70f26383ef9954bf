"""Residual + matrix-weighted norm vs formulas (reference
GNNResidual.py:135-171, MatrixWeightedNorm.py:165-210)."""
import jax.numpy as jnp
import numpy as np

from gnnla_tpu.models import matrix_weighted_norm, residual
from gnnla_tpu.problems import laplacian_2d


def main(n=25, seed=24601):
    A = laplacian_2d(n)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random(n * n), jnp.float32)
    b = jnp.asarray(rng.random(n * n), jnp.float32)

    r = residual(A, b, x)
    r_ref = np.asarray(b, np.float64) - A.to_scipy() @ np.asarray(x, np.float64)
    print(f"residual rel error: "
          f"{np.linalg.norm(np.asarray(r) - r_ref) / np.linalg.norm(r_ref):.3e}")

    # -A is SPD (Laplacian here is negative definite)
    W = A.scale(-1.0)
    g = float(matrix_weighted_norm(W, x))
    g_ref = float(np.sqrt(np.asarray(x, np.float64)
                          @ (W.to_scipy() @ np.asarray(x, np.float64))))
    print(f"weighted norm: gnn {g:.6f} vs formula {g_ref:.6f}")
    assert abs(g - g_ref) < 1e-3


if __name__ == "__main__":
    main()
