"""Two-grid AMG V-cycle: residual per cycle vs plain Jacobi
(reference VCycle.py:239-277, matlab/test_vcycle.m)."""
import jax.numpy as jnp
import numpy as np

from gnnla_tpu.models import (jacobi, residual, setup_twogrid,
                              setup_with_dia, solve, vcycle)
from gnnla_tpu.problems import laplacian_2d


def main(n=25, seed=24601, n_cycles=5):
    A = laplacian_2d(n)
    rng = np.random.default_rng(seed)
    b = jnp.asarray(rng.random(n * n), jnp.float32)
    x = jnp.zeros(n * n, jnp.float32)

    setup = setup_with_dia(setup_twogrid(A, theta=0.25, splitting="cljp"))
    print(f"coarse points: {int(np.sum(np.asarray(setup.coarse_flags)))}"
          f"/{A.n_rows}")

    for k in range(n_cycles):
        x = vcycle(setup, b, x, n_pre=3, n_post=3, coarse_deg=4)
        print(f"cycle {k + 1}: |r| = "
              f"{float(jnp.linalg.norm(residual(A, b, x))):.4e}")

    x_jac = jacobi(A, b, jnp.zeros(n * n, jnp.float32), omega=0.7,
                   n_iters=6 * n_cycles)
    print(f"plain Jacobi ({6 * n_cycles} sweeps): |r| = "
          f"{float(jnp.linalg.norm(residual(A, b, x_jac))):.4e}")

    x_scan = solve(setup, b, jnp.zeros(n * n, jnp.float32),
                   n_cycles=n_cycles, n_pre=3, n_post=3, coarse_deg=4)
    print(f"scanned solve matches loop: "
          f"{float(jnp.linalg.norm(x_scan - x)):.3e}")


if __name__ == "__main__":
    main()
