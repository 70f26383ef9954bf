"""Multilevel AMG + AMG-preconditioned CG (capability beyond the
reference's two-grid cycle; see models/multigrid.py, models/krylov.py)."""
import jax.numpy as jnp
import numpy as np

from gnnla_tpu.models import (amg_pcg, cg, multigrid_cycle, residual,
                              setup_multigrid, setup_twogrid)
from gnnla_tpu.problems import laplacian_2d


def main(n=32, seed=24601):
    A = laplacian_2d(n)
    N = n * n
    rng = np.random.default_rng(seed)
    b = jnp.asarray(rng.random(N), jnp.float32)
    x0 = jnp.zeros(N, jnp.float32)

    mg = setup_multigrid(A, min_coarse=16)
    print(f"hierarchy sizes: {[op.n_rows for op in mg.As]}")
    x = x0
    for k in range(5):
        x = multigrid_cycle(mg, b, x, n_pre=2, n_post=2)
        print(f"multigrid cycle {k + 1}: |r| = "
              f"{float(jnp.linalg.norm(residual(A, b, x))):.3e}")

    tg = setup_twogrid(A, theta=0.25, splitting="cljp")
    _, hist_cg = cg(lambda v: -A.matvec(v), -b, x0, n_iters=30)
    x_pcg, hist_pcg = amg_pcg(tg, b, x0, n_iters=15, flip_sign=True)
    print(f"plain CG 30 iters:  |r| = {float(hist_cg[-1]):.3e}")
    print(f"AMG-PCG 15 iters:   |r| = "
          f"{float(jnp.linalg.norm(residual(A, b, x_pcg))):.3e}")

    # smoothed-aggregation hierarchy: the size-independent production path
    from gnnla_tpu.models import mg_pcg, setup_sa_multigrid
    sa = setup_sa_multigrid(A)
    print(f"SA hierarchy sizes: {[op.n_rows for op in sa.As]}")
    x_sa, _ = mg_pcg(sa, b, x0, n_iters=15, flip_sign=True)
    print(f"SA mg-PCG 15 iters: |r| = "
          f"{float(jnp.linalg.norm(residual(A, b, x_sa))):.3e}")


if __name__ == "__main__":
    main()
