"""CG and AMG-preconditioned CG (composition beyond the reference)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gnnla_tpu.models import amg_pcg, cg, residual, setup_twogrid, vcycle
from gnnla_tpu.problems import laplacian_2d


@pytest.fixture(scope="module")
def problem(rng=None):
    A = laplacian_2d(25)
    r = np.random.default_rng(24601)
    b = jnp.asarray(r.random(625), jnp.float32)
    x0 = jnp.zeros(625, jnp.float32)
    return A, b, x0


def test_cg_solves_spd(problem):
    A, b, x0 = problem
    x, hist = cg(lambda v: -A.matvec(v), -b, x0, n_iters=100)
    r = float(jnp.linalg.norm(b - A.matvec(x)))
    assert r < 1e-3 * float(jnp.linalg.norm(b)), r
    assert hist[-1] < hist[0]


def test_amg_pcg_beats_plain_cg(problem):
    """The V-cycle preconditioner cuts the iteration count hard — the
    production solve path the reference never composes."""
    A, b, x0 = problem
    setup = setup_twogrid(A, theta=0.25, splitting="cljp", seed=0)

    _, hist_plain = cg(lambda v: -A.matvec(v), -b, x0, n_iters=30)
    x, hist_pcg = amg_pcg(setup, b, x0, n_iters=30, flip_sign=True)

    r_pcg = float(jnp.linalg.norm(b - A.matvec(x)))
    r0 = float(jnp.linalg.norm(b))
    assert r_pcg < 1e-4 * r0, r_pcg
    # preconditioned residual after 10 iters beats plain CG after 30
    assert float(hist_pcg[9]) < float(hist_plain[29])


def test_amg_pcg_beats_stationary_cycles(problem):
    """Same work comparison: 10 PCG iterations vs 10 plain V-cycles."""
    A, b, x0 = problem
    setup = setup_twogrid(A, theta=0.25, splitting="cljp", seed=0)
    x_pcg, _ = amg_pcg(setup, b, x0, n_iters=10, flip_sign=True)
    x_v = x0
    for _ in range(10):
        x_v = vcycle(setup, b, x_v, n_pre=1, n_post=1, coarse_deg=4)
    r_pcg = float(jnp.linalg.norm(residual(A, b, x_pcg)))
    r_v = float(jnp.linalg.norm(residual(A, b, x_v)))
    assert r_pcg < r_v, (r_pcg, r_v)


def test_mg_pcg_multilevel_converges():
    """Multilevel-preconditioned CG reaches 1e-6 in few iterations on a
    grid where the two-grid preconditioner (Chebyshev 'coarse solve' on a
    still-large coarse grid) stalls — the large-N production solve path."""
    from gnnla_tpu.models import mg_pcg, setup_multigrid

    A = laplacian_2d(48)
    n = 48 * 48
    r = np.random.default_rng(5)
    b = jnp.asarray(r.random(n), jnp.float32)
    x0 = jnp.zeros(n, jnp.float32)
    ms = setup_multigrid(A, theta=0.25, seed=0)
    assert ms.n_levels >= 3
    x, hist = mg_pcg(ms, b, x0, n_iters=20, flip_sign=True)
    rel = float(jnp.linalg.norm(b - A.matvec(x))) / float(jnp.linalg.norm(b))
    assert rel < 1e-4, rel  # f32 true-residual floor is ~1e-5
    # fewer iterations to 1e-5 than two-grid amg_pcg on the same problem
    setup2 = setup_twogrid(A, theta=0.25, splitting="cljp", seed=0)
    _, hist2 = amg_pcg(setup2, b, x0, n_iters=20, flip_sign=True)
    bnorm = float(jnp.linalg.norm(b))
    it_mg = int(np.flatnonzero(np.asarray(hist) / bnorm < 1e-5)[0])
    conv2 = np.flatnonzero(np.asarray(hist2) / bnorm < 1e-5)
    it_2g = int(conv2[0]) if conv2.size else 10 ** 9
    assert it_mg <= it_2g
