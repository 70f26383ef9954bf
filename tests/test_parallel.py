"""Sharded-kernel parity tests on the virtual 8-device CPU mesh.

The contract (SURVEY.md §4 "Distributed testing"): numerics of sharded
kernels must match the unsharded single-device kernels to fp tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from gnnla_tpu.models import jacobi
from gnnla_tpu.parallel import (device_put_sharded, make_sharded_jacobi,
                                make_sharded_matvec, make_sharded_norm,
                                partition_rows, shard_vector,
                                unshard_vector)
from gnnla_tpu.problems import laplacian_2d


@pytest.fixture(scope="module")
def mesh():
    devices = np.array(jax.devices()[:8])
    assert devices.size == 8, "conftest must force 8 CPU devices"
    return Mesh(devices, axis_names=("rows",))


@pytest.fixture(scope="module")
def A():
    return laplacian_2d(16)  # 256 rows over 8 shards -> 32 rows/shard


def test_partition_roundtrip(A):
    part = partition_rows(A, 8)
    assert part.n_shards == 8
    assert part.rows_per_shard == 32
    assert part.halo_reach <= 1  # banded: ring neighbors only
    x = jnp.arange(256, dtype=jnp.float32)
    xs = shard_vector(x, part)
    assert xs.shape == (8, 32)
    np.testing.assert_allclose(unshard_vector(xs, part), x)


def test_sharded_matvec_matches(A, mesh, rng):
    part = partition_rows(A, 8)
    x = jnp.asarray(rng.random(256), jnp.float32)
    expected = A.matvec(x)

    mv = make_sharded_matvec(part, mesh)
    xs = device_put_sharded(shard_vector(x, part), mesh)
    ys = mv(xs)
    np.testing.assert_allclose(unshard_vector(ys, part), expected,
                               rtol=1e-5, atol=1e-5)


def test_sharded_matvec_nondivisible(mesh, rng):
    """Row count not divisible by shard count -> padded rows stay zero."""
    A = laplacian_2d(5)  # 25 rows over 8 shards
    part = partition_rows(A, 8)
    x = jnp.asarray(rng.random(25), jnp.float32)
    mv = make_sharded_matvec(part, mesh)
    xs = device_put_sharded(shard_vector(x, part), mesh)
    ys = mv(xs)
    np.testing.assert_allclose(unshard_vector(ys, part), A.matvec(x),
                               rtol=1e-5, atol=1e-5)


def test_sharded_jacobi_matches(A, mesh, rng):
    part = partition_rows(A, 8)
    b = jnp.asarray(rng.random(256), jnp.float32)
    x0 = jnp.asarray(rng.random(256), jnp.float32)
    expected = jacobi(A, b, x0, omega=0.7, n_iters=10)

    jac = make_sharded_jacobi(part, mesh)
    bs = device_put_sharded(shard_vector(b, part), mesh)
    xs = device_put_sharded(shard_vector(x0, part), mesh)
    ds = device_put_sharded(shard_vector(A.diagonal(), part), mesh)
    out = jac(bs, xs, ds, 0.7, 10)
    np.testing.assert_allclose(unshard_vector(out, part), expected,
                               rtol=1e-4, atol=1e-4)


def test_sharded_norm_psum(A, mesh, rng):
    part = partition_rows(A, 8)
    x = jnp.asarray(rng.random(256), jnp.float32)
    nrm = make_sharded_norm(part, mesh)
    xs = device_put_sharded(shard_vector(x, part), mesh)
    np.testing.assert_allclose(float(nrm(xs)), float(jnp.linalg.norm(x)),
                               rtol=1e-5)


def test_sharded_power_method_matches(A, mesh, rng):
    from gnnla_tpu.models import power_method
    from gnnla_tpu.parallel import make_sharded_power_method
    part = partition_rows(A, 8)
    b0 = jnp.asarray(rng.random(256), jnp.float32)
    lam_ref, _ = power_method(A, b0, n_iters=30)

    pm = make_sharded_power_method(part, mesh)
    bs = device_put_sharded(shard_vector(b0, part), mesh)
    lam, b = pm(bs, 30)
    np.testing.assert_allclose(float(lam), float(lam_ref), rtol=1e-4)


def test_mesh_helpers():
    from gnnla_tpu.parallel import global_row_mesh, grid_mesh
    m = global_row_mesh()
    assert m.devices.size == 8 and m.axis_names == ("rows",)
    m2 = grid_mesh((2, 4))
    assert m2.devices.shape == (2, 4)
    with pytest.raises(ValueError):
        grid_mesh((3, 3))


def test_sharded_vcycle_matches_single_device(A, mesh, rng):
    """The distributed two-grid cycle reproduces the single-device vcycle
    bit-for-tolerance on the virtual 8-device mesh."""
    from gnnla_tpu.models import setup_twogrid, vcycle
    from gnnla_tpu.parallel import make_sharded_vcycle

    setup = setup_twogrid(A, theta=0.25, splitting="cljp", seed=0)
    b = jnp.asarray(rng.random(256), jnp.float32)
    x0 = jnp.asarray(rng.random(256), jnp.float32)

    cycle, part = make_sharded_vcycle(setup, mesh, n_pre=2, n_post=2,
                                      coarse_deg=3)
    bs = device_put_sharded(shard_vector(b, part), mesh)
    xs = device_put_sharded(shard_vector(x0, part), mesh)
    out = cycle(bs, xs)
    x_ref = vcycle(setup, b, x0, n_pre=2, n_post=2, coarse_deg=3)
    np.testing.assert_allclose(unshard_vector(out, part), np.asarray(x_ref),
                               rtol=1e-4, atol=1e-5)

    # three chained distributed cycles keep matching
    xs2 = out
    x_ref2 = x_ref
    for _ in range(2):
        xs2 = cycle(bs, xs2)
        x_ref2 = vcycle(setup, b, x_ref2, n_pre=2, n_post=2, coarse_deg=3)
    np.testing.assert_allclose(unshard_vector(xs2, part),
                               np.asarray(x_ref2), rtol=1e-3, atol=1e-4)


# ---------------------------------------------- sharded stencil fast path
def _stencil_fixture(n=32, periodic=False):
    from gnnla_tpu.ops.pallas_stencil import stencil_taps
    from gnnla_tpu.problems import laplacian_2d
    from gnnla_tpu.problems.laplacian import laplacian_nd

    if periodic:
        A, _, _ = laplacian_nd([n, n], bcs=[1, 1])
    else:
        A = laplacian_2d(n)
    shifts, planes = stencil_taps(A, (n, n))
    return A, shifts, jnp.asarray(planes.reshape(-1, n, n), jnp.float32)


@pytest.mark.parametrize("periodic", [False, True])
def test_sharded_stencil_matvec_parity(mesh, periodic):
    """Row-sharded stencil matvec (ring ppermute halos) must match the
    single-device jnp-roll stencil AND the COO matvec bit-for-bit
    semantics — for both Dirichlet (zero boundary taps) and periodic
    (ring wrap carries the modular tap) operators."""
    from gnnla_tpu.ops.pallas_stencil import stencil_matvec_jnp
    from gnnla_tpu.parallel import (make_sharded_stencil_matvec,
                                    shard_planes, shard_vec2d)

    n = 32
    A, shifts, planes = _stencil_fixture(n, periodic)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)

    mv = make_sharded_stencil_matvec(shifts, (n, n), mesh)
    y_sh = mv(shard_planes(planes, mesh), shard_vec2d(x, mesh))
    y_ref = stencil_matvec_jnp(planes, shifts, x)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               rtol=1e-6, atol=1e-6)
    y_coo = A.matvec(x.ravel())
    np.testing.assert_allclose(np.asarray(y_sh).ravel(), np.asarray(y_coo),
                               rtol=1e-5, atol=1e-5)


def test_sharded_stencil_matvec_probe_block(mesh):
    """[H, W, m] probe blocks (the spectral-loss SpMM shape) shard the
    same way."""
    from gnnla_tpu.ops.pallas_stencil import stencil_matvec_jnp
    from gnnla_tpu.parallel import (make_sharded_stencil_matvec,
                                    shard_planes, shard_vec2d)

    n, m = 16, 3
    _, shifts, planes = _stencil_fixture(n)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((n, n, m)), jnp.float32)
    mv = make_sharded_stencil_matvec(shifts, (n, n), mesh)
    y_sh = mv(shard_planes(planes, mesh), shard_vec2d(x, mesh))
    y_ref = stencil_matvec_jnp(planes, shifts, x)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               rtol=1e-6, atol=1e-6)


def test_sharded_stencil_jacobi_parity(mesh):
    """n sharded weighted-Jacobi sweeps == the single-device models.jacobi
    sweeps on the same grid operator."""
    from gnnla_tpu.parallel import (make_sharded_stencil_jacobi,
                                    shard_planes, shard_vec2d)

    n = 32
    A, shifts, planes = _stencil_fixture(n)
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    x0 = jnp.zeros((n, n), jnp.float32)
    diag2d = jnp.asarray(np.asarray(A.diagonal()).reshape(n, n))

    jac = make_sharded_stencil_jacobi(shifts, (n, n), mesh)
    x_sh = jac(shard_planes(planes, mesh), shard_vec2d(diag2d, mesh),
               shard_vec2d(b, mesh), shard_vec2d(x0, mesh), 0.7, 5)
    x_ref = jacobi(A, b.ravel(), x0.ravel(), omega=0.7, n_iters=5)
    np.testing.assert_allclose(np.asarray(x_sh).ravel(),
                               np.asarray(x_ref), rtol=1e-5, atol=1e-6)


def test_sharded_stencil_rejects_bad_grid(mesh):
    from gnnla_tpu.parallel import make_sharded_stencil_matvec

    _, shifts, _ = _stencil_fixture(16)
    with pytest.raises(ValueError, match="not divisible"):
        make_sharded_stencil_matvec(shifts, (18, 18), mesh)


def test_stencil_scaling_model():
    """The analytic comm/local accounting: halo bytes shrink relative to
    local work as the grid grows, so modeled efficiency must exceed the
    80% north star at bench scale and degrade monotonically with ndev at
    fixed size."""
    from gnnla_tpu.parallel import stencil_scaling_model

    m = stencil_scaling_model(2048, 2048, 9, 8)
    assert m["efficiency_serial"] > 0.8
    assert m["efficiency_overlapped"] >= m["efficiency_serial"]
    effs = [stencil_scaling_model(512, 512, 9, d)["efficiency_serial"]
            for d in (1, 2, 4, 8, 16)]
    assert all(a >= b for a, b in zip(effs, effs[1:]))
    assert m["comm_bytes_per_chip"] == 2 * 1 * 2048 * 4


# ------------------------------------------- sharded multilevel V/W-cycle
@pytest.mark.parametrize("gamma", [1, 2])
def test_sharded_multigrid_cycle_matches_single_device(mesh, rng, gamma):
    """The distributed multilevel cycle (2 sharded levels + replicated
    tail) reproduces the single-device `multigrid_cycle`."""
    from gnnla_tpu.models.multigrid import multigrid_cycle, setup_sa_multigrid
    from gnnla_tpu.parallel import make_sharded_multigrid_cycle

    A = laplacian_2d(48)  # 2304 rows; SA gives a >=3-level hierarchy
    setup = setup_sa_multigrid(A, min_coarse=16)
    assert setup.n_levels >= 3

    b = jnp.asarray(rng.random(A.n_rows), jnp.float32)
    x0 = jnp.asarray(rng.random(A.n_rows), jnp.float32)

    cycle, part = make_sharded_multigrid_cycle(
        setup, mesh, n_pre=2, n_post=2, coarse_deg=4, gamma=gamma,
        n_sharded_levels=2)
    bs = device_put_sharded(shard_vector(b, part), mesh)
    xs = device_put_sharded(shard_vector(x0, part), mesh)

    out = cycle(bs, xs)
    x_ref = multigrid_cycle(setup, b, x0, n_pre=2, n_post=2, coarse_deg=4,
                            gamma=gamma)
    np.testing.assert_allclose(unshard_vector(out, part),
                               np.asarray(x_ref), rtol=1e-4, atol=1e-5)

    # chained distributed cycles keep matching (and converge)
    xs2, x_ref2 = out, x_ref
    for _ in range(2):
        xs2 = cycle(bs, xs2)
        x_ref2 = multigrid_cycle(setup, b, x_ref2, n_pre=2, n_post=2,
                                 coarse_deg=4, gamma=gamma)
    np.testing.assert_allclose(unshard_vector(xs2, part),
                               np.asarray(x_ref2), rtol=1e-3, atol=1e-4)


def test_sharded_multigrid_cycle_auto_depth_and_guards(mesh, rng):
    """Auto level selection shards at least the finest level, and the
    DIA-swapped hierarchy is rejected loudly."""
    from gnnla_tpu.models.multigrid import (multigrid_solve,
                                            setup_sa_multigrid,
                                            setup_with_dia_multigrid)
    from gnnla_tpu.parallel import make_sharded_multigrid_cycle

    A = laplacian_2d(32)
    setup = setup_sa_multigrid(A, min_coarse=16)

    # tiny problem -> auto K = 1 (finest level only)
    cycle, part = make_sharded_multigrid_cycle(setup, mesh, n_pre=1,
                                               n_post=1, coarse_deg=4)
    b = jnp.asarray(rng.random(A.n_rows), jnp.float32)
    bs = device_put_sharded(shard_vector(b, part), mesh)
    xs = device_put_sharded(shard_vector(jnp.zeros(A.n_rows), part), mesh)
    for _ in range(4):
        xs = cycle(bs, xs)
    x_ref = multigrid_solve(setup, b, jnp.zeros(A.n_rows), n_cycles=4,
                            n_pre=1, n_post=1, coarse_deg=4)
    np.testing.assert_allclose(unshard_vector(xs, part), np.asarray(x_ref),
                               rtol=1e-3, atol=1e-4)

    with pytest.raises(ValueError, match="COO operators"):
        make_sharded_multigrid_cycle(setup_with_dia_multigrid(setup), mesh)


def test_sharded_mg_pcg_matches_and_converges(mesh, rng):
    """Distributed multilevel-PCG: matches the single-device mg_pcg
    residual history and reaches a tight tolerance in few iterations."""
    from gnnla_tpu.models.krylov import mg_pcg
    from gnnla_tpu.models.multigrid import setup_sa_multigrid
    from gnnla_tpu.parallel import make_sharded_mg_pcg

    A = laplacian_2d(48)
    setup = setup_sa_multigrid(A, min_coarse=16)
    b = jnp.asarray(rng.random(A.n_rows), jnp.float32)
    x0 = jnp.zeros(A.n_rows, jnp.float32)

    solve, part = make_sharded_mg_pcg(setup, mesh, flip_sign=True,
                                      n_sharded_levels=2)
    bs = device_put_sharded(shard_vector(b, part), mesh)
    xs = device_put_sharded(shard_vector(x0, part), mesh)
    x_sh, hist = solve(bs, xs, 10)

    x_ref, hist_ref = mg_pcg(setup, b, x0, n_iters=10, flip_sign=True)
    np.testing.assert_allclose(unshard_vector(x_sh, part),
                               np.asarray(x_ref), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hist),
                               np.asarray(hist_ref), rtol=1e-2, atol=1e-5)
    # converged hard: residual down >= 5 orders of magnitude in 10 iters
    assert hist[-1] < 1e-5 * float(jnp.linalg.norm(b))
