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
