"""Row-partitioned sharded kernels on a device mesh.

No reference counterpart (the reference is single-device, SURVEY.md §2.5);
this demonstrates the shard_map/ppermute halo-exchange SpMV, sharded Jacobi
and the psum-reduced power method. Run with real devices or a virtual CPU
mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/distributed.py
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from gnnla_tpu.models import jacobi, power_method
from gnnla_tpu.parallel import (device_put_sharded, make_sharded_jacobi,
                                make_sharded_power_method, partition_rows,
                                shard_vector, unshard_vector)
from gnnla_tpu.problems import laplacian_2d


def main(n=16):
    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), axis_names=("rows",))
    print(f"{n_dev} devices: {jax.devices()}")

    A = laplacian_2d(n)
    part = partition_rows(A, n_dev)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.random(n * n), jnp.float32)
    x0 = jnp.asarray(rng.random(n * n), jnp.float32)

    bs = device_put_sharded(shard_vector(b, part), mesh)
    xs = device_put_sharded(shard_vector(x0, part), mesh)
    ds = device_put_sharded(shard_vector(A.diagonal(), part), mesh)

    jac = make_sharded_jacobi(part, mesh)
    out = unshard_vector(jac(bs, xs, ds, 0.7, 10), part)
    ref = jacobi(A, b, x0, omega=0.7, n_iters=10)
    print(f"sharded jacobi rel err vs single-device: "
          f"{float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref)):.3e}")

    pm = make_sharded_power_method(part, mesh)
    lam, _ = pm(device_put_sharded(shard_vector(x0, part), mesh), 30)
    lam_ref, _ = power_method(A, x0, n_iters=30)
    print(f"sharded power method: {float(lam):.6f} "
          f"vs single-device {float(lam_ref):.6f}")

    # --- sharded stream kernel: the general-graph fast path ---------------
    # (per-shard Pallas packs, ring ppermute halos bounded by the RCM
    # bandwidth; interpret mode off-TPU, Mosaic on hardware)
    from scipy import sparse as sp

    from gnnla_tpu.parallel import build_sharded_stream, stream_scaling_model

    ns = 1024 * 2 * n_dev
    rng2 = np.random.default_rng(1)
    idx = np.arange(ns)
    r_, c_ = [], []
    for off in (-2, -1, 0, 1, 2):
        r_.append(idx)
        c_.append(np.clip(idx + off, 0, ns - 1))
    As = sp.csr_matrix((rng2.standard_normal(5 * ns).astype(np.float32),
                        (np.concatenate(r_), np.concatenate(c_))),
                       shape=(ns, ns))
    As.sum_duplicates()
    p = rng2.permutation(ns)
    As = As[p][:, p].tocsr()
    As.sort_indices()
    on_tpu = jax.devices()[0].platform != "cpu"
    kern = build_sharded_stream(As, mesh, "rows", interpret=not on_tpu)
    xg = rng2.standard_normal(ns).astype(np.float32)
    y = kern.matvec(xg)
    err = np.linalg.norm(y - As @ xg) / np.linalg.norm(As @ xg)
    m = stream_scaling_model(kern)
    print(f"sharded stream (general graph, halo {kern.h_tiles} tiles) "
          f"rel err {err:.3e}; modeled scaling "
          f"{m['efficiency_serial']:.1%} serial / "
          f"{m['efficiency_overlapped']:.1%} overlapped")

    # --- distributed two-grid V-cycle on the stream fast path -------------
    # (fine-level smoothing + residual on the per-shard stream packs;
    # psum restriction, replicated coarse Chebyshev)
    from gnnla_tpu.models import setup_twogrid, vcycle
    from gnnla_tpu.ops.sparse import SparseOperator
    from gnnla_tpu.parallel import make_sharded_stream_vcycle

    ngv = 32 * max(1, int(np.ceil(np.sqrt(n_dev * 1024) / 32)))
    Av = laplacian_2d(ngv).eliminate_zeros()
    pv = rng2.permutation(Av.n_rows)
    Avh = Av.to_scipy().tocsr()[pv][:, pv].tocsr()
    Avh.sort_indices()
    Av = SparseOperator.from_scipy(Avh)
    setup_v = setup_twogrid(Av, theta=0.25, splitting="pmis", seed=0)
    cyc, kv = make_sharded_stream_vcycle(setup_v, mesh, "rows",
                                         interpret=not on_tpu)
    bv = rng2.standard_normal(Av.n_rows).astype(np.float32)
    x3 = cyc(kv.shard(kv.to_padded(bv)),
             kv.shard(kv.to_padded(np.zeros_like(bv))))
    ref_v = np.asarray(vcycle(setup_v, jnp.asarray(bv),
                              jnp.zeros(Av.n_rows, jnp.float32)))
    errv = np.linalg.norm(kv.from_padded(x3) - ref_v) / np.linalg.norm(ref_v)
    print(f"sharded stream V-cycle ({ngv}x{ngv} scrambled Laplacian, "
          f"{n_dev} shards) rel err vs single-device: {errv:.3e}")

    # --- distributed multilevel PCG: the large-N solve, sharded -----------
    # (SA hierarchy; finest levels row-sharded, replicated coarse tail;
    # CG inner products are full-graph reductions -> psum)
    from gnnla_tpu.models.multigrid import setup_sa_multigrid
    from gnnla_tpu.parallel import make_sharded_mg_pcg

    Am = laplacian_2d(48)
    setup_m = setup_sa_multigrid(Am, min_coarse=16)
    solve, pm_ = make_sharded_mg_pcg(setup_m, mesh, flip_sign=True,
                                     n_sharded_levels=2)
    bm = jnp.asarray(rng.random(Am.n_rows), jnp.float32)
    xm, hist = solve(device_put_sharded(shard_vector(bm, pm_), mesh),
                     device_put_sharded(shard_vector(
                         jnp.zeros(Am.n_rows, jnp.float32), pm_), mesh),
                     8)
    print(f"sharded mg_pcg ({setup_m.n_levels} levels, 2 sharded): "
          f"|r| {float(jnp.linalg.norm(bm)):.2e} -> {hist[-1]:.2e} "
          f"in 8 iters")


if __name__ == "__main__":
    main()
