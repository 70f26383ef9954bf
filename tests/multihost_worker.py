"""Multi-process worker: real `jax.distributed` bring-up on CPU.

Launched by tests/test_multihost.py as N separate OS processes, each owning
4 forced-host devices, joined through a coordination service on localhost.
This is the exact code path a TPU pod runs (SURVEY.md §2.5 "distributed
communication backend"): `initialize_distributed` -> `global_row_mesh`
spanning every process's devices -> `to_global` to materialise each
process's addressable shards -> the unchanged `shard_map` kernels, with
the halo `ppermute` and the `psum` reductions now crossing process
boundaries.

Usage: python multihost_worker.py <pid> <nproc> <coordinator> <outdir>
"""

import json
import os
import sys


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coordinator, outdir = sys.argv[3], sys.argv[4]

    # The spawner (tests/test_multihost.py) disables the image's axon
    # sitecustomize via env (PALLAS_AXON_POOL_IPS unset) and sets
    # JAX_PLATFORMS=cpu, so the first jax import lands on CPU directly.
    # The backend reset below is a guarded FALLBACK for launches that
    # didn't scrub the env (it is a no-op under the normal spawner).
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()

    import jax

    if jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")
        from jax._src import xla_bridge as _xb
        _xb._clear_backends()

    import numpy as np

    from gnnla_tpu.parallel import (initialize_distributed, global_row_mesh,
                                    replicate_global, to_global)
    from gnnla_tpu.parallel.partition import partition_rows, shard_vector
    from gnnla_tpu.parallel.spmv import (make_sharded_matvec,
                                         make_sharded_power_method)
    from gnnla_tpu.problems import laplacian_2d

    initialize_distributed(coordinator_address=coordinator,
                           num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    n_dev = jax.device_count()
    assert n_dev == 4 * nproc, n_dev

    mesh = global_row_mesh()

    # every process builds the same problem on the host (deterministic),
    # then materialises only its addressable shards
    op = laplacian_2d(16)
    n = op.n_rows
    part = partition_rows(op, n_dev)
    part_g = to_global(part, mesh)

    rng = np.random.default_rng(7)
    x = rng.standard_normal(n).astype(np.float32)
    x_g = to_global(np.asarray(shard_vector(x, part)), mesh)

    # host reference
    rows, cols, vals = op.host_coo()
    y_ref = np.zeros(n, np.float64)
    np.add.at(y_ref, rows, vals * x[cols])
    y_ref_sr = np.zeros((part.n_shards, part.rows_per_shard))
    y_ref_sr.reshape(-1)[:n] = y_ref

    # --- sharded SpMV: halo ppermute crosses the process boundary --------
    y = make_sharded_matvec(part_g, mesh)(x_g)
    for shard in y.addressable_shards:
        got = np.asarray(shard.data)
        want = y_ref_sr[shard.index]
        err = float(np.max(np.abs(got - want)) /
                    (np.max(np.abs(y_ref)) + 1e-30))
        assert err < 1e-5, (shard.index, err)

    # --- sharded power method: psum reductions span all processes --------
    b0 = to_global(np.asarray(shard_vector(np.ones(n, np.float32), part)),
                   mesh)
    lam, _ = make_sharded_power_method(part_g, mesh)(b0, n_iters=60)
    from jax.experimental import multihost_utils
    # lam is replicated over the whole mesh; read this process's copy and
    # allgather the *host* scalars to check cross-process agreement
    lam_local = np.asarray(lam.addressable_data(0))
    lam_all = np.asarray(multihost_utils.process_allgather(lam_local))
    dense = np.zeros((n, n))
    dense[rows, cols] = vals
    lam_true = float(np.max(np.linalg.eigvalsh(dense)))
    assert np.ptp(lam_all) < 1e-6, lam_all          # replicated agreement
    lam_err = abs(float(lam_all.ravel()[0]) - lam_true) / lam_true
    assert lam_err < 5e-3, (float(lam_all.ravel()[0]), lam_true)

    # --- sharded multilevel cycle across the process boundary ------------
    # (halo ppermute per level, psum restriction, dynamic_slice/all_gather
    # level hand-off, replicated coarse tail — the deepest distributed
    # composition, running over two real processes)
    from gnnla_tpu.models.multigrid import multigrid_cycle, setup_sa_multigrid
    from gnnla_tpu.parallel import make_sharded_multigrid_cycle

    ml = setup_sa_multigrid(op, min_coarse=8)
    cyc, part_m = make_sharded_multigrid_cycle(
        ml, mesh, n_pre=2, n_post=2, coarse_deg=4,
        n_sharded_levels=2 if ml.n_levels >= 3 else 1,
        globalize=lambda s, r: (to_global(s, mesh),
                                replicate_global(r, mesh)))
    b_ml = rng.standard_normal(n).astype(np.float32)
    bm = to_global(np.asarray(shard_vector(b_ml, part_m)), mesh)
    xm = to_global(np.asarray(shard_vector(np.zeros(n, np.float32),
                                           part_m)), mesh)
    out_m = cyc(bm, xm)
    x_ref = np.asarray(multigrid_cycle(ml, b_ml, np.zeros(n, np.float32),
                                       n_pre=2, n_post=2, coarse_deg=4))
    x_ref_sr = np.zeros((part_m.n_shards, part_m.rows_per_shard))
    x_ref_sr.reshape(-1)[:n] = x_ref
    scale = np.max(np.abs(x_ref)) + 1e-30
    for shard in out_m.addressable_shards:
        err = float(np.max(np.abs(np.asarray(shard.data)
                                  - x_ref_sr[shard.index])) / scale)
        assert err < 1e-4, (shard.index, err)

    # --- distributed multilevel PCG across the process boundary ----------
    # (the full solver: cycle-preconditioned CG with cross-process psum
    # inner products; ADVICE r4 — previously unvalidated multi-process)
    from gnnla_tpu.parallel.krylov import make_sharded_mg_pcg

    solve, part_p = make_sharded_mg_pcg(
        ml, mesh, coarse_deg=4, flip_sign=True,
        globalize=lambda s, r: (to_global(s, mesh),
                                replicate_global(r, mesh)))
    b_p = to_global(np.asarray(shard_vector(b_ml, part_p)), mesh)
    x0_p = to_global(np.asarray(shard_vector(np.zeros(n, np.float32),
                                             part_p)), mesh)
    _, hist_p = solve(b_p, x0_p, n_iters=8)
    bnorm = float(np.linalg.norm(b_ml))
    pcg_red = float(hist_p[-1]) / bnorm
    assert pcg_red < 1e-5, (list(map(float, hist_p)), bnorm)

    with open(os.path.join(outdir, f"ok_{pid}.json"), "w") as f:
        json.dump({"pid": pid, "n_devices": n_dev,
                   "lam": float(lam_all.ravel()[0]), "lam_true": lam_true,
                   "lam_err": lam_err, "mg_levels": ml.n_levels,
                   "pcg_rel_residual": pcg_red}, f)


if __name__ == "__main__":
    main()
