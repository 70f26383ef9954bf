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

    # Same platform override as tests/conftest.py: the image's
    # sitecustomize imports jax and pins the TPU backend before user code;
    # override the loaded config and reset the backend cache.
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
                                    to_global)
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

    with open(os.path.join(outdir, f"ok_{pid}.json"), "w") as f:
        json.dump({"pid": pid, "n_devices": n_dev,
                   "lam": float(lam_all.ravel()[0]), "lam_true": lam_true,
                   "lam_err": lam_err}, f)


if __name__ == "__main__":
    main()
