"""Close the smoother loop: learned-D Jacobi inside a two-grid cycle.

The committed Jacobi artifact shows the learned diagonal is a better
SMOOTHER (mean high-freq damping 0.531 vs 0.659 for ω = 2/3) but a
divergent standalone iteration (full-spectrum damping 2.19 > 1,
`artifacts/jacobi/results.json`). This script demonstrates the
solver-level payoff the reference never showed (VERDICT r4 item 7): on
held-out small-band test matrices, the EXACT two-grid asymptotic
convergence factor — the spectral radius of

    E = S (I - P Ac^{-1} P^T A) S,   S = I - ω D^{-1} A  (1 pre, 1 post)

with the library's own CLJP splitting + direct interpolation P — is
computed for D = learned vs D = diag(A) at ω = 2/3 (the reference's
evaluation weight, TrainableJacobiDiag/train.py:203-205).

Artifact: artifacts/jacobi/smoother_twogrid.json, asserted by
tests/test_artifacts.py and rendered into PERF.md by
scripts/gen_perf_results.py.

Run: PYTHONPATH=/root/repo python -u scripts/smoother_twogrid.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gnnla_tpu.models.trainable_jacobi import (  # noqa: E402
    TrainableJacobiMLP, jacobi_diag_features)
from gnnla_tpu.models.vcycle import setup_twogrid  # noqa: E402
from gnnla_tpu.training.checkpoints import load_params_npz  # noqa: E402
from gnnla_tpu.training.datasets import small_band_dataset  # noqa: E402
from gnnla_tpu.training.train_jacobi import TrainJacobiConfig  # noqa: E402


def twogrid_rho(A_s, P_s, Ac_s, d, omega, k=400, seed=0):
    """Spectral radius of the exact two-grid iteration matrix
    E = S (I - P Ac^{-1} P^T A) S, estimated as the asymptotic growth
    rate (||E^k v|| / ||E^m v||)^(1/(k-m)) of a power iteration — robust
    to complex eigenvalue pairs, and O(k n nnz) instead of LAPACK's
    O(25 n^3) dense eig (which is minutes per matrix on this host)."""
    import scipy.sparse.linalg as spla

    rng = np.random.default_rng(seed)
    n = A_s.shape[0]
    winv = (omega / np.asarray(d, np.float64))
    Ac_lu = spla.splu(Ac_s.tocsc().astype(np.float64))
    A64 = A_s.astype(np.float64)
    P64 = P_s.astype(np.float64)

    def E(v):
        v = v - winv * (A64 @ v)                       # pre-smooth
        v = v - P64 @ Ac_lu.solve(P64.T @ (A64 @ v))   # exact coarse corr
        return v - winv * (A64 @ v)                    # post-smooth

    v = rng.standard_normal(n)
    v /= np.linalg.norm(v)
    logs = []
    for _ in range(k):
        v = E(v)
        nv = np.linalg.norm(v)
        if nv == 0:
            return 0.0
        logs.append(np.log(nv))
        v /= nv
    m = k // 2  # discard transient; average the asymptotic growth rate
    return float(np.exp(np.mean(logs[m:])))


def main(n_matrices=30):
    jcfg = json.load(open(os.path.join(ROOT, "artifacts", "jacobi",
                                       "results.json")))["config"]
    cfg = TrainJacobiConfig(**{k: (tuple(v) if isinstance(v, list) else v)
                               for k, v in jcfg.items()})
    ds = small_band_dataset(cfg.num_matrices, n=cfg.n_mesh, h_low=cfg.h_low,
                            seed=cfg.seed,
                            cache_dir=os.path.join(ROOT, "data_cache"))
    rng = np.random.default_rng(cfg.seed)
    perm = rng.permutation(ds.n_graphs)
    te = ds.select(perm[cfg.n_train + cfg.n_val:
                        cfg.n_train + cfg.n_val + cfg.n_test])

    model = TrainableJacobiMLP(widths=cfg.widths,
                               init_scheme=cfg.init_scheme)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 5)))
    params = load_params_npz(
        os.path.join(ROOT, "artifacts", "jacobi", "params.npz"), template)
    stable_path = os.path.join(ROOT, "artifacts", "jacobi",
                               "params_stable.npz")
    params_stable = (load_params_npz(stable_path, template)
                     if os.path.exists(stable_path) else None)

    omega = 2.0 / 3.0
    rows = []
    t0 = time.time()
    for i in range(min(n_matrices, te.n_graphs)):
        op = te.template.with_values(jnp.asarray(te.vals[i], jnp.float32))
        diag = np.asarray(te.diags[i], np.float64)
        feats = jacobi_diag_features(
            te.template_nodiag.with_values(
                jnp.asarray(te.offdiag_vals[i], jnp.float32)),
            jnp.asarray(te.diags[i], jnp.float32))
        dlearn = np.asarray(jnp.ravel(model.apply(params, feats)),
                            np.float64)

        setup = setup_twogrid(op, theta=0.25, splitting="cljp", seed=0)
        A_s = op.to_scipy().tocsr()
        P_s = setup.P.to_scipy().tocsr()
        Ac_s = setup.Ac.to_scipy().tocsr()
        rho_l = twogrid_rho(A_s, P_s, Ac_s, dlearn, omega)
        rho_b = twogrid_rho(A_s, P_s, Ac_s, diag, omega)
        rho_s = None
        if params_stable is not None:
            dstab = np.asarray(
                jnp.ravel(model.apply(params_stable, feats)), np.float64)
            rho_s = twogrid_rho(A_s, P_s, Ac_s, dstab, omega)
        rows.append((rho_l, rho_b, rho_s))
        msg = (f"matrix {i:3d}: rho learned {rho_l:.4f}  w23 {rho_b:.4f}")
        if rho_s is not None:
            msg += f"  stable {rho_s:.4f}"
        print(msg, flush=True)

    rho_l = np.array([r[0] for r in rows])
    rho_b = np.array([r[1] for r in rows])
    out = {
        "n_matrices": len(rows),
        "omega": omega,
        "n_pre": 1, "n_post": 1,
        "convfac_learned_mean": float(rho_l.mean()),
        "convfac_w23_mean": float(rho_b.mean()),
        "convfac_learned_max": float(rho_l.max()),
        "convfac_w23_max": float(rho_b.max()),
        "n_learned_better": int((rho_l < rho_b).sum()),
        "seconds": time.time() - t0,
    }
    if params_stable is not None:
        rho_s = np.array([r[2] for r in rows])
        out["convfac_stable_mean"] = float(rho_s.mean())
        out["convfac_stable_max"] = float(rho_s.max())
        out["n_stable_better_than_w23"] = int((rho_s < rho_b).sum())
    path = os.path.join(ROOT, "artifacts", "jacobi", "smoother_twogrid.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nmean rho: learned {out['convfac_learned_mean']:.4f} vs "
          f"w23 {out['convfac_w23_mean']:.4f}"
          + (f" vs stable {out['convfac_stable_mean']:.4f}"
             if params_stable is not None else "")
          + f"; wrote {path}")


if __name__ == "__main__":
    main()
