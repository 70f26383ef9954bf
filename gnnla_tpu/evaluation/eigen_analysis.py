"""Post-training eigen-analysis of the trainable Jacobi diagonal.

Reference: /root/reference/pytorch/TrainableJacobiDiag/train.py:136-225 —
for every test matrix, the eigenvalues of the high-frequency restriction of
the error propagator I - M A are computed for four smoothers M:

    D^-1           (omega = 1 Jacobi)
    (2/3) D^-1     (omega = 2/3 Jacobi)
    w* D^-1        (spectrally optimal omega)
    (2/3) D_l^-1   (the learned diagonal)

plus the eigenvalues of I - A itself, and saved to `test_eigenvalues.npz`
(train.py:215-225) for the data_viz plots. This is an exact dense host
computation (eval only; the training loss uses the matvec-only Gelfand
path in `training.spectral_loss`).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from gnnla_tpu.models.trainable_jacobi import (TrainableJacobiMLP,
                                               jacobi_diag_features)
from gnnla_tpu.training.datasets import StackedGraphs


def high_freq_modes(n_vertices: int, xy: np.ndarray) -> np.ndarray:
    """Normalised sin(tx*pi*x)sin(ty*pi*y) modes with tx > n/2 or ty > n/2
    (reference train.py:136-146). Returns [N, n_modes]."""
    modes = []
    n = int(-1 + np.sqrt(1 + n_vertices))
    xy = np.asarray(xy, dtype=np.float64)
    for tx in range(1, n + 1):
        for ty in range(1, n + 1):
            if tx > n / 2 or ty > n / 2:
                t = np.sin(tx * np.pi * xy[:, 0]) * np.sin(ty * np.pi * xy[:, 1])
                nrm = np.linalg.norm(t)
                if nrm > 0:
                    modes.append(t / nrm)
    return np.stack(modes, axis=1)


def _restricted_evals(M_times_A: np.ndarray, modes: np.ndarray) -> np.ndarray:
    """sorted |eig| of (I - modes^T (M A) modes)."""
    k = modes.shape[1]
    evals = np.linalg.eigvals(np.eye(k) - modes.T @ M_times_A @ modes)
    return np.sort(np.abs(evals))


def _restricted_raw_evals(M_times_A: np.ndarray,
                          modes: np.ndarray) -> np.ndarray:
    """eig of modes^T (M A) modes — the restricted propagator for ANY omega
    follows as sorted |1 - omega * evals| (the restriction is linear in the
    smoother scale, so one decomposition serves omega = 1, 2/3 and opt;
    numerics identical to the reference's per-omega eigvals calls
    (train.py:183-200) up to eig roundoff)."""
    return np.linalg.eigvals(modes.T @ M_times_A @ modes)


def eigen_analysis(params, dataset: StackedGraphs, *,
                   widths=(50, 20, 1), init_scheme: str = "reference",
                   omega_learned: float = 2.0 / 3.0,
                   max_graphs: Optional[int] = None
                   ) -> Dict[str, np.ndarray]:
    """Dense high-frequency eigen-analysis over a test bucket.

    Returns the same named arrays the reference saves (train.py:215-225):
    evals_A, evals_DinvA, evals_TwoThirds_DinvA, evals_opt_DinvA,
    evals_learn_DinvA, diag_A, diag_opt_Dinv, diag_learn_Dinv, hs,
    band_locs.
    """
    assert dataset.coords is not None, "eigen analysis needs coordinates"
    model = TrainableJacobiMLP(widths=widths, init_scheme=init_scheme)
    n_graphs = dataset.n_graphs if max_graphs is None else min(
        dataset.n_graphs, max_graphs)

    out = {k: [] for k in
           ("evals_A", "evals_DinvA", "evals_TwoThirds_DinvA",
            "evals_opt_DinvA", "evals_learn_DinvA",
            "diag_A", "diag_opt_Dinv", "diag_learn_Dinv")}
    hs, band_locs = [], []

    for i in range(n_graphs):
        op = dataset.template.with_values(
            jnp.asarray(dataset.vals[i], jnp.float32))
        A = np.asarray(op.to_dense(), dtype=np.float64)
        xy = dataset.coords[i]
        modes = high_freq_modes(A.shape[0], xy)
        d = np.diag(A)

        out["evals_A"].append(_restricted_evals(A, modes))
        # one eig of modes^T D^-1 A modes serves all three omegas (the
        # restricted propagator is I - omega * that matrix)
        raw = _restricted_raw_evals(A / d[:, None], modes)
        out["evals_DinvA"].append(np.sort(np.abs(1.0 - raw)))
        out["evals_TwoThirds_DinvA"].append(
            np.sort(np.abs(1.0 - (2.0 / 3.0) * raw)))

        # w_opt from the spectrum of D^-1 A; for symmetric A this is
        # similar to the symmetric D^-1/2 A D^-1/2, whose eigvalsh is
        # ~6x faster than general eigvals and exactly real
        if (d > 0).all() and np.allclose(A, A.T, rtol=0.0,
                                         atol=1e-12 * np.abs(A).max()):
            s = 1.0 / np.sqrt(d)
            evals_DinvA_full = np.linalg.eigvalsh(A * s[:, None] * s[None, :])
        else:
            evals_DinvA_full = np.linalg.eigvals(A / d[:, None]).real
        w_opt = 2.0 / (np.min(evals_DinvA_full) + np.max(evals_DinvA_full))
        out["evals_opt_DinvA"].append(np.sort(np.abs(1.0 - w_opt * raw)))
        out["diag_opt_Dinv"].append(w_opt / d)

        feats = jacobi_diag_features(
            dataset.template_nodiag.with_values(
                jnp.asarray(dataset.offdiag_vals[i], jnp.float32)),
            jnp.asarray(dataset.diags[i], jnp.float32))
        d_learn = np.asarray(model.apply(params, feats),
                             dtype=np.float64).ravel()
        out["evals_learn_DinvA"].append(
            _restricted_evals(omega_learned * A / d_learn[:, None], modes))
        out["diag_learn_Dinv"].append(omega_learned / d_learn)

        out["diag_A"].append(d)
        if dataset.meta is not None:
            hs.append(dataset.meta.get("h", np.zeros(n_graphs))[i])
            band_locs.append(
                dataset.meta.get("band_loc", np.zeros(n_graphs))[i])

    result = {k: np.stack(v) for k, v in out.items()}
    result["hs"] = np.asarray(hs)
    result["band_locs"] = np.asarray(band_locs)
    return result


def save_eigen_analysis(path: str, analysis: Dict[str, np.ndarray]) -> None:
    """np.savez artifact, same layout as the reference's
    test_eigenvalues.npz (train.py:215-225)."""
    np.savez(path, **analysis)


def load_eigen_analysis(path: str) -> Dict[str, np.ndarray]:
    z = np.load(path)
    return {k: z[k] for k in z.files}
