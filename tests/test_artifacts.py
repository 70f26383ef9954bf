"""Committed quality artifacts: the reference's headline results.

The reference's deliverable is a learned Jacobi diagonal whose mean
high-frequency damping factor beats omega = 1 and omega = 2/3 over the
150-matrix small-band test set (train.py:126-133, 164-213). Round 4 ran
that pipeline at full scale on the TPU (scripts/reproduce_jacobi.py) and
committed the analysis npz; these tests assert the claim from the
artifact itself (not a json summary), so a regenerated artifact is
re-verified automatically.
"""

import json
import os

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JAC = os.path.join(ROOT, "artifacts", "jacobi")
DIFF = os.path.join(ROOT, "artifacts", "diffusion")


@pytest.fixture(scope="module")
def jacobi_eigs():
    path = os.path.join(JAC, "test_eigenvalues.npz")
    if not os.path.exists(path):
        pytest.skip("jacobi artifacts not generated "
                    "(scripts/reproduce_jacobi.py)")
    z = np.load(path)
    return {k: z[k] for k in z.files}


def test_learned_damping_beats_baselines(jacobi_eigs):
    """Mean high-freq damping: learned < omega=2/3 and < omega=1
    (the reference's headline comparison, train.py:164-213)."""
    z = jacobi_eigs
    assert z["evals_learn_DinvA"].shape[0] == 150  # full test split
    learned = z["evals_learn_DinvA"].max(axis=1).mean()
    w1 = z["evals_DinvA"].max(axis=1).mean()
    w23 = z["evals_TwoThirds_DinvA"].max(axis=1).mean()
    opt = z["evals_opt_DinvA"].max(axis=1).mean()
    assert learned < w23, (learned, w23)
    assert learned < w1, (learned, w1)
    # round-4 result also beats the spectrally optimal omega; keep a
    # small margin so retrained artifacts don't flake
    assert learned < opt + 0.02, (learned, opt)


def test_learned_beats_w23_per_matrix_majority(jacobi_eigs):
    """Not just on average: learned damps better than omega=2/3 on the
    overwhelming majority of individual test matrices."""
    z = jacobi_eigs
    learned = z["evals_learn_DinvA"].max(axis=1)
    w23 = z["evals_TwoThirds_DinvA"].max(axis=1)
    frac = float((learned < w23).mean())
    assert frac > 0.9, frac


def test_jacobi_artifact_layout(jacobi_eigs):
    """Same named arrays the reference saves (train.py:215-225)."""
    keys = {"evals_A", "evals_DinvA", "evals_TwoThirds_DinvA",
            "evals_opt_DinvA", "evals_learn_DinvA", "diag_A",
            "diag_opt_Dinv", "diag_learn_Dinv", "hs", "band_locs"}
    assert keys <= set(jacobi_eigs)
    n = jacobi_eigs["evals_A"].shape[0]
    for k in keys:
        assert jacobi_eigs[k].shape[0] == n


def test_jacobi_params_loadable():
    path = os.path.join(JAC, "params.npz")
    if not os.path.exists(path):
        pytest.skip("jacobi artifacts not generated")
    import jax

    from gnnla_tpu.models.trainable_jacobi import init_params
    from gnnla_tpu.training.checkpoints import load_params_npz

    template = init_params(jax.random.PRNGKey(0))
    params = load_params_npz(path, template)
    # structure matches and leaves are finite
    for leaf in jax.tree_util.tree_leaves(params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_diffusion_artifacts():
    path = os.path.join(DIFF, "results.json")
    if not os.path.exists(path):
        pytest.skip("diffusion artifacts not generated "
                    "(scripts/reproduce_diffusion.py)")
    res = json.load(open(path))
    assert res["test_loss"] is not None and res["test_loss"] < 0.05
    # OOD: loss stays bounded as alpha shrinks decades below training
    ood = list(res["ood_loss_by_decade"].values())
    assert all(np.isfinite(v) for v in ood)
    z = np.load(os.path.join(DIFF, "freq_study.npz"))
    assert z["errors"].shape[0] == z["freqs"].shape[0]
    assert np.isfinite(z["errors"]).all()
