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


def test_perf_md_matches_artifacts():
    """PERF.md's RESULTS block is generated from the artifact JSONs
    (scripts/gen_perf_results.py); this guard fails whenever the two
    disagree — the drift that recurred in rounds 3 and 4."""
    import sys
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    try:
        import gen_perf_results as g
    finally:
        sys.path.pop(0)
    with open(os.path.join(ROOT, "PERF.md")) as f:
        text = f.read()
    assert g.BEGIN in text and g.END in text, "PERF.md markers missing"
    block = text.split(g.BEGIN, 1)[1].split(g.END, 1)[0]
    expected = "\n" + g.render()
    assert block == expected, (
        "PERF.md RESULTS drifted from artifacts/ — run "
        "python scripts/gen_perf_results.py")


def test_diffusion_grid_artifact():
    """Grid-sweep selection evidence (scripts/grid_diffusion.py): all 5
    reference top combos present, best_index = argmin val loss, and the
    losses are sane (VERDICT r4 missing #2)."""
    path = os.path.join(DIFF, "grid.json")
    if not os.path.exists(path):
        pytest.skip("grid artifact not generated (scripts/grid_diffusion.py)")
    with open(path) as f:
        grid = json.load(f)
    combos = grid["combos"]
    assert len(combos) == 5
    vals = [c["val_loss"] for c in combos]
    assert grid["best_index"] == int(np.argmin(vals))
    assert all(np.isfinite(v) and 0 < v < 1.0 for v in vals), vals
    assert all(np.isfinite(c["test_loss"]) for c in combos)
    # the reference's top-model architecture is among the swept combos
    assert any(c["n_layers_external"] == 1 and c["n_layers_internal"] == 2
               and c["n_hidden"] == 32 and c["encoder"] == [3, 16]
               for c in combos)


def test_smoother_twogrid_artifact():
    """Two-grid closure artifact (scripts/smoother_twogrid.py; VERDICT r4
    item 7). The honest findings it must pin:
      * the omega=2/3 baseline cycle converges (rho < 1);
      * the REFERENCE-recipe learned D diverges inside the cycle
        (rho > 1) — the instability models/jacobi.py warns about;
      * when the stability-regularized retraining artifact is present,
        its D converges in the cycle (rho < 1)."""
    path = os.path.join(JAC, "smoother_twogrid.json")
    if not os.path.exists(path):
        pytest.skip("smoother artifact not generated "
                    "(scripts/smoother_twogrid.py)")
    with open(path) as f:
        sm = json.load(f)
    assert sm["convfac_w23_mean"] < 1.0              # baseline converges
    assert sm["convfac_learned_mean"] > 1.0          # documented divergence
    if "convfac_stable_mean" in sm:
        assert sm["convfac_stable_mean"] < 1.0       # stabilized D usable
        # parity with the omega=2/3 cycle (within 5%), not divergence
        assert sm["convfac_stable_mean"] < 1.05 * sm["convfac_w23_mean"]
        rs = os.path.join(JAC, "results_stable.json")
        if os.path.exists(rs):
            with open(rs) as f:
                st = json.load(f)
            # the regularization target: full-spectrum stable (~<= 1),
            # at the measured cost of the high-freq advantage (the
            # honest finding rendered into PERF.md)
            assert st["fullspectrum_damping_mean"]["learned"] < 1.05
            assert st["highfreq_damping_mean"]["learned"] < \
                st["highfreq_damping_mean"]["w1"] + 0.1
