"""Smoke + oracle tests for the L7 evaluation/viz layer
(reference train.py:136-225, Freq_Study.py, test_best_performing_model.py,
data_viz.py, PlotLosses.py)."""

import jax
import numpy as np
import pytest

from gnnla_tpu.evaluation import (eigen_analysis, freq_study_errors,
                                  high_freq_modes, load_eigen_analysis,
                                  ood_extrapolation, save_eigen_analysis)
from gnnla_tpu.models.diffusion_gnn import DiffusionGNN
from gnnla_tpu.models.trainable_jacobi import TrainableJacobiMLP
from gnnla_tpu.training.datasets import small_band_dataset


@pytest.fixture(scope="module")
def jacobi_setup():
    ds = small_band_dataset(4, n=8, seed=0, cache_dir=None)
    model = TrainableJacobiMLP()
    params = model.init(jax.random.PRNGKey(0), np.zeros((1, 5)))
    return params, ds


def test_high_freq_modes_orthonormal_columns():
    n = 8
    xy = np.stack(np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n)),
                  axis=-1).reshape(-1, 2)
    modes = high_freq_modes(n * n, xy)
    norms = np.linalg.norm(modes, axis=0)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-10)
    # only high-frequency thetas included: theta > n_1d/2 in x or y
    n_1d = int(-1 + np.sqrt(1 + n * n))
    n_low = sum(1 for tx in range(1, n_1d + 1) for ty in range(1, n_1d + 1)
                if not (tx > n_1d / 2 or ty > n_1d / 2))
    assert modes.shape[1] == n_1d * n_1d - n_low


def test_eigen_analysis_identity_sanity(jacobi_setup, tmp_path):
    """Shapes, finiteness, and damping factors in plausible ranges.

    (No ordering assertion between omega=1 and omega=2/3: on the
    ill-scaled small-band family the classical rule can invert — which is
    exactly why the diagonal is worth learning.)"""
    params, ds = jacobi_setup
    analysis = eigen_analysis(params, ds, max_graphs=2)
    for key in ("evals_DinvA", "evals_TwoThirds_DinvA", "evals_opt_DinvA",
                "evals_learn_DinvA", "evals_A", "diag_A"):
        assert analysis[key].shape[0] == 2
        assert np.all(np.isfinite(analysis[key]))
    for key in ("evals_DinvA", "evals_TwoThirds_DinvA", "evals_opt_DinvA"):
        w = analysis[key].max(axis=1)
        assert np.all(w > 0) and np.all(w < 2.0), (key, w)

    path = str(tmp_path / "test_eigenvalues.npz")
    save_eigen_analysis(path, analysis)
    loaded = load_eigen_analysis(path)
    np.testing.assert_allclose(loaded["evals_DinvA"],
                               analysis["evals_DinvA"])


@pytest.fixture(scope="module")
def diffusion_setup():
    model = DiffusionGNN(n_layers_external=1, n_layers_internal=1,
                         n_hidden=8)
    return model


def test_freq_study_surface_shape(diffusion_setup):
    model = diffusion_setup
    import jax.numpy as jnp
    from gnnla_tpu.training.datasets import (frequency_study_dataset,
                                             periodic_rel_coords)
    ds = frequency_study_dataset(n=8, max_freq=1.0)
    rel = periodic_rel_coords(ds.template_nodiag, 8)
    e_feat = np.concatenate([ds.offdiag_vals[0][:, None], rel], axis=1)
    params = model.init(jax.random.PRNGKey(0), ds.template_nodiag,
                        _dummy_state(ds, e_feat))
    freqs, errors = freq_study_errors(params, model, n=8, max_freq=1.0)
    assert freqs.shape == (3,)          # {0, 0.5, 1.0}
    assert errors.shape == (3, 3)
    assert np.all(np.isfinite(errors))


def _dummy_state(ds, e_feat):
    import jax.numpy as jnp
    from gnnla_tpu.core import GraphState
    return GraphState(
        vertices=jnp.asarray(ds.diags[0][:, None], jnp.float32),
        edges=jnp.asarray(e_feat, jnp.float32),
        globals_=jnp.asarray(ds.globals_[0], jnp.float32))


def test_ood_extrapolation_runs(diffusion_setup):
    model = diffusion_setup
    from gnnla_tpu.training.datasets import (constant_diffusion_dataset,
                                             periodic_rel_coords)
    ds = constant_diffusion_dataset(2, n=8, mode="small_alpha_large_beta")
    rel = periodic_rel_coords(ds.template_nodiag, 8)
    e_feat = np.concatenate([ds.offdiag_vals[0][:, None], rel], axis=1)
    params = model.init(jax.random.PRNGKey(0), ds.template_nodiag,
                        _dummy_state(ds, e_feat))
    out = ood_extrapolation(params, model, n=8, n_decades=3)
    np.testing.assert_allclose(out["alpha"], [1.0, 0.1, 0.01])
    assert out["loss"].shape == (3,)
    assert np.all(np.isfinite(out["loss"]))


def test_viz_functions_render(jacobi_setup, tmp_path):
    params, ds = jacobi_setup
    from gnnla_tpu.evaluation import viz
    analysis = eigen_analysis(params, ds, max_graphs=2)
    figs = [
        viz.eigenvalue_scatter(analysis),
        viz.damping_histograms(analysis),
        viz.damping_histograms(analysis, stacked=True),
        viz.histograms_compared_to_learned(analysis),
        viz.box_and_whisker(analysis),
        viz.winners_plot(analysis),
        viz.example_diag_profile(analysis),
        viz.plot_loss_history({"train_loss": [1.0, 0.5],
                               "val_loss": [1.1, 0.6]}),
        viz.plot_freq_surface(np.array([0.0, 0.5, 1.0]),
                              np.ones((3, 3)) * 1e-3,
                              save=str(tmp_path / "freq.pdf")),
    ]
    assert all(f is not None for f in figs)
    assert (tmp_path / "freq.pdf").exists()
