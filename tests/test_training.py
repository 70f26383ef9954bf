"""Tests for the learned-model family: spectral loss, trainable Jacobi,
diffusion GNN — small configs so the suite stays fast on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnla_tpu.models.diffusion_gnn import DiffusionGNN
from gnnla_tpu.models.trainable_jacobi import (TrainableJacobiMLP,
                                               jacobi_diag_features)
from gnnla_tpu.core import GraphState
from gnnla_tpu.problems import laplacian_2d
from gnnla_tpu.training import (TrainDiffusionConfig, TrainJacobiConfig,
                                cosine_diffusion_dataset, small_band_dataset,
                                spectral_loss, train_diffusion, train_jacobi)
from gnnla_tpu.training.train_diffusion import edge_features


def test_gelfand_vs_exact_damping():
    """Gelfand estimate must lower-bound (approach) the exact |lambda|max on
    the Laplacian, as in Taghibakhshi et al. (reference loss.py:66-71)."""
    A = laplacian_2d(8)
    diag = A.diagonal()
    omega = 2.0 / 3.0
    exact = float(spectral_loss.damping_factor_exact(A, diag, omega))
    rng = np.random.default_rng(0)
    probes = jnp.asarray(
        spectral_loss.uniform_probes(64, 30, rng), jnp.float32)
    est = float(spectral_loss.damping_factor_gelfand(A, diag, omega, probes,
                                                     k=6))
    assert est <= exact + 1e-4
    assert est > 0.5 * exact  # not wildly off


def test_error_apply_matches_dense():
    A = laplacian_2d(5)
    diag = A.diagonal()
    y = jnp.asarray(np.random.default_rng(1).random((25, 4)), jnp.float32)
    got = spectral_loss.error_apply(A, diag, 0.7, y)
    Ad = np.asarray(A.to_dense(), np.float64)
    T = np.eye(25) - 0.7 * (Ad / np.asarray(diag, np.float64)[:, None])
    np.testing.assert_allclose(got, T @ np.asarray(y, np.float64),
                               rtol=1e-4, atol=1e-5)


def test_optimal_omega_on_spd():
    """For -Laplacian (SPD), omega* = 2/(lmax+lmin) of D^-1 A."""
    import scipy.sparse as sp
    from gnnla_tpu.ops.sparse import SparseOperator
    A = laplacian_2d(5)
    Apos = SparseOperator.from_dense(-np.asarray(A.to_dense(), np.float64))
    w = float(spectral_loss.optimal_omega(Apos))
    Ad = np.asarray(Apos.to_dense(), np.float64)
    evs = np.abs(np.linalg.eigvals(Ad / np.diag(Ad)[:, None]))
    np.testing.assert_allclose(w, 2.0 / (evs.max() + evs.min()), rtol=1e-4)


def test_high_freq_probes_shape_and_norm():
    rng = np.random.default_rng(3)
    Y = spectral_loss.high_freq_probes(25, 7, None, rng)
    assert Y.shape == (25, 7)
    np.testing.assert_allclose(np.linalg.norm(Y, axis=0), 1.0, rtol=1e-12)


def test_jacobi_features():
    A = laplacian_2d(3)
    nd = A.remove_diagonal()
    feats = jacobi_diag_features(nd, A.diagonal())
    assert feats.shape == (9, 5)
    # The kron-built fixture stores explicit zero edges — matching the
    # reference's laplacianfun_torch exactly (UtilsGNN.py:56-60) — so corner
    # vertex 0 has 5 stored off-diag entries {1, 0, 1, 0, 0}:
    # min=0, mean=0.4, sum=2, max=1.
    np.testing.assert_allclose(np.asarray(feats[0]), [-4, 0, 0.4, 2, 1],
                               rtol=1e-6)
    # with explicit zeros eliminated: 2 real neighbors of +1
    nd_tight = nd.eliminate_zeros()
    feats_t = jacobi_diag_features(nd_tight, A.diagonal())
    np.testing.assert_allclose(np.asarray(feats_t[0]), [-4, 1, 1, 2, 1],
                               rtol=1e-6)


def test_trainable_jacobi_model_parity_with_reference_shapes():
    model = TrainableJacobiMLP()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 5)))
    flat = jax.tree_util.tree_leaves(params)
    n_params = sum(p.size for p in flat)
    # reference MLP 5->50->20->1: (5*50+50)+(50*20+20)+(20*1+1) = 1341
    assert n_params == 1341
    # reference init: weights U[0,1), bias 0.01
    kernel = params["params"]["Dense_0"]["kernel"]
    assert float(jnp.min(kernel)) >= 0.0 and float(jnp.max(kernel)) < 1.0
    bias = params["params"]["Dense_0"]["bias"]
    np.testing.assert_allclose(np.asarray(bias), 0.01)


def test_small_band_dataset_stacking(tmp_path):
    ds = small_band_dataset(4, n=10, seed=1, cache_dir=str(tmp_path))
    assert ds.vals.shape[0] == 4
    assert ds.diags.shape == (4, ds.template.n_rows)
    assert ds.offdiag_vals.shape == (4, ds.template_nodiag.nnz)
    # cache roundtrip
    ds2 = small_band_dataset(4, n=10, seed=1, cache_dir=str(tmp_path))
    np.testing.assert_allclose(ds.vals, ds2.vals)
    np.testing.assert_allclose(ds.coords, ds2.coords)


def test_train_jacobi_smoke(tmp_path):
    """Loss must decrease over a short run on a tiny dataset; the learned
    diagonal must beat omega=1 on damping (the reference's quality check,
    train.py:126-133)."""
    cfg = TrainJacobiConfig(num_matrices=16, n_mesh=10, epochs=8,
                            batch_size=8, n_train=12, n_val=2, n_test=2,
                            m_probes=8, cache_dir=str(tmp_path),
                            log_every=0)
    params, history = train_jacobi(cfg)
    assert history["train_loss"][-1] < history["train_loss"][0]
    assert np.isfinite(history["test_loss"])

    from gnnla_tpu.training import evaluate_vs_baselines, small_band_dataset
    ds = small_band_dataset(4, n=10, seed=99, cache_dir=str(tmp_path))
    res = evaluate_vs_baselines(params, ds, cfg, max_graphs=4)
    assert res["learned"] < res["w1"]  # beats unweighted Jacobi


def test_diffusion_dataset(tmp_path):
    ds = cosine_diffusion_dataset(3, n=8, seed=2, cache_dir=str(tmp_path))
    assert ds.targets.shape == (3, 64, 2)
    assert ds.globals_.shape == (3, 1)
    rel = edge_features(ds, 8)
    assert rel.shape == (ds.template_nodiag.nnz, 2)
    assert set(np.unique(rel)).issubset({-1.0, 0.0, 1.0})


def test_diffusion_gnn_forward_shapes():
    ds = cosine_diffusion_dataset(2, n=8, seed=5, cache_dir=None)
    rel = edge_features(ds, 8)
    model = DiffusionGNN(n_layers_external=2, n_layers_internal=2,
                         n_hidden=8, encoder=(1, 8), decoder=(1, 8))
    e = jnp.concatenate([jnp.asarray(ds.offdiag_vals[0],
                                     jnp.float32)[:, None],
                         jnp.asarray(rel, jnp.float32)], axis=1)
    state = GraphState(
        vertices=jnp.asarray(ds.diags[0], jnp.float32)[:, None],
        edges=e, globals_=jnp.asarray(ds.globals_[0], jnp.float32))
    params = model.init(jax.random.PRNGKey(0), ds.template_nodiag, state)
    out = model.apply(params, ds.template_nodiag, state)
    assert out.shape == (64, 2)


def test_train_diffusion_smoke(tmp_path):
    cfg = TrainDiffusionConfig(num_matrices=12, n_mesh=8, epochs=10,
                               batch_size=4, n_hidden=8,
                               n_layers_external=1, n_layers_internal=2,
                               cache_dir=str(tmp_path), log_every=0,
                               patience=50)
    params, history = train_diffusion(cfg)
    assert history["train_loss"][-1] < history["train_loss"][0]
    assert history["test_loss"] is not None


def test_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore roundtrip + best-step tracking (replaces
    Lightning ModelCheckpoint, reference DiffCoeffs/train.py:174-177)."""
    import jax.numpy as jnp
    from gnnla_tpu.training.checkpoints import CheckpointManager

    state = {"w": jnp.arange(4.0), "b": jnp.ones(2)}
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, state, metrics={"val_loss": 1.0})
    mgr.save(1, {"w": state["w"] * 2, "b": state["b"]},
             metrics={"val_loss": 0.5})
    mgr.save(2, {"w": state["w"] * 3, "b": state["b"]},
             metrics={"val_loss": 0.8})
    assert mgr.latest_step() == 2
    assert mgr.best_step() == 1
    restored = mgr.restore(1, template=state)
    np.testing.assert_allclose(np.asarray(restored["w"]),
                               np.asarray(state["w"]) * 2)
    mgr.close()


def test_cli_grid_listing(capsys):
    """CLI grid slicing (reference parsing.py:42-65 semantics)."""
    from gnnla_tpu import cli
    assert cli.main(["diffusion", "--num-combos"]) == 0
    out = capsys.readouterr().out
    assert "5 total combinations" in out
    assert cli.main(["diffusion", "--full-grid", "--num-combos"]) == 0
    assert "432 total combinations" in capsys.readouterr().out
    assert cli.main(["diffusion", "--show-combos"]) == 0
    assert len(capsys.readouterr().out.strip().splitlines()) == 5


def test_train_jacobi_on_stretched_mesh():
    """The MATLAB trainer's data family (train_jacobi_find_d.m:59-82):
    training runs on the stretched heat-equation bucket via the `dataset`
    hook and produces finite, improving losses."""
    from gnnla_tpu.training.datasets import stretched_mesh_dataset
    from gnnla_tpu.training.train_jacobi import TrainJacobiConfig, train

    ds = stretched_mesh_dataset(16, n_cells=6, max_stretch=5.0, seed=3)
    cfg = TrainJacobiConfig(num_matrices=16, n_mesh=6, epochs=3,
                            batch_size=4, n_train=10, n_val=3, n_test=3,
                            m_probes=4, cache_dir=None, checkpoint_dir=None,
                            log_every=0)
    params, hist = train(cfg, dataset=ds)
    assert np.all(np.isfinite(hist["train_loss"]))
    assert hist["train_loss"][-1] <= hist["train_loss"][0] + 1e-3


def test_profile_trace_writes(tmp_path):
    """jax.profiler integration (SURVEY §5: observability the reference
    lacks)."""
    import jax.numpy as jnp
    from gnnla_tpu.utils import profile_trace

    with profile_trace(str(tmp_path / "trace")):
        jnp.sum(jnp.ones(128)).block_until_ready()
    import os
    found = any("trace" in root or files
                for root, _, files in os.walk(tmp_path))
    assert found


def test_convection_diffusion_end_to_end(tmp_path):
    """Convection-diffusion family (CosineDiffusionConvectionFEM_Builder,
    reference FEM.py:231-239): dataset, data module and a train smoke run
    (VERDICT r1 item 6)."""
    from gnnla_tpu.training.datasets import diffusion_data_module
    from gnnla_tpu.training.train_diffusion import (TrainDiffusionConfig,
                                                    train)

    tr, va, te = diffusion_data_module("cosine_convection", num_matrices=8,
                                       n=8, cache_dir=None)
    assert tr.n_graphs + va.n_graphs + te.n_graphs == 8
    # convection makes K genuinely nonsymmetric
    A = tr.template.with_values(tr.vals[0]).to_scipy()
    assert abs(A - A.T).max() > 1e-8

    # opt-in reproduction of the reference's symmetrized-assembly quirk
    # (FEM.py:122-128 mirrors the k<=l integral): symmetric even with
    # convection, and different from the physical assembly
    from gnnla_tpu.training.datasets import cosine_diffusion_dataset
    ds_ref = cosine_diffusion_dataset(2, n=8, seed=11,
                                      convection=(0.1, 0.0),
                                      reference_symmetrized=True,
                                      cache_dir=None)
    Ar = ds_ref.template.with_values(ds_ref.vals[0]).to_scipy()
    assert abs(Ar - Ar.T).max() < 1e-12
    ds_phys = cosine_diffusion_dataset(2, n=8, seed=11,
                                       convection=(0.1, 0.0),
                                       cache_dir=None)
    assert abs(ds_phys.vals[0] - ds_ref.vals[0]).max() > 1e-8

    cfg = TrainDiffusionConfig(num_matrices=8, n_mesh=8, epochs=2,
                               batch_size=4, n_hidden=8,
                               convection=(0.1, 0.0), cache_dir=None)
    params, hist = train(cfg)
    assert np.isfinite(hist["train_loss"]).all()
    assert hist["train_loss"][-1] <= hist["train_loss"][0] * 1.5


def test_train_jacobi_data_parallel_parity(tmp_path):
    """TrainJacobiConfig(n_devices=8) must reproduce the single-device loss
    curves: params/optimizer replicated, batch sharded over the 'data' axis,
    XLA inserting the gradient psum (the accelerator='auto' role of the
    reference trainer, TrainableJacobiDiag/train.py:99-128)."""
    from gnnla_tpu.training import small_band_dataset

    ds = small_band_dataset(16, n=10, seed=7, cache_dir=str(tmp_path))
    base = dict(num_matrices=16, n_mesh=10, epochs=3, batch_size=8,
                n_train=12, n_val=2, n_test=2, m_probes=8,
                cache_dir=None, log_every=0)
    _, h1 = train_jacobi(TrainJacobiConfig(**base), dataset=ds)
    _, h8 = train_jacobi(TrainJacobiConfig(**base, n_devices=8), dataset=ds)
    np.testing.assert_allclose(h8["train_loss"], h1["train_loss"],
                               rtol=1e-4)
    np.testing.assert_allclose(h8["val_loss"], h1["val_loss"], rtol=1e-4)


def test_train_diffusion_data_parallel_parity(tmp_path):
    """Same contract for the diffusion trainer (reference runs it under
    Lightning accelerator='auto', devices='auto', DiffCoeffs/train.py:181)."""
    ds = cosine_diffusion_dataset(16, n=8, seed=11, cache_dir=str(tmp_path))
    base = dict(num_matrices=16, n_mesh=8, epochs=3, batch_size=8,
                n_hidden=8, n_layers_external=1, n_layers_internal=2,
                cache_dir=None, log_every=0, patience=50)
    _, h1 = train_diffusion(TrainDiffusionConfig(**base), dataset=ds)
    _, h8 = train_diffusion(TrainDiffusionConfig(**base, n_devices=8),
                            dataset=ds)
    np.testing.assert_allclose(h8["train_loss"], h1["train_loss"],
                               rtol=1e-4)
    np.testing.assert_allclose(h8["val_loss"], h1["val_loss"], rtol=1e-4)


def test_train_jacobi_rejects_indivisible_batch():
    with pytest.raises(ValueError, match="divisible"):
        train_jacobi(TrainJacobiConfig(num_matrices=8, n_mesh=10, epochs=1,
                                       batch_size=6, n_train=6, n_val=1,
                                       n_test=1, cache_dir=None,
                                       n_devices=8, log_every=0))


def test_stencil_loss_layout_parity():
    """make_loss_fn(layout='stencil') must match the DIA layout in both
    value and gradient — the grid-roll propagator is the same T = I -
    omega D^-1 A (reference loss contract,
    TrainableJacobiDiag/loss.py:105-128), only the matrix layout differs."""
    from gnnla_tpu.training.train_jacobi import (feature_stack, make_loss_fn,
                                                 matrix_stack, _draw_probes)
    from gnnla_tpu.training import small_band_dataset

    ds = small_band_dataset(4, n=10, seed=7, cache_dir=None)
    from gnnla_tpu.models.trainable_jacobi import TrainableJacobiMLP
    model = TrainableJacobiMLP(widths=(50, 20, 1))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 5),
                                                         jnp.float32))
    rng = np.random.default_rng(0)
    probes = _draw_probes(ds, range(4), 8, rng)

    def f32(a):
        return jnp.asarray(a, jnp.float32)

    args = (f32(feature_stack(ds)), f32(ds.diags), f32(probes))
    out = {}
    for layout in ("dia", "stencil"):
        lf = make_loss_fn(model, ds, 2.0 / 3.0, 3, layout=layout)
        mat = f32(matrix_stack(ds, layout))
        loss, grads = jax.value_and_grad(lf)(params, mat, *args)
        flat, _ = jax.flatten_util.ravel_pytree(grads)
        out[layout] = (float(loss), np.asarray(flat))
    np.testing.assert_allclose(out["stencil"][0], out["dia"][0], rtol=1e-5)
    np.testing.assert_allclose(out["stencil"][1], out["dia"][1], rtol=1e-4,
                               atol=1e-7)


def test_train_jacobi_stencil_layout_smoke():
    """End-to-end training on loss_layout='stencil' (VERDICT r2 item 8)."""
    cfg = TrainJacobiConfig(num_matrices=12, n_mesh=10, epochs=3,
                            batch_size=4, n_train=8, n_val=2, n_test=2,
                            m_probes=6, cache_dir=None, log_every=0,
                            loss_layout="stencil")
    _, history = train_jacobi(cfg)
    assert history["train_loss"][-1] < history["train_loss"][0]
    assert np.isfinite(history["test_loss"])


def test_banded_features_match_edge_path():
    """jacobi_diag_features_banded (zero-gather band layout) == the
    edge-order path, per matrix, including boundary rows with degree < K."""
    from gnnla_tpu.models.trainable_jacobi import jacobi_diag_features_banded

    ds = small_band_dataset(3, n=10, seed=3, cache_dir=None)
    lay, band_ov = ds.band_stack_nodiag()
    mask = jnp.asarray(lay.mask)
    deg = jnp.asarray(np.maximum(lay.deg, 1), jnp.float32)
    for i in range(3):
        f_edge = jacobi_diag_features(
            ds.template_nodiag.with_values(
                jnp.asarray(ds.offdiag_vals[i], jnp.float32)),
            jnp.asarray(ds.diags[i], jnp.float32))
        f_band = jacobi_diag_features_banded(
            jnp.asarray(ds.diags[i], jnp.float32),
            jnp.asarray(band_ov[i], jnp.float32), mask, deg)
        np.testing.assert_allclose(np.asarray(f_band), np.asarray(f_edge),
                                   rtol=1e-5, atol=1e-6)


def test_diffusion_band_path_matches_edge_path():
    """One parameter tree, two execution paths: the band-layout forward
    (zero gathers, ops/band.py) must reproduce the edge-order GNBlock
    forward — including the global update (n_layers_external=2) and the
    periodic wrap offsets of the diffusion pattern."""
    from gnnla_tpu.training.train_diffusion import (make_apply,
                                                    make_apply_banded)

    ds = cosine_diffusion_dataset(3, n=8, seed=5, cache_dir=None)
    rel = edge_features(ds, 8)
    model = DiffusionGNN(n_layers_external=2, n_layers_internal=2,
                         n_hidden=8, encoder=(1, 8), decoder=(1, 8))
    e0 = jnp.concatenate([jnp.asarray(ds.offdiag_vals[0],
                                      jnp.float32)[:, None],
                          jnp.asarray(rel, jnp.float32)], axis=1)
    s0 = GraphState(vertices=jnp.asarray(ds.diags[0], jnp.float32)[:, None],
                    edges=e0,
                    globals_=jnp.asarray(ds.globals_[0], jnp.float32))
    params = model.init(jax.random.PRNGKey(0), ds.template_nodiag, s0)

    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    apply_edge = make_apply(model, ds, rel)
    apply_band, pack = make_apply_banded(model, ds, rel)

    out_e = apply_edge(params, f32(ds.offdiag_vals), f32(ds.diags),
                       f32(ds.globals_))
    out_b = apply_band(params, f32(pack(ds.offdiag_vals)), f32(ds.diags),
                       f32(ds.globals_))
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_e),
                               rtol=1e-4, atol=1e-5)


def test_diffusion_grid_path_matches_edge_path():
    """GridPattern (stencil-class rolls, mask-free) forward == edge path
    on the uniform periodic diffusion pattern, same params."""
    from gnnla_tpu.ops.band import GridBandLayout
    from gnnla_tpu.training.train_diffusion import (make_apply,
                                                    make_apply_banded)

    ds = cosine_diffusion_dataset(2, n=8, seed=9, cache_dir=None)
    rel = edge_features(ds, 8)
    model = DiffusionGNN(n_layers_external=2, n_layers_internal=2,
                         n_hidden=8, encoder=(1, 8))
    e0 = jnp.concatenate([jnp.asarray(ds.offdiag_vals[0],
                                      jnp.float32)[:, None],
                          jnp.asarray(rel, jnp.float32)], axis=1)
    s0 = GraphState(vertices=jnp.asarray(ds.diags[0], jnp.float32)[:, None],
                    edges=e0,
                    globals_=jnp.asarray(ds.globals_[0], jnp.float32))
    params = model.init(jax.random.PRNGKey(1), ds.template_nodiag, s0)

    # this pattern really selects the grid layout (K = 8 classes)
    lay = GridBandLayout(ds.template_nodiag, 8, 8)
    assert lay.k == 8 and lay.n_edges == 8 * 64

    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    apply_edge = make_apply(model, ds, rel)
    apply_grid, pack = make_apply_banded(model, ds, rel, grid_shape=(8, 8))
    # the grid layout was selected: packed stacks have K = 8 classes
    assert pack(ds.offdiag_vals).shape == (2, 8, 64)
    out_e = apply_edge(params, f32(ds.offdiag_vals), f32(ds.diags),
                       f32(ds.globals_))
    out_g = apply_grid(params, f32(pack(ds.offdiag_vals)), f32(ds.diags),
                       f32(ds.globals_))
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_e),
                               rtol=1e-4, atol=1e-5)
    # grid pack roundtrip
    np.testing.assert_array_equal(lay.unpack(lay.pack(ds.offdiag_vals[0])),
                                  ds.offdiag_vals[0])


def test_train_jacobi_stability_regularized(tmp_path):
    """stability_weight > 0 threads full-spectrum probes through the
    step; the run stays finite and the regularized loss still decreases
    (the round-5 cycle-smoother extension, reproduce_jacobi_stable.py)."""
    cfg = TrainJacobiConfig(num_matrices=16, n_mesh=10, epochs=6,
                            batch_size=8, n_train=12, n_val=2, n_test=2,
                            m_probes=6, stability_weight=2.0,
                            stability_margin=1.2, stability_k=6,
                            cache_dir=str(tmp_path), log_every=0)
    params, history = train_jacobi(cfg)
    assert history["train_loss"][-1] < history["train_loss"][0]
    assert np.isfinite(history["test_loss"])
    # the penalty biases the diagonal toward full-spectrum stability:
    # exact damping must sit well below the unregularized ~2.19 blowup
    from gnnla_tpu.training import evaluate_vs_baselines, small_band_dataset
    ds = small_band_dataset(4, n=10, seed=99, cache_dir=str(tmp_path))
    res = evaluate_vs_baselines(params, ds, cfg, max_graphs=4)
    assert res["learned"] < 1.5
