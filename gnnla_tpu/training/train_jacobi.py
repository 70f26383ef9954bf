"""Trainable-Jacobi training driver.

Reference: /root/reference/pytorch/TrainableJacobiDiag/train.py:52-133 —
Adam lr 1e-2 + ReduceLROnPlateau, 62 epochs, batch 100, seed 54681,
800/50/150 split on 1000 small-band matrices, loss = mean Gelfand damping
factor at omega = 2/3; post-training eigen-analysis vs omega = 1, 2/3, opt.

TPU-first redesign:
  * same-pattern dataset bucket -> one jitted, vmapped train step over
    stacked values (no per-graph Python loop as in loss.py:196-201),
  * probes regenerated on host each epoch (seeded), passed as arrays so the
    device step stays pure,
  * optax adam + contrib.reduce_on_plateau, orbax checkpoints,
  * the whole epoch's gradient step count compiles to one program.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from optax.contrib import reduce_on_plateau

from gnnla_tpu.models.trainable_jacobi import (TrainableJacobiMLP,
                                               jacobi_diag_features,
                                               jacobi_diag_features_banded)
from gnnla_tpu.training import spectral_loss
from gnnla_tpu.training.datasets import StackedGraphs, small_band_dataset


@dataclasses.dataclass
class TrainJacobiConfig:
    num_matrices: int = 1000
    n_mesh: int = 38
    h_low: float = 0.0005
    epochs: int = 62
    batch_size: int = 100
    lr: float = 1e-2
    seed: int = 54681
    n_train: int = 800
    n_val: int = 50
    n_test: int = 150
    m_probes: int = 20
    gelfand_k: int = 3
    omega: float = 2.0 / 3.0
    widths: tuple = (50, 20, 1)
    init_scheme: str = "reference"
    # layout the Gelfand-loss SpMMs run on: "dia" (shift-based, any banded
    # pattern) or "stencil" (grid-roll planes — the fastest layout for
    # square-grid buckets; numerics identical, tests assert parity)
    loss_layout: str = "dia"
    # stability regularization (round-5 extension, NOT in the reference):
    # the reference's pure high-frequency Gelfand loss produces diagonals
    # whose full-spectrum damping is ~2.19 > 1 — they diverge standalone
    # AND inside a two-grid cycle (artifacts/jacobi/smoother_twogrid.json
    # measures cycle rho 3.3 vs 0.66 for omega=2/3). stability_weight > 0
    # adds  w * relu(gelfand(random probes) - margin)^2, penalizing
    # amplification anywhere in the spectrum, which makes the learned D a
    # usable cycle smoother (scripts/reproduce_jacobi_stable.py).
    # margin is in units of the k-step Gelfand PROXY, which overestimates
    # rho for non-normal propagators (transient growth): the stable
    # omega=2/3 baseline itself measures ~2.2 at k=3 and ~1.2 at k=10 on
    # random probes. The penalty therefore runs at its own deeper
    # stability_k with a margin calibrated to the baseline's k=10 level.
    stability_weight: float = 0.0
    stability_margin: float = 1.2
    stability_k: int = 10
    cache_dir: Optional[str] = "data_cache"
    checkpoint_dir: Optional[str] = None
    log_every: int = 1
    # data-parallel training: shard the batch over the first n_devices
    # devices (None = single device). The loss is a mean over the batch, so
    # sharded and single-device runs produce identical loss curves.
    n_devices: Optional[int] = None


def feature_stack(ds: StackedGraphs) -> np.ndarray:
    """Host-packed off-diagonal band stack [B, K, N] — the second argument
    of `make_loss_fn`'s loss (the banded feature path; ops/band.py)."""
    _, band_ov = ds.band_stack_nodiag()
    return band_ov


def make_loss_fn(model, ds: StackedGraphs, omega: float, k: int,
                 layout: str = "dia", stability_weight: float = 0.0,
                 stability_margin: float = 1.2, stability_k: int = 10):
    """Batched spectral loss, gather-free end to end.

    The vertex features (A_ii + 4-way off-diagonal aggregation) run on the
    band layout (`jacobi_diag_features_banded` over `feature_stack(ds)`
    [B, K, N] — zero gathers, see ops/band.py), and the Gelfand SpMMs run
    on the DIA or stencil layout below, so the whole train step touches no
    edge-order device array (TPU gathers/scatters cap at ~7e7 elem/s;
    bench.py `agg4_*`).

    layout="dia": the Gelfand damping-factor SpMMs run on the DIA
    (shift-based) layout — gather-free, faster than scatter segment-sums on
    TPU, identical numerics to the COO path (tests assert parity). The
    matrix argument is stacked DIA diagonals [B, K, N] from
    `matrix_stack(ds, "dia")`.

    layout="stencil": grid-roll tap planes [B, K, H, W] (square-grid
    buckets only) — the propagator applies as H x W rolls
    (spectral_loss.damping_factor_gelfand_stencil), the layout behind the
    all-stencil fast paths in ops/pallas_stencil. Same numerics; the
    fastest train step on grid datasets (bench.py `train` stanza records
    both).
    """
    n = ds.template.n_rows
    # banded feature path: mask/deg are tiny per-bucket constants (K x N
    # bools), embedded at trace time like the other bucket layouts
    from gnnla_tpu.ops.band import BandLayout

    blay = BandLayout(ds.template_nodiag)
    f_mask = jnp.asarray(blay.mask)
    f_deg = jnp.asarray(np.maximum(blay.deg, 1), jnp.float32)

    if layout == "dia":
        from gnnla_tpu.ops.dia import DIAOperator

        offsets, _ = ds.dia_stack()
        nnz = ds.template.nnz

        def one_k(mat, d, y, kk):
            op = DIAOperator(diags=mat, offsets=offsets, n=n, nnz=nnz)
            return spectral_loss.damping_factor_gelfand(op, d, omega, y,
                                                        k=kk)
    elif layout == "stencil":
        shifts, h, w = _stencil_meta(ds)

        def one_k(mat, d, y, kk):
            return spectral_loss.damping_factor_gelfand_stencil(
                mat, shifts, d.reshape(h, w), omega,
                y.reshape(h, w, -1), k=kk)
    else:
        raise ValueError(f"unknown loss layout {layout!r}; "
                         "expected 'dia' or 'stencil'")

    def one(mat, d, y):
        return one_k(mat, d, y, k)

    def loss_fn(params, mats, band_ov, diags, probes, probes_full=None):
        def one_feats(bo, d):
            feats = jacobi_diag_features_banded(d, bo, f_mask, f_deg)
            return jnp.ravel(model.apply(params, feats))
        dvals = jax.vmap(one_feats)(band_ov, diags)
        loss = jnp.mean(jax.vmap(one)(mats, dvals, probes))
        if probes_full is not None and stability_weight:
            # full-spectrum Gelfand factor on unfiltered random probes at
            # the deeper stability_k (the k-th-root proxy overestimates
            # rho for non-normal T; see TrainJacobiConfig): above the
            # calibrated margin means the sweep amplifies — penalize
            gfull = jax.vmap(
                lambda m, dv, p: one_k(m, dv, p, stability_k))(
                    mats, dvals, probes_full)
            loss = loss + stability_weight * jnp.mean(
                jax.nn.relu(gfull - stability_margin) ** 2)
        return loss

    return loss_fn


def _stencil_meta(ds: StackedGraphs):
    """(shifts, h, w) of a grid bucket's shared pattern.

    The grid shape comes from the vertex coordinates when present (tensor-
    product mesh, row-major numbering — verified, not assumed), else from
    sqrt(n). Non-grid buckets fail loudly: either the shape check here or
    the shift-class bound in `stencil_classes` raises."""
    import math

    n = ds.template.n_rows
    h = w = None
    if ds.coords is not None:
        xy = np.asarray(ds.coords[0])
        ux, uy = np.unique(xy[:, 0]), np.unique(xy[:, 1])
        if len(ux) * len(uy) == n:
            ix = np.searchsorted(ux, xy[:, 0])
            iy = np.searchsorted(uy, xy[:, 1])
            if np.array_equal(iy * len(ux) + ix, np.arange(n)):
                h, w = len(uy), len(ux)
    if h is None:
        h = w = math.isqrt(n)
        if h * h != n:
            raise ValueError(
                f"loss_layout='stencil' needs a tensor-product grid "
                f"bucket; could not infer a grid shape for n_rows={n}")
    from gnnla_tpu.ops.pallas_stencil import stencil_classes

    rows, cols, _ = ds.template.host_coo()
    shifts, _ = stencil_classes(rows, cols, h, w)
    return shifts, h, w


def matrix_stack(ds: StackedGraphs, layout: str):
    """Host-precomputed stacked matrix data for `make_loss_fn`'s first
    batch argument: DIA diagonals [B, K, N] or stencil planes
    [B, K, H, W]."""
    if layout == "dia":
        _, stack = ds.dia_stack()
        return stack
    shifts, h, w = _stencil_meta(ds)
    from gnnla_tpu.ops.pallas_stencil import stencil_classes

    rows, cols, _ = ds.template.host_coo()
    _, k_idx = stencil_classes(rows, cols, h, w)
    b = ds.vals.shape[0]
    planes = np.zeros((b, len(shifts) * h * w), np.float32)
    flat = (k_idx * (h * w) + rows).astype(np.int64)
    np.add.at(planes, (np.arange(b)[:, None], flat[None, :]), ds.vals)
    return planes.reshape(b, len(shifts), h, w)


def _draw_probes(ds: StackedGraphs, idx, m, rng):
    n_v = ds.template.n_rows
    return np.stack([
        spectral_loss.high_freq_probes(
            n_v, m, ds.coords[i] if ds.coords is not None else None, rng)
        for i in idx])


def train(config: TrainJacobiConfig = TrainJacobiConfig(),
          dataset: Optional[StackedGraphs] = None, mesh=None,
          init_params=None):
    """Returns (params, history dict).

    `mesh` (or cfg.n_devices) turns on data-parallel training: batch
    arguments are sharded over the mesh's 'data' axis, parameters and
    optimizer state are replicated, and XLA inserts the gradient psum —
    the jitted step is the same pure function either way (the pattern
    validated by __graft_entry__.dryrun_multichip).

    `init_params` warm-starts from an existing parameter tree (used by
    the two-phase stability fine-tune, scripts/reproduce_jacobi_stable.py:
    phase 1 trains the reference loss, phase 2 pulls the diagonal back
    into the stable set with the penalty active).
    """
    cfg = config
    if mesh is None and cfg.n_devices:
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()[:cfg.n_devices]), ("data",))
    rng = np.random.default_rng(cfg.seed)
    if dataset is None:
        dataset = small_band_dataset(cfg.num_matrices, n=cfg.n_mesh,
                                     h_low=cfg.h_low, seed=cfg.seed,
                                     cache_dir=cfg.cache_dir)

    perm = rng.permutation(dataset.n_graphs)
    tr = dataset.select(perm[:cfg.n_train])
    va = dataset.select(perm[cfg.n_train:cfg.n_train + cfg.n_val])
    te = dataset.select(perm[cfg.n_train + cfg.n_val:
                             cfg.n_train + cfg.n_val + cfg.n_test])

    model = TrainableJacobiMLP(widths=cfg.widths, init_scheme=cfg.init_scheme)
    key = jax.random.PRNGKey(cfg.seed)
    params = model.init(key, jnp.zeros((1, 5), jnp.float32))
    if init_params is not None:
        params = init_params

    tx = optax.chain(optax.adam(cfg.lr), reduce_on_plateau(factor=0.1,
                                                           patience=10))
    opt_state = tx.init(params)

    loss_fn = make_loss_fn(model, dataset, cfg.omega, cfg.gelfand_k,
                           layout=cfg.loss_layout,
                           stability_weight=cfg.stability_weight,
                           stability_margin=cfg.stability_margin,
                           stability_k=cfg.stability_k)
    stab = cfg.stability_weight > 0
    tr_mat = matrix_stack(tr, cfg.loss_layout)
    va_mat = matrix_stack(va, cfg.loss_layout)
    te_mat = matrix_stack(te, cfg.loss_layout)
    # off-diagonal band stacks for the zero-gather feature path
    tr_ov = feature_stack(tr)
    va_ov = feature_stack(va)
    te_ov = feature_stack(te)

    if stab:
        def train_step(params, opt_state, mats, band_ov, diags,
                       probes, probes_full, plateau_value):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, mats, band_ov, diags, probes, probes_full)
            updates, opt_state = tx.update(grads, opt_state, params,
                                           value=plateau_value)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss
    else:
        def train_step(params, opt_state, mats, band_ov, diags,
                       probes, plateau_value):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, mats, band_ov, diags, probes)
            updates, opt_state = tx.update(grads, opt_state, params,
                                           value=plateau_value)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        ndev = mesh.devices.size
        if cfg.batch_size % ndev:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by the mesh's "
                f"{ndev} devices")
        s_b = NamedSharding(mesh, P("data"))
        s_r = NamedSharding(mesh, P())
        sh_in = ((s_r, s_r, s_b, s_b, s_b, s_b, s_b, s_r) if stab
                 else (s_r, s_r, s_b, s_b, s_b, s_b, s_r))
        train_step = jax.jit(train_step, in_shardings=sh_in,
                             out_shardings=(s_r, s_r, s_r))
        # eval batches (val/test) need not divide the mesh: replicate them
        eval_loss = jax.jit(loss_fn,
                            in_shardings=(s_r, s_r, s_r, s_r, s_r),
                            out_shardings=s_r)
    else:
        train_step = jax.jit(train_step)
        eval_loss = jax.jit(loss_fn)

    def as_f32(a):
        return jnp.asarray(a, jnp.float32)

    history = {"train_loss": [], "val_loss": [], "epoch_time_s": []}
    ckpt = None
    if cfg.checkpoint_dir:
        from gnnla_tpu.training.checkpoints import CheckpointManager
        ckpt = CheckpointManager(cfg.checkpoint_dir)

    val_probes = _draw_probes(va, range(va.n_graphs), cfg.m_probes, rng)
    val_loss = jnp.inf

    for epoch in range(cfg.epochs):
        t0 = time.time()
        order = rng.permutation(tr.n_graphs)
        epoch_loss, n_seen = 0.0, 0
        for start in range(0, tr.n_graphs, cfg.batch_size):
            idx = order[start:start + cfg.batch_size]
            if len(idx) < cfg.batch_size:
                break  # keep shapes static; drop ragged tail
            probes = _draw_probes(tr, idx, cfg.m_probes, rng)
            args = (params, opt_state,
                    as_f32(tr_mat[idx]), as_f32(tr_ov[idx]),
                    as_f32(tr.diags[idx]), as_f32(probes))
            if stab:
                n_v = dataset.template.n_rows
                pf = rng.standard_normal((len(idx), n_v, cfg.m_probes))
                args = args + (as_f32(pf),)
            params, opt_state, loss = train_step(
                *args, jnp.asarray(val_loss, jnp.float32))
            epoch_loss += float(loss) * len(idx)
            n_seen += len(idx)

        val_loss = float(eval_loss(params, as_f32(va_mat),
                                   as_f32(va_ov),
                                   as_f32(va.diags), as_f32(val_probes)))
        dt = time.time() - t0
        history["train_loss"].append(epoch_loss / max(n_seen, 1))
        history["val_loss"].append(val_loss)
        history["epoch_time_s"].append(dt)
        if cfg.log_every and (epoch == 0 or (epoch + 1) % cfg.log_every == 0):
            print(f"epoch {epoch + 1}: train {history['train_loss'][-1]:.5f} "
                  f"val {val_loss:.5f} ({dt:.1f}s)")
        if ckpt:
            ckpt.save(epoch, params, metrics={"val_loss": val_loss})

    # held-out test loss
    te_probes = _draw_probes(te, range(te.n_graphs), cfg.m_probes, rng)
    test_loss = float(eval_loss(params, as_f32(te_mat),
                                as_f32(te_ov), as_f32(te.diags),
                                as_f32(te_probes)))
    history["test_loss"] = test_loss
    print(f"test loss: {test_loss:.5f}")
    if ckpt:
        ckpt.close()
    return params, history


def evaluate_vs_baselines(params, dataset: StackedGraphs,
                          cfg: TrainJacobiConfig,
                          max_graphs: Optional[int] = None):
    """Exact damping factors: learned D vs omega=1, 2/3, optimal
    (reference train.py:126-133 comparison; exact dense path).

    Defaults to the WHOLE split — the reference's headline comparison runs
    over all 150 test matrices (train.py:164-213); pass max_graphs for a
    cheap CI subset."""
    model = TrainableJacobiMLP(widths=cfg.widths, init_scheme=cfg.init_scheme)
    out = {"learned": [], "w1": [], "w23": [], "opt": []}
    if max_graphs is None:
        max_graphs = dataset.n_graphs
    for i in range(min(dataset.n_graphs, max_graphs)):
        op = dataset.template.with_values(
            jnp.asarray(dataset.vals[i], jnp.float32))
        diag = jnp.asarray(dataset.diags[i], jnp.float32)
        feats = jacobi_diag_features(
            dataset.template_nodiag.with_values(
                jnp.asarray(dataset.offdiag_vals[i], jnp.float32)), diag)
        dlearn = jnp.ravel(model.apply(params, feats))
        # reference evaluates learned D at omega = 2/3 (train.py:203-205)
        out["learned"].append(float(spectral_loss.damping_factor_exact(
            op, dlearn, 2.0 / 3.0)))
        # one spectrum of D^-1 A serves omega = 1, 2/3, and opt
        lam = spectral_loss.dinv_a_spectrum(op, diag)
        out["w1"].append(float(np.max(np.abs(1.0 - lam))))
        out["w23"].append(float(np.max(np.abs(1.0 - (2.0 / 3.0) * lam))))
        w_opt = 2.0 / (np.max(np.abs(lam)) + np.min(np.abs(lam)))
        out["opt"].append(float(np.max(np.abs(1.0 - w_opt * lam))))
    return {k: float(np.mean(v)) for k, v in out.items()}
