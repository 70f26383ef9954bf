"""Diffusion-coefficient training driver.

Reference: /root/reference/pytorch/DiffCoeffs/train.py:53-186 — a Lightning
module around LearnDiffusionGNN with loss = MSE + max(relu(-pred)) positivity
penalty (:67), Adam lr 1e-2 + plateau scheduler, early stopping patience 20,
checkpoint every epoch, hyperparameter grid (encoder/decoder/layers/hidden).

TPU-first redesign: the Lightning runtime becomes a plain jitted train step;
graphs are a same-pattern stacked bucket vmapped over (datasets.py), so one
XLA program covers the whole batch; orbax replaces ModelCheckpoint.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from optax.contrib import reduce_on_plateau

from gnnla_tpu.core import GraphState
from gnnla_tpu.models.diffusion_gnn import DiffusionGNN
from gnnla_tpu.training.datasets import (StackedGraphs,
                                         cosine_diffusion_dataset,
                                         periodic_rel_coords)


@dataclasses.dataclass
class TrainDiffusionConfig:
    num_matrices: int = 1000
    n_mesh: int = 32            # reference trains at 80-100; configurable
    max_freq: float = 3.0
    convection: Optional[Tuple[float, float]] = None  # e.g. (0.1, 0.0)
    n_layers_external: int = 1
    n_layers_internal: int = 3
    n_hidden: int = 64
    encoder: Optional[Tuple[int, int]] = None   # e.g. (3, 16)
    decoder: Optional[Tuple[int, int]] = None
    epochs: int = 200
    batch_size: int = 64
    lr: float = 1e-2
    seed: int = 41
    patience: int = 20          # early stopping (reference :177)
    split: Tuple[float, float, float] = (0.7, 0.2, 0.1)
    cache_dir: Optional[str] = "data_cache"
    checkpoint_dir: Optional[str] = None
    log_every: int = 1
    # data-parallel training: shard the batch over the first n_devices
    # devices (None = single device). The reference gets this from
    # Lightning's accelerator='auto', devices='auto'
    # (DiffCoeffs/train.py:181-182); here the same jitted step runs under
    # a 'data'-axis mesh with replicated params — XLA inserts the
    # gradient psum, so loss curves match the single-device run.
    n_devices: Optional[int] = None


def edge_features(ds: StackedGraphs, n_mesh: int) -> np.ndarray:
    """[E, 2] periodic relative coordinates shared by the bucket."""
    return periodic_rel_coords(ds.template_nodiag, n_mesh)


def make_apply(model: DiffusionGNN, ds: StackedGraphs, rel: np.ndarray):
    """Batched forward: (params, offdiag_vals [B,E], diags [B,N], g [B,1])
    -> [B, N, 2] predictions (edge-order path; kept for evaluation tools
    that hold edge-order data — parameters are interchangeable with the
    band path below)."""
    template_nd = ds.template_nodiag
    # prebuild the dense-row aggregation layout once; with_values carries
    # it into every traced copy (GNBlock's make_edge_aggregator fast path)
    template_nd.row_layout()
    rel_j = jnp.asarray(rel, jnp.float32)

    def one(params, ov, d, g):
        e = jnp.concatenate([ov[:, None], rel_j], axis=1)
        state = GraphState(vertices=d[:, None], edges=e, globals_=g)
        return model.apply(params, template_nd.with_values(ov), state)

    return jax.vmap(one, in_axes=(None, 0, 0, 0))


def make_apply_banded(model: DiffusionGNN, ds: StackedGraphs,
                      rel: np.ndarray, grid_shape=None):
    """(apply, pack) on the zero-gather band layout (ops/band.py) — the
    production train path: TPU gathers cap at ~7e7 elem/s, so the GN
    block's x[rows]/x[cols] gathers and 4-way scatter aggregations are
    replaced by broadcasts, shifts/rolls, and band reductions.

    With `grid_shape=(h, w)` and a uniform periodic pattern (every
    diffusion FEM bucket), the layout is the stencil-class `GridPattern`:
    K = 8 mask-free classes with 2-D-roll neighbor reads — ~2.5x less
    edge storage than the general `BandLayout`, whose periodic wraps
    explode into ~20 offsets. Non-grid patterns route through
    `ops.band.choose_edge_layout` (band for banded, ELL slot layout for
    unstructured; a requested-but-unusable grid logs a warning).

    apply(params, ov_bands [B, K, N], diags [B, N], g [B, 1]) -> [B, N, 2];
    pack(offdiag_vals [B, E]) -> [B, K, N] (host numpy, done once per
    split). Same parameter tree as `make_apply` (tests assert forward
    parity)."""
    from gnnla_tpu.ops.band import choose_edge_layout

    lay, pat, _kind = choose_edge_layout(ds.template_nodiag,
                                         grid_shape=grid_shape)
    # static rel-coord planes in band order: [E, 2] -> [K, N, 2]
    rel_b = jnp.asarray(
        np.moveaxis(lay.pack(np.ascontiguousarray(np.asarray(rel).T)), 0, -1),
        jnp.float32)

    def one(params, ovb, d, g):
        e = jnp.concatenate([ovb[:, :, None], rel_b], axis=-1)
        state = GraphState(vertices=d[:, None], edges=e, globals_=g)
        return model.apply(params, pat, state)

    return jax.vmap(one, in_axes=(None, 0, 0, 0)), lay.pack


def loss_terms(pred, targets):
    """MSE + positivity penalty max(relu(-pred)) (reference train.py:67)."""
    mse = jnp.mean((pred - targets) ** 2)
    penalty = jnp.max(jnp.maximum(-pred, 0.0))
    return mse + penalty


def train(config: TrainDiffusionConfig = TrainDiffusionConfig(),
          dataset: Optional[StackedGraphs] = None, mesh=None):
    """Returns (best_params, history dict).

    `mesh` (or cfg.n_devices) turns on data-parallel training: batch
    arguments are sharded over the mesh's 'data' axis, parameters and
    optimizer state replicated (same pattern as train_jacobi.train)."""
    cfg = config
    rng = np.random.default_rng(cfg.seed)
    if dataset is None:
        dataset = cosine_diffusion_dataset(cfg.num_matrices, n=cfg.n_mesh,
                                           max_freq=cfg.max_freq,
                                           seed=cfg.seed,
                                           convection=cfg.convection,
                                           cache_dir=cfg.cache_dir)
    if mesh is None and cfg.n_devices:
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()[:cfg.n_devices]), ("data",))
    B = dataset.n_graphs
    n_tr = int(B * cfg.split[0])
    n_va = int(B * cfg.split[1])
    perm = rng.permutation(B)
    tr = dataset.select(perm[:n_tr])
    va = dataset.select(perm[n_tr:n_tr + n_va])
    te = dataset.select(perm[n_tr + n_va:])

    rel = edge_features(dataset, cfg.n_mesh)
    model = DiffusionGNN(n_layers_external=cfg.n_layers_external,
                         n_layers_internal=cfg.n_layers_internal,
                         n_hidden=cfg.n_hidden, encoder=cfg.encoder,
                         decoder=cfg.decoder)

    # init on one sample
    e0 = jnp.concatenate([jnp.asarray(tr.offdiag_vals[0], jnp.float32)[:, None],
                          jnp.asarray(rel, jnp.float32)], axis=1)
    s0 = GraphState(vertices=jnp.asarray(tr.diags[0], jnp.float32)[:, None],
                    edges=e0,
                    globals_=jnp.asarray(tr.globals_[0], jnp.float32))
    params = model.init(jax.random.PRNGKey(cfg.seed),
                        dataset.template_nodiag, s0)

    apply_batch, band_pack = make_apply_banded(
        model, dataset, rel, grid_shape=(cfg.n_mesh, cfg.n_mesh))
    tr_ovb = band_pack(tr.offdiag_vals)
    va_ovb = band_pack(va.offdiag_vals)
    te_ovb = band_pack(te.offdiag_vals) if te.n_graphs else None
    tx = optax.chain(optax.adam(cfg.lr),
                     reduce_on_plateau(factor=0.1, patience=10))
    opt_state = tx.init(params)

    def loss_fn(params, ov, d, g, y):
        pred = apply_batch(params, ov, d, g)
        return loss_terms(pred, y)

    def train_step(params, opt_state, ov, d, g, y, plateau_value):
        loss, grads = jax.value_and_grad(loss_fn)(params, ov, d, g, y)
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
        train_step = jax.jit(
            train_step,
            in_shardings=(s_r, s_r, s_b, s_b, s_b, s_b, s_r),
            out_shardings=(s_r, s_r, s_r))
        # val/test batches need not divide the mesh: replicate them
        eval_loss = jax.jit(loss_fn,
                            in_shardings=(s_r, s_r, s_r, s_r, s_r),
                            out_shardings=s_r)
    else:
        train_step = jax.jit(train_step)
        eval_loss = jax.jit(loss_fn)

    def f32(a):
        return jnp.asarray(a, jnp.float32)

    ckpt = None
    if cfg.checkpoint_dir:
        from gnnla_tpu.training.checkpoints import CheckpointManager
        ckpt = CheckpointManager(cfg.checkpoint_dir)

    history = {"train_loss": [], "val_loss": [], "epoch_time_s": []}
    best_val, best_params, since_best = np.inf, params, 0
    val_loss = jnp.inf

    for epoch in range(cfg.epochs):
        t0 = time.time()
        order = rng.permutation(tr.n_graphs)
        epoch_loss, n_seen = 0.0, 0
        for start in range(0, tr.n_graphs, cfg.batch_size):
            idx = order[start:start + cfg.batch_size]
            if len(idx) < cfg.batch_size and n_seen > 0:
                break  # static shapes: drop ragged tail
            params, opt_state, loss = train_step(
                params, opt_state, f32(tr_ovb[idx]),
                f32(tr.diags[idx]), f32(tr.globals_[idx]),
                f32(tr.targets[idx]), jnp.asarray(val_loss, jnp.float32))
            epoch_loss += float(loss) * len(idx)
            n_seen += len(idx)

        val_loss = float(eval_loss(params, f32(va_ovb),
                                   f32(va.diags), f32(va.globals_),
                                   f32(va.targets)))
        history["train_loss"].append(epoch_loss / max(n_seen, 1))
        history["val_loss"].append(val_loss)
        history["epoch_time_s"].append(time.time() - t0)
        if cfg.log_every and (epoch == 0 or (epoch + 1) % cfg.log_every == 0):
            print(f"epoch {epoch + 1}: train {history['train_loss'][-1]:.5f} "
                  f"val {val_loss:.5f}")
        if ckpt:
            ckpt.save(epoch, params, metrics={"val_loss": val_loss})

        if val_loss < best_val - 1e-12:
            best_val, best_params, since_best = val_loss, params, 0
        else:
            since_best += 1
            if since_best >= cfg.patience:
                print(f"early stopping at epoch {epoch + 1}")
                break

    test_loss = None
    if te.n_graphs:
        test_loss = float(eval_loss(best_params, f32(te_ovb),
                                    f32(te.diags), f32(te.globals_),
                                    f32(te.targets)))
        print(f"test loss: {test_loss:.5f}")
    history["test_loss"] = test_loss
    if ckpt:
        ckpt.close()
    return best_params, history
