"""Reproduce the reference's best diffusion-coefficient model at full scale.

Reference pipeline: /root/reference/pytorch/DiffCoeffs/train.py (grid) with
the best combo from test_best_performing_model.py:51 — 1 external layer,
2 internal layers, 32 hidden, encoder (3,16), no decoder, seed 41, cosine
diffusion, 1000 matrices at mesh size ~[80,100) (data.py:399-406), split
0.7/0.2/0.1, early stopping patience 20; then the held-out test loss, the
small-alpha OOD extrapolation (test_best_performing_model.py:63-88) and
the frequency-study surface (Freq_Study.py:50-108).

TPU-first divergence (documented): the bucket dataset uses a FIXED mesh
resolution n=80 (one vmap bucket) instead of a random size per matrix —
same problem family and coefficient distribution, static shapes for XLA.

Artifacts under artifacts/diffusion/:
  params.npz, history.json, ood.json, freq_study.npz, results.json

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/reproduce_diffusion.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from gnnla_tpu.evaluation.freq_study import freq_study_errors
from gnnla_tpu.evaluation.ood import ood_extrapolation
from gnnla_tpu.models.diffusion_gnn import DiffusionGNN
from gnnla_tpu.training.checkpoints import save_params_npz
from gnnla_tpu.training.datasets import cosine_diffusion_dataset
from gnnla_tpu.training.train_diffusion import TrainDiffusionConfig, train


def main(out_dir=None, epochs=200, num_matrices=1000, n_mesh=80):
    out_dir = out_dir or os.path.join(ROOT, "artifacts", "diffusion")
    os.makedirs(out_dir, exist_ok=True)
    cfg = TrainDiffusionConfig(
        num_matrices=num_matrices, n_mesh=n_mesh, max_freq=3.0,
        n_layers_external=1, n_layers_internal=2, n_hidden=32,
        encoder=(3, 16), decoder=None, epochs=epochs, batch_size=64,
        seed=41, patience=20, cache_dir=os.path.join(ROOT, "data_cache"))

    import threading

    import jax
    import jax.numpy as jnp
    warm = threading.Thread(
        target=lambda: float(jnp.sum(jnp.ones(8))), daemon=True)
    warm.start()

    t0 = time.time()
    ds = cosine_diffusion_dataset(cfg.num_matrices, n=cfg.n_mesh,
                                  max_freq=cfg.max_freq, seed=cfg.seed,
                                  cache_dir=cfg.cache_dir)
    print(f"dataset: {ds.n_graphs} matrices, n_rows={ds.template.n_rows}, "
          f"nnz={ds.template.nnz} ({time.time() - t0:.1f}s)", flush=True)
    warm.join()

    t0 = time.time()
    best_params, history = train(cfg, dataset=ds)
    train_s = time.time() - t0
    history["total_train_s"] = train_s
    print(f"training: {train_s:.1f}s on {jax.devices()[0]}", flush=True)

    save_params_npz(os.path.join(out_dir, "params.npz"), best_params)
    with open(os.path.join(out_dir, "history.json"), "w") as f:
        json.dump(history, f, indent=1)

    model = DiffusionGNN(n_layers_external=cfg.n_layers_external,
                         n_layers_internal=cfg.n_layers_internal,
                         n_hidden=cfg.n_hidden, encoder=cfg.encoder,
                         decoder=cfg.decoder)

    # OOD: constant-diffusion alpha = 10^-i, beta = 0.8
    t0 = time.time()
    ood = ood_extrapolation(best_params, model, n=cfg.n_mesh,
                            cache_dir=cfg.cache_dir)
    with open(os.path.join(out_dir, "ood.json"), "w") as f:
        json.dump({k: np.asarray(v).tolist() for k, v in ood.items()}, f,
                  indent=1)
    print(f"OOD sweep ({time.time() - t0:.1f}s):", flush=True)
    for a, l in zip(ood["alpha"], ood["loss"]):
        print(f"  alpha={a:.1e}  loss={l:.5f}")

    # frequency-study surface
    t0 = time.time()
    freqs, errors = freq_study_errors(best_params, model, n=cfg.n_mesh,
                                      max_freq=4.0, cache_dir=cfg.cache_dir)
    np.savez_compressed(os.path.join(out_dir, "freq_study.npz"),
                        freqs=freqs, errors=errors)
    print(f"freq study ({time.time() - t0:.1f}s): "
          f"{freqs.shape[0]}x{freqs.shape[0]} surface, "
          f"max log10 err {np.log10(errors.max()):.2f}", flush=True)

    results = {
        "config": {k: v for k, v in vars(cfg).items()
                   if isinstance(v, (int, float, str, bool, tuple, list))},
        "test_loss": history.get("test_loss"),
        "best_val_loss": float(np.min(history["val_loss"])),
        "epochs_run": len(history["val_loss"]),
        "ood_loss_by_decade": {f"{a:.0e}": float(l)
                               for a, l in zip(ood["alpha"], ood["loss"])},
        "freq_study_mean_err": float(errors.mean()),
        "freq_study_max_err": float(errors.max()),
        "train_seconds": train_s,
    }
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("\nRESULTS:", json.dumps(results, indent=1))
    return results


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--num-matrices", type=int, default=1000)
    p.add_argument("--n-mesh", type=int, default=80)
    p.add_argument("--out-dir", default=None)
    a = p.parse_args()
    main(a.out_dir, a.epochs, a.num_matrices, a.n_mesh)
