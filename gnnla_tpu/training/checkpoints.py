"""Orbax checkpointing — the TPU-native replacement for Lightning's
ModelCheckpoint (reference DiffCoeffs/train.py:174-177) and the npz result
artifacts (TrainableJacobiDiag/train.py:215-225)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_params_npz(path: str, params: Any) -> None:
    """One-file, git-committable param snapshot (leaf arrays keyed by their
    pytree path). Counterpart of the reference committing trained-model
    artifacts next to the analysis npz (TrainableJacobiDiag/train.py:215)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {jax.tree_util.keystr(kp): np.asarray(leaf)
              for kp, leaf in flat}
    np.savez_compressed(path, **arrays)


def load_params_npz(path: str, template: Any) -> Any:
    """Inverse of save_params_npz; `template` supplies the pytree structure
    (e.g. `model.init(...)` output)."""
    z = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = [np.asarray(z[jax.tree_util.keystr(kp)], np.asarray(t).dtype)
              for kp, t in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


class CheckpointManager:
    """Thin orbax wrapper: save every step, track best by a metric
    (mode='min'), restore latest or best."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=lambda metrics: metrics.get("val_loss", float("inf")),
            best_mode="min",
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, step: int, state: Any, metrics: Optional[dict] = None):
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics or {})
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None):
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()
