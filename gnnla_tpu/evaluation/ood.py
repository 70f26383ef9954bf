"""Out-of-distribution extrapolation check for the diffusion GNN.

Reference: /root/reference/pytorch/DiffCoeffs/test_best_performing_model.py:
63-88 — after the held-out test pass, the trained model is evaluated on
constant-diffusion matrices with alpha = 10^-i (shrinking far below the
training distribution) and beta = 0.8, recording the loss per decade.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from gnnla_tpu.models.diffusion_gnn import DiffusionGNN
from gnnla_tpu.training.datasets import (constant_diffusion_dataset,
                                         periodic_rel_coords)
from gnnla_tpu.training.train_diffusion import loss_terms, make_apply


def ood_extrapolation(params, model: DiffusionGNN, *, n: int = 32,
                      n_decades: int = 6,
                      cache_dir=None) -> Dict[str, np.ndarray]:
    """Loss per alpha decade on the small-alpha / large-beta sweep.

    Returns {"alpha": [D], "loss": [D]}; alpha[i] = 10^-i, beta = 0.8.
    """
    ds = constant_diffusion_dataset(n_decades, n=n,
                                    mode="small_alpha_large_beta",
                                    cache_dir=cache_dir)
    rel = periodic_rel_coords(ds.template_nodiag, n)
    apply_fn = make_apply(model, ds, rel)

    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    preds = apply_fn(params, f32(ds.offdiag_vals), f32(ds.diags),
                     f32(ds.globals_))
    losses = np.array([
        float(loss_terms(preds[i], jnp.asarray(ds.targets[i])))
        for i in range(ds.n_graphs)])
    return {"alpha": ds.meta["alpha"], "loss": losses}
