"""Frequency-study error surface for the diffusion-coefficient GNN.

Reference: /root/reference/pytorch/DiffCoeffs/Freq_Study.py:50-108 — run the
trained model over the FrequencyStudyDiffusionDataset grid (one matrix per
(theta_x, theta_y)), compute the training loss per sample, arrange as an
[F, F] surface over the frequency grid (plotted as log10 MSE).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from gnnla_tpu.models.diffusion_gnn import DiffusionGNN
from gnnla_tpu.training.datasets import (frequency_study_dataset,
                                         periodic_rel_coords)
from gnnla_tpu.training.train_diffusion import loss_terms, make_apply


def freq_study_errors(params, model: DiffusionGNN, *, n: int = 32,
                      max_freq: float = 4.0,
                      cache_dir=None) -> Tuple[np.ndarray, np.ndarray]:
    """(freqs [F], errors [F, F]) — errors[ix, iy] is the loss at
    theta_x = freqs[ix], theta_y = freqs[iy]."""
    ds = frequency_study_dataset(n=n, max_freq=max_freq, cache_dir=cache_dir)
    rel = periodic_rel_coords(ds.template_nodiag, n)
    apply_fn = make_apply(model, ds, rel)

    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    preds = apply_fn(params, f32(ds.offdiag_vals), f32(ds.diags),
                     f32(ds.globals_))

    freqs = np.unique(ds.meta["thetas"][:, 0])
    nf = freqs.shape[0]
    errors = np.zeros((nf, nf))
    for i in range(ds.n_graphs):
        tx, ty = ds.meta["thetas"][i, 0], ds.meta["thetas"][i, 1]
        ix = int(np.searchsorted(freqs, tx))
        iy = int(np.searchsorted(freqs, ty))
        errors[ix, iy] = float(loss_terms(preds[i],
                                          jnp.asarray(ds.targets[i])))
    return freqs, errors
