"""Trainable Jacobi diagonal: a vertex-only learned GN block.

Reference semantics: /root/reference/pytorch/TrainableJacobiDiag/
TrainableJacobiGNN.py — a single MetaLayer with only a vertex update:
  * input per vertex: [A_ii, min/mean/sum/max of off-diagonal A_ij] (5 feats,
    the 4-way scatter aggregation at :53-70)
  * MLP 5 -> 50 -> 20 -> 1 with ReLU (:82-86)
  * init: weights U[0, 1), biases 0.01 (:107-111) — reproduced as the
    default for parity; pass `init_scheme="lecun"` for a modern init.

The learned output D_i replaces A_ii in the Jacobi smoother
(x <- x + omega (b - Ax) / D), trained to minimise the high-frequency
damping factor (gnnla_tpu.training.spectral_loss).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from gnnla_tpu.core.block import make_edge_aggregator
from gnnla_tpu.ops.sparse import SparseOperator

Array = jax.Array


def jacobi_diag_features(op_nodiag: SparseOperator, diag: Array) -> Array:
    """[N, 5] vertex features: A_ii + (min, mean, sum, max) of off-diag row.

    Mirrors edge_to_vertex_aggregation order (TrainableJacobiGNN.py:65-70).
    Routes through `make_edge_aggregator`, so fixed patterns run the 4-way
    reduction off one static gather (DenseRowLayout) instead of four
    scatters.
    """
    agg = make_edge_aggregator(op_nodiag, op_nodiag.n_rows)
    aggregated = agg.multi(("min", "mean", "sum", "max"),
                           op_nodiag.vals[:, None])
    return jnp.concatenate([jnp.ravel(diag)[:, None], aggregated], axis=1)


def jacobi_diag_features_banded(diag: Array, band_ov: Array, mask: Array,
                                deg: Array) -> Array:
    """`jacobi_diag_features` on the zero-gather band layout (ops/band.py).

    band_ov [K, N] = off-diagonal values packed by `BandLayout.pack` (host,
    at setup); mask [K, N], deg [N] from the same layout. Numerics are
    identical to the edge path (tests/test_band.py, tests/test_training.py
    parity); this is the production path of `training.train_jacobi` — the
    whole train step touches no edge-order device array.
    """
    from gnnla_tpu.ops.band import band_multi_reduce

    aggregated = band_multi_reduce(("min", "mean", "sum", "max"),
                                   band_ov, mask, deg)
    return jnp.concatenate([jnp.ravel(diag)[:, None], aggregated], axis=1)


def _reference_init_w(key, shape, dtype=jnp.float32):
    """U[0,1) weight init (TrainableJacobiGNN.py:107-111)."""
    return jax.random.uniform(key, shape, dtype, 0.0, 1.0)


class TrainableJacobiMLP(nn.Module):
    """The vertex-update MLP phi^v. Default widths per the reference."""

    widths: Sequence[int] = (50, 20, 1)
    init_scheme: str = "reference"  # "reference" | "lecun"

    @nn.compact
    def __call__(self, features: Array) -> Array:
        if self.init_scheme == "reference":
            kw = dict(kernel_init=_reference_init_w,
                      bias_init=nn.initializers.constant(0.01))
        else:
            kw = {}
        h = features
        for w in self.widths[:-1]:
            h = nn.relu(nn.Dense(w, **kw)(h))
        return nn.Dense(self.widths[-1], **kw)(h)


def predict_diag(params, op_nodiag: SparseOperator, diag: Array,
                 widths=(50, 20, 1), init_scheme="reference") -> Array:
    """Apply the model: learned D as [N] (flattened MLP output)."""
    feats = jacobi_diag_features(op_nodiag, diag)
    model = TrainableJacobiMLP(widths=widths, init_scheme=init_scheme)
    return jnp.ravel(model.apply(params, feats))


def init_params(key, n_features: int = 5, widths=(50, 20, 1),
                init_scheme="reference"):
    model = TrainableJacobiMLP(widths=widths, init_scheme=init_scheme)
    dummy = jnp.zeros((1, n_features), jnp.float32)
    return model.init(key, dummy)
