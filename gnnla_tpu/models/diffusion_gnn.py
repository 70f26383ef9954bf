"""Diffusion-coefficient recovery GNN: learned encode-process-decode stack.

Reference semantics: /root/reference/pytorch/DiffCoeffs/LearnDiffusionCoeffs.py
— a full Battaglia GN block with learned MLP updates and 4-way
(min, mean, sum, max) aggregations for e->v, e->g and v->g:

  * inputs: v = [A_ii] (1), e = [A_ij, rel_x, rel_y] (3), g = [h] (1)
    (data.py:102-127; edge rel-coords wrap periodically)
  * optional encoder: independent MLPs lift v/e/g to n_hidden (:152-160)
  * n_layers_external full GN blocks; each update is an
    n_layers_internal-deep MLP with width n_hidden (:44-154):
      edge MLP in  = [v_i, v_j, e, g]               (:181-200)
      vertex MLP in = [v, 4-agg(e'), g]             (:220-241)
      global MLP in = [g, 4-agg_e(e'), 4-agg_v(v')] (:261-288)
    (single-external-layer nets have no global update, :140-152)
  * optional decoder: vertex-only MLP to 2 outputs (alpha_i, beta_i)
  * forward ends with LeakyReLU (:156-160)

Implemented as one flax module whose update functions plug into the shared
GNBlock engine; works on single graphs or padded/masked GraphBatch batches.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gnnla_tpu.core import GNBlock, GraphBatch, GraphState
from gnnla_tpu.ops.band import BandPattern, EllPattern, GridPattern
from gnnla_tpu.ops.sparse import SparseOperator

Array = jax.Array
_AGGS = ("min", "mean", "sum", "max")


class MLPStack(nn.Module):
    """n_layers-deep ReLU MLP; one Linear when n_layers == 1 (reference
    getInitializedLinear path, LearnDiffusionCoeffs.py:163-180)."""

    n_layers: int
    n_hidden: int
    n_out: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.n_layers == 1:
            return nn.Dense(self.n_out)(x)
        h = nn.relu(nn.Dense(self.n_hidden)(x))
        for _ in range(self.n_layers - 2):
            h = nn.relu(nn.Dense(self.n_hidden)(h))
        return nn.Dense(self.n_out)(h)


class DiffusionGNN(nn.Module):
    """Encode-process-decode stack; returns per-vertex [alpha_i, beta_i]."""

    n_layers_external: int
    n_layers_internal: int
    n_hidden: int = 32
    encoder: Optional[Tuple[int, int]] = None  # (n_layers, enc_hidden)
    decoder: Optional[Tuple[int, int]] = None
    n_out_vertex: int = 2

    def _gn_layer(self, tag: str, internal: int, e_out: int, v_out: int,
                  g_out: int, with_global: bool) -> GNBlock:
        edge_mlp = MLPStack(internal, self.n_hidden, e_out,
                            name=f"{tag}_edge")
        vertex_mlp = MLPStack(internal, self.n_hidden, v_out,
                              name=f"{tag}_vertex")
        global_mlp = (MLPStack(internal, self.n_hidden, g_out,
                               name=f"{tag}_global") if with_global else None)

        def edge_fn(v_i, v_j, e, g):
            g_b = jnp.broadcast_to(g, (e.shape[0], g.shape[-1])) \
                if g.ndim == 1 else g
            return edge_mlp(jnp.concatenate([v_i, v_j, e, g_b], axis=1))

        def vertex_fn(v, e, agg, g):
            ebar = agg.multi(_AGGS, e)
            g_b = jnp.broadcast_to(g, (v.shape[0], g.shape[-1])) \
                if g.ndim == 1 else g
            return vertex_mlp(jnp.concatenate([v, ebar, g_b], axis=1))

        def global_fn(v, e, g, vagg, eagg):
            ebar = eagg.multi(_AGGS, e)
            vbar = vagg.multi(_AGGS, v)
            g2 = g if g.ndim == 2 else g[None, :]
            ebar2 = ebar if ebar.ndim == 2 else ebar[None, :]
            vbar2 = vbar if vbar.ndim == 2 else vbar[None, :]
            out = global_mlp(jnp.concatenate([g2, ebar2, vbar2], axis=1))
            return out if g.ndim == 2 else out[0]

        return GNBlock(edge_fn=edge_fn, vertex_fn=vertex_fn,
                       global_fn=global_fn if with_global else None)

    def _band_gn_apply(self, tag: str, internal: int, e_out: int,
                       v_out: int, g_out: int, with_global: bool,
                       pat, v: Array, e: Array,
                       g: Array) -> Tuple[Array, Array, Array]:
        """One GN layer on a band-family layout (zero gathers; ops/band.py):
        v_i is a broadcast, v_j a shift/roll, e->v the (masked) band
        reduction, e->g/v->g whole-array reductions. `pat` is a
        `BandPattern` (general banded, masked), `GridPattern` (uniform
        periodic grid, mask-free rolls), or `EllPattern` (unstructured,
        slot-per-neighbor). Same module names as `_gn_layer`,
        so one parameter tree serves every execution path (parity-tested
        in tests/test_training.py)."""
        edge_mlp = MLPStack(internal, self.n_hidden, e_out,
                            name=f"{tag}_edge")
        vertex_mlp = MLPStack(internal, self.n_hidden, v_out,
                              name=f"{tag}_vertex")
        global_mlp = (MLPStack(internal, self.n_hidden, g_out,
                               name=f"{tag}_global") if with_global else None)

        v_i = pat.broadcast(v)                 # dst (row) values
        v_j = pat.neighbor(v)                  # src (col) values
        g_e = jnp.broadcast_to(g, e.shape[:2] + (g.shape[-1],))
        e = edge_mlp(jnp.concatenate([v_i, v_j, e, g_e], axis=-1))
        e = pat.mask_pads(e)                   # keep pad slots 0

        ebar = pat.multi(_AGGS, e)
        g_v = jnp.broadcast_to(g, (v.shape[0], g.shape[-1]))
        v = vertex_mlp(jnp.concatenate([v, ebar, g_v], axis=-1))

        if global_mlp is not None:
            ebar_g = pat.global_multi(_AGGS, e)
            vbar_g = jnp.concatenate(
                [jnp.min(v, axis=0), jnp.mean(v, axis=0),
                 jnp.sum(v, axis=0), jnp.max(v, axis=0)], axis=-1)
            g = global_mlp(jnp.concatenate([g[None], ebar_g[None],
                                            vbar_g[None]], axis=1))[0]
        return v, e, g

    @nn.compact
    def __call__(self, op, state: GraphState,
                 batch: Optional[GraphBatch] = None) -> Array:
        """op: `SparseOperator` (edge-order path via the GNBlock engine) or
        `ops.band.BandPattern` / `GridPattern` / `EllPattern` (band-family
        layout paths — state.edges must then be [K, N, Fe]). All paths
        share one parameter tree."""
        banded = isinstance(op, (BandPattern, GridPattern, EllPattern))
        v_out_final = self.n_out_vertex
        if self.decoder is not None:
            v_out_final = self.n_hidden

        # ---- encoder: independent lifts ---------------------------------
        if self.encoder is not None:
            enc_l, enc_h = self.encoder
            ve = MLPStack(enc_l, enc_h, self.n_hidden, name="enc_vertex")
            ee = MLPStack(enc_l, enc_h, self.n_hidden, name="enc_edge")
            ge = MLPStack(enc_l, enc_h, self.n_hidden, name="enc_global")
            edges_enc = ee(state.edges)
            if banded:  # re-zero pad slots (the lift has a bias)
                edges_enc = op.mask_pads(edges_enc)
            state = state.replace(vertices=ve(state.vertices),
                                  edges=edges_enc,
                                  globals_=ge(state.globals_))

        # ---- core GN blocks ----------------------------------------------
        n_ext = self.n_layers_external
        for li in range(n_ext):
            last = li == n_ext - 1
            only = n_ext == 1
            v_out = v_out_final if last else self.n_hidden
            if banded:
                v, e, g = self._band_gn_apply(
                    f"gn{li}", self.n_layers_internal,
                    e_out=self.n_hidden, v_out=v_out, g_out=self.n_hidden,
                    with_global=not only, pat=op, v=state.vertices,
                    e=state.edges, g=state.globals_)
                state = state.replace(vertices=v, edges=e, globals_=g)
            else:
                block = self._gn_layer(f"gn{li}", self.n_layers_internal,
                                       e_out=self.n_hidden, v_out=v_out,
                                       g_out=self.n_hidden,
                                       with_global=not only)
                state = block(op, state, batch)

        # ---- decoder ------------------------------------------------------
        if self.decoder is not None:
            dec_l, dec_h = self.decoder
            dec = MLPStack(dec_l, dec_h, self.n_out_vertex, name="dec_vertex")
            state = state.replace(vertices=dec(state.vertices))

        return nn.leaky_relu(state.vertices)


def init_diffusion_gnn(key, model: DiffusionGNN, op: SparseOperator,
                       state: GraphState,
                       batch: Optional[GraphBatch] = None):
    return model.init(key, op, state, batch)
