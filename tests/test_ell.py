"""ELL slot-layout parity vs the segment reducers (unstructured graphs).

Contract: `ell_multi_reduce` on host-packed [K, N] slot data reproduces
`multi_segment_reduce` on the same edges (torch_scatter semantics: empty
rows 0, mean by max(deg, 1)); `EllPattern` reproduces the edge-order GN
aggregation surface; `choose_edge_layout` routes grid / banded /
unstructured patterns to the right layout. VERDICT r4 missing #1.
"""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from gnnla_tpu.ops.band import (BandPattern, EllLayout, EllPattern,
                                GridPattern, choose_edge_layout,
                                ell_global_multi, ell_multi_reduce)
from gnnla_tpu.ops.segment import multi_segment_reduce
from gnnla_tpu.ops.sparse import SparseOperator

AGGS = ("min", "mean", "sum", "max")


def _random_graph(n, avg_deg, seed, with_empty_rows=True):
    """Unstructured random digraph, variable degree, some empty rows."""
    rng = np.random.default_rng(seed)
    deg = rng.poisson(avg_deg, n)
    if with_empty_rows:
        deg[rng.random(n) < 0.1] = 0
    rows = np.repeat(np.arange(n), deg)
    cols = rng.integers(0, n, rows.size)
    # dedupe (coalesced-operator invariant)
    key = rows.astype(np.int64) * n + cols
    _, keep = np.unique(key, return_index=True)
    rows, cols = rows[keep], cols[keep]
    vals = rng.standard_normal(rows.size)
    return rows, cols, vals


@pytest.mark.parametrize("seed,avg_deg", [(0, 6), (1, 3), (2, 12)])
def test_ell_multi_reduce_matches_segment(seed, avg_deg):
    n = 151
    rows, cols, vals = _random_graph(n, avg_deg, seed)
    lay = EllLayout(rows, cols, n)

    slots = jnp.asarray(lay.pack(vals), jnp.float32)
    got = ell_multi_reduce(AGGS, slots, jnp.asarray(lay.deg))
    want = multi_segment_reduce(AGGS, jnp.asarray(vals, jnp.float32)[:, None],
                                jnp.asarray(rows), n, is_sorted=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_ell_pack_unpack_roundtrip_and_multifeature():
    n = 64
    rows, cols, vals = _random_graph(n, 5, 3)
    lay = EllLayout(rows, cols, n)
    np.testing.assert_array_equal(lay.unpack(lay.pack(vals)), vals)

    # [F, E] batch packing -> [F, K, N]
    vals2 = np.stack([vals, 2 * vals])
    packed = lay.pack(vals2)
    assert packed.shape == (2, lay.k, n)
    np.testing.assert_array_equal(lay.unpack(packed), vals2)

    # multifeature reduce: [K, N, F]
    e = jnp.asarray(np.moveaxis(packed, 0, -1), jnp.float32)
    got = ell_multi_reduce(AGGS, e, jnp.asarray(lay.deg))
    want = multi_segment_reduce(
        AGGS, jnp.asarray(vals2.T, jnp.float32), jnp.asarray(rows), n,
        is_sorted=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_ell_global_multi_matches_dense():
    n = 40
    rows, cols, vals = _random_graph(n, 4, 5)
    lay = EllLayout(rows, cols, n)
    slots = jnp.asarray(lay.pack(vals), jnp.float32)
    got = np.asarray(ell_global_multi(AGGS, slots, jnp.asarray(lay.deg),
                                      lay.n_edges))
    want = np.array([vals.min(), vals.mean(), vals.sum(), vals.max()])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_ell_pattern_surface_matches_edge_order():
    """neighbor/broadcast/mask_pads through EllPattern reproduce the
    edge-order x[cols] / x[rows] reads (pads zeroed)."""
    n = 37
    rows, cols, vals = _random_graph(n, 5, 7)
    lay = EllLayout(rows, cols, n)
    pat = EllPattern.from_layout(lay)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((n, 2)),
                    jnp.float32)

    nb = np.moveaxis(np.asarray(pat.mask_pads(pat.neighbor(x))), -1, 0)
    np.testing.assert_allclose(np.moveaxis(lay.unpack(nb), 0, -1),
                               np.asarray(x)[cols], rtol=1e-6)
    bc = np.moveaxis(np.asarray(pat.mask_pads(pat.broadcast(x))), -1, 0)
    np.testing.assert_allclose(np.moveaxis(lay.unpack(bc), 0, -1),
                               np.asarray(x)[rows], rtol=1e-6)

    e = jnp.asarray(lay.pack(vals), jnp.float32)[:, :, None]
    got = pat.multi(AGGS, e)
    want = multi_segment_reduce(AGGS, jnp.asarray(vals, jnp.float32)[:, None],
                                jnp.asarray(rows), n, is_sorted=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_choose_edge_layout_routing():
    # banded pattern -> band
    n = 64
    idx = np.arange(n - 1)
    rows = np.concatenate([idx, idx + 1])
    cols = np.concatenate([idx + 1, idx])
    op = SparseOperator.from_coo(rows, cols, np.ones(rows.size), (n, n))
    _, pat, kind = choose_edge_layout(op)
    assert kind == "band" and isinstance(pat, BandPattern)

    # unstructured (random) -> ell
    r2, c2, v2 = _random_graph(256, 8, 11)
    op2 = SparseOperator.from_coo(r2, c2, v2, (256, 256))
    _, pat2, kind2 = choose_edge_layout(op2)
    assert kind2 == "ell" and isinstance(pat2, EllPattern)

    # uniform periodic grid -> grid
    from gnnla_tpu.problems import laplacian_nd
    opg, _, _ = laplacian_nd([8, 8], bcs=[1, 1])
    opg = opg.remove_diagonal()
    _, patg, kindg = choose_edge_layout(opg, grid_shape=(8, 8))
    assert kindg == "grid" and isinstance(patg, GridPattern)

    # requested grid on a non-grid pattern warns and falls back
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _, _, kind_fb = choose_edge_layout(op2, grid_shape=(16, 16))
    assert kind_fb == "ell"
    assert any("not uniform" in str(x.message) for x in w)


def test_diffusion_gnn_ell_path_matches_edge_order():
    """DiffusionGNN forward on EllPattern == edge-order forward, same
    params (the unstructured production path; models/diffusion_gnn.py)."""
    import jax

    from gnnla_tpu.core import GraphState
    from gnnla_tpu.models.diffusion_gnn import DiffusionGNN

    n = 48
    rows, cols, vals = _random_graph(n, 5, 13, with_empty_rows=False)
    op = SparseOperator.from_coo(rows, cols, vals, (n, n))
    rows_h, cols_h, vals_h = op.host_coo()
    lay = EllLayout(rows_h, cols_h, n)
    pat = EllPattern.from_layout(lay)

    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.standard_normal((n, 1)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1,)), jnp.float32)
    e_feat = np.stack([vals_h, rng.standard_normal(vals_h.size)], axis=1)

    model = DiffusionGNN(n_layers_external=2, n_layers_internal=1,
                         n_hidden=8, encoder=(1, 8))
    st_edge = GraphState(vertices=d, edges=jnp.asarray(e_feat, jnp.float32),
                         globals_=g)
    params = model.init(jax.random.PRNGKey(0), op, st_edge)
    out_edge = model.apply(params, op, st_edge)

    e_ell = jnp.asarray(
        np.moveaxis(lay.pack(np.ascontiguousarray(e_feat.T)), 0, -1),
        jnp.float32)
    st_ell = GraphState(vertices=d, edges=e_ell, globals_=g)
    out_ell = model.apply(params, pat, st_ell)
    np.testing.assert_allclose(np.asarray(out_ell), np.asarray(out_edge),
                               rtol=2e-4, atol=2e-5)


def test_choose_edge_layout_rejects_degree_skew(monkeypatch):
    """A hub-dominated pattern must fail loudly with guidance instead of
    allocating a K_max x N slot array (memory safety guard)."""
    import gnnla_tpu.ops.band as band_mod

    n = 512
    r2, c2, _ = _random_graph(n, 6, 17)     # unstructured bulk (many
    hub_cols = np.arange(1, 101)            # offsets) + one degree-100 hub
    rows = np.concatenate([np.zeros(100, np.int64), r2[r2 > 0]])
    cols = np.concatenate([hub_cols, c2[r2 > 0]])
    op = SparseOperator.from_coo(rows, cols, np.ones(rows.size), (n, n))
    monkeypatch.setattr(band_mod, "ELL_MAX_SLOTS", 10_000)
    with pytest.raises(ValueError, match="degree-skewed"):
        band_mod.choose_edge_layout(op)
