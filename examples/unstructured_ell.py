"""ELL slot layout: zero-gather aggregation on UNSTRUCTURED graphs.

`BandLayout` (see band_layout.py) covers every banded/grid FEM pattern in
the reference, but on a meshfree/k-NN graph its K = #unique diagonal
offsets explodes. `EllLayout` (ops/band.py, round 5) stores edge data
slot-per-neighbor instead: [K = max degree, N], edges of row i in slots
0..deg[i]-1, so the 4-way (min, mean, sum, max) aggregation is a masked
axis reduction with the pad mask generated on the fly from the degree
vector — measured 1.9e11 edges/s on chip, ~5700x the torch-CPU
scatter_reduce execution model the reference uses (PERF.md `agg` stanza).

This demo shows, on a small random k-NN graph:
  1. choose_edge_layout routing the unstructured pattern to "ell",
  2. the ELL 4-way reduce vs the segment (torch_scatter-semantics) path,
  3. the DiffusionGNN ELL forward == the edge-order GNBlock forward with
     one shared parameter tree.
"""
import jax
import jax.numpy as jnp
import numpy as np


def main(n=144, k=6):
    import scipy.sparse as sp
    from scipy.spatial import cKDTree

    from gnnla_tpu.core import GraphState
    from gnnla_tpu.models.diffusion_gnn import DiffusionGNN
    from gnnla_tpu.ops.band import EllPattern, choose_edge_layout
    from gnnla_tpu.ops.segment import multi_segment_reduce
    from gnnla_tpu.ops.sparse import SparseOperator

    AGGS = ("min", "mean", "sum", "max")
    rng = np.random.default_rng(0)
    pts = rng.random((n, 2))
    d, idx = cKDTree(pts).query(pts, k=k + 1)
    rows = np.repeat(np.arange(n), k)
    cols = idx[:, 1:].reshape(-1)
    w = np.exp(-d[:, 1:] ** 2).reshape(-1)
    A = sp.coo_matrix((w, (rows, cols)), shape=(n, n)).tocsr()
    A = (A + A.T).tocsr()
    op = SparseOperator.from_scipy(A)

    # 1. routing: an unstructured pattern picks the ELL layout
    lay, pat, kind = choose_edge_layout(op)
    assert kind == "ell" and isinstance(pat, EllPattern)
    rows_h, _, vals_h = op.host_coo()
    print(f"k-NN-{k} graph: n={n}, E={op.nnz}, layout={kind} "
          f"(K={lay.k} slots, fill {op.nnz / (lay.k * n):.2f})")

    # 2. 4-way reduce parity vs the segment path
    slots = jnp.asarray(lay.pack(vals_h), jnp.float32)
    got = pat.multi(AGGS, slots[:, :, None])
    want = multi_segment_reduce(AGGS, jnp.asarray(vals_h, jnp.float32)[:, None],
                                jnp.asarray(rows_h), n, is_sorted=True)
    err = float(jnp.max(jnp.abs(got - want)))
    print(f"ELL 4-way reduce vs segment path: max abs err {err:.2e}")
    assert err < 1e-5

    # 3. DiffusionGNN on the ELL pattern == edge-order forward
    e_feat = np.stack([vals_h, rng.standard_normal(vals_h.size)], axis=1)
    dg = jnp.asarray(rng.standard_normal((n, 1)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1,)), jnp.float32)
    model = DiffusionGNN(n_layers_external=1, n_layers_internal=1,
                         n_hidden=8)
    st_e = GraphState(vertices=dg, edges=jnp.asarray(e_feat, jnp.float32),
                      globals_=g)
    params = model.init(jax.random.PRNGKey(0), op, st_e)
    out_e = model.apply(params, op, st_e)
    e_ell = jnp.asarray(
        np.moveaxis(lay.pack(np.ascontiguousarray(e_feat.T)), 0, -1),
        jnp.float32)
    out_l = model.apply(params, pat,
                        GraphState(vertices=dg, edges=e_ell, globals_=g))
    err2 = float(jnp.max(jnp.abs(out_l - out_e)))
    print(f"DiffusionGNN ELL forward vs edge-order: max abs err {err2:.2e}")
    assert err2 < 1e-3
    print("unstructured ELL path ok")


if __name__ == "__main__":
    main()
