"""Band-layout GN execution: the zero-gather path for learned models.

The reference's learned models aggregate edge features onto vertices with
torch_scatter's 4-way (min, mean, sum, max) reduce
(TrainableJacobiGNN.py:65-68, LearnDiffusionCoeffs.py:303-341). On TPU any
per-element gather/scatter caps at ~7e7 elem/s, so this framework stores
edge data in DIA band order instead (ops/band.py): aggregation becomes a
masked axis reduction, neighbor reads become shifts/rolls — measured
3.9e10 edges/s on the chip, 1632x the scatter path (PERF.md).

This demo shows the three pieces on a small operator:
  1. BandLayout: host pack + the 4-way reduce, checked against the
     segment (torch_scatter-semantics) reducers,
  2. jacobi_diag_features_banded == jacobi_diag_features,
  3. the DiffusionGNN band forward == the edge-order GNBlock forward
     with one shared parameter tree.
"""
import jax
import jax.numpy as jnp
import numpy as np


def main(n=12):
    from gnnla_tpu.models.trainable_jacobi import (
        jacobi_diag_features, jacobi_diag_features_banded)
    from gnnla_tpu.ops.band import BandLayout, band_multi_reduce
    from gnnla_tpu.ops.segment import multi_segment_reduce
    from gnnla_tpu.problems import laplacian_2d

    AGGS = ("min", "mean", "sum", "max")

    # 1. layout + 4-way reduce vs the segment path
    A = laplacian_2d(n).eliminate_zeros()
    nd = A.remove_diagonal()
    lay = BandLayout(nd)
    rows, _, vals = nd.host_coo()
    bands = jnp.asarray(lay.pack(vals), jnp.float32)
    mask = jnp.asarray(lay.mask)
    deg = jnp.asarray(np.maximum(lay.deg, 1), jnp.float32)
    got = band_multi_reduce(AGGS, bands, mask, deg)
    want = multi_segment_reduce(AGGS, jnp.asarray(vals, jnp.float32)[:, None],
                                jnp.asarray(rows), nd.n_rows)
    err = float(jnp.max(jnp.abs(got - want)))
    print(f"band 4-way reduce vs segment path: K={lay.k} bands, "
          f"E={lay.n_edges} edges, max abs err {err:.2e}")
    assert err < 1e-5

    # 2. the trainable-Jacobi feature vector, banded
    diag = A.diagonal()
    f_band = jacobi_diag_features_banded(diag, bands, mask, deg)
    f_edge = jacobi_diag_features(nd, diag)
    ferr = float(jnp.max(jnp.abs(f_band - f_edge)))
    print(f"jacobi_diag_features banded vs edge: max abs err {ferr:.2e}")
    assert ferr < 1e-5

    # 3. diffusion GN forward, one parameter tree, two layouts
    from gnnla_tpu.core import GraphState
    from gnnla_tpu.models.diffusion_gnn import DiffusionGNN
    from gnnla_tpu.training.datasets import cosine_diffusion_dataset
    from gnnla_tpu.training.train_diffusion import (edge_features,
                                                    make_apply,
                                                    make_apply_banded)

    ds = cosine_diffusion_dataset(2, n=8, seed=3, cache_dir=None)
    rel = edge_features(ds, 8)
    model = DiffusionGNN(n_layers_external=2, n_layers_internal=2,
                         n_hidden=8, encoder=(1, 8))
    e0 = jnp.concatenate([jnp.asarray(ds.offdiag_vals[0],
                                      jnp.float32)[:, None],
                          jnp.asarray(rel, jnp.float32)], axis=1)
    s0 = GraphState(vertices=jnp.asarray(ds.diags[0], jnp.float32)[:, None],
                    edges=e0,
                    globals_=jnp.asarray(ds.globals_[0], jnp.float32))
    params = model.init(jax.random.PRNGKey(0), ds.template_nodiag, s0)

    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    out_e = make_apply(model, ds, rel)(
        params, f32(ds.offdiag_vals), f32(ds.diags), f32(ds.globals_))
    apply_g, pack = make_apply_banded(model, ds, rel, grid_shape=(8, 8))
    out_g = apply_g(params, f32(pack(ds.offdiag_vals)), f32(ds.diags),
                    f32(ds.globals_))
    gerr = float(jnp.max(jnp.abs(out_g - out_e)))
    kk = pack(ds.offdiag_vals).shape[1]
    print(f"DiffusionGNN grid-layout forward ({kk} stencil classes, "
          f"mask-free) vs edge path: max abs err {gerr:.2e}")
    assert gerr < 1e-4


if __name__ == "__main__":
    main()
