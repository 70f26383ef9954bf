"""Ablation timing of stream-kernel stages on the 1M Delaunay fixture."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import scipy.sparse as sp

VARIANTS = sys.argv[1:] or ["full", "nomatmul", "nogather", "noscan",
                            "nodeposit", "minimal"]


def main():
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import gnnla_tpu.ops.pallas_stream as ps
    exec(open('/root/repo/scratch/bench_stream.py').read().split("def main")[0],
         globals())

    lap = delaunay_laplacian(1 << 20)  # noqa: F821
    lap = (lap / (lap.diagonal().max() * 2.0)).tocsr()
    lap.sort_indices()
    A, _ = ps.rcm_csr(lap)
    fmt = ps.build_stream(A, nb=8)
    print(f"units={fmt.n_units} steps={fmt.n_steps} w_sc={fmt.w_sc} "
          f"waste={fmt.n_units*8*128/A.nnz:.2f}", file=sys.stderr)

    def make_call(variant):
        nb, w_sc = fmt.nb, fmt.w_sc
        n_steps, n_tiles = fmt.n_steps, fmt.n_tiles

        def kernel(outidx_ref, meta_ref, idx_ref, val_ref, dep_ref,
                   rowl_ref, x_hbm, y_ref, win0, win1, yacc, sem0, sem1):
            u = pl.program_id(0)
            bufs = (win0, win1)
            sems = (sem0, sem1)

            def dma(slot, ws):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(ws, w_sc)], bufs[slot], sems[slot])

            @pl.when(u == 0)
            def _():
                dma(0, meta_ref[0, 5]).start()

            sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            lane_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            oh_sub = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0)
            oh_lane = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1)

            for j in range(nb):
                tile = meta_ref[j, 0]
                first = meta_ref[j, 1]
                last = meta_ref[j, 2]
                sc_a = meta_ref[j, 3]
                sc_b = meta_ref[j, 4]
                nws = meta_ref[j, 6]
                gsel = meta_ref[j, 7]
                rgp = meta_ref[j, 8]

                @pl.when(first == 1)
                def _():
                    for parity in (0, 1):
                        @pl.when(tile % 2 == parity)
                        def _(parity=parity):
                            dma(parity, meta_ref[j, 5]).wait()

                            @pl.when(nws >= 0)
                            def _():
                                dma(1 - parity, nws).start()
                    yacc[...] = jnp.zeros_like(yacc)

                even = (tile % 2) == 0
                SCa = jnp.where(even, win0[sc_a], win1[sc_a])
                SCb = jnp.where(even, win0[sc_b], win1[sc_b])
                use_b = jnp.bitwise_and(
                    jnp.right_shift(gsel, sub_iota), 1) == 1

                idx = idx_ref[j]
                lo = jnp.bitwise_and(idx, 127)
                m = jnp.right_shift(idx, 7)
                if variant in ("nogather", "minimal"):
                    prod = val_ref[j] + SCa[0, 0]
                else:
                    g = jnp.zeros((8, 128), jnp.float32)
                    for mm in range(8):
                        ca = jax.lax.broadcast_in_dim(SCa[mm], (8, 128),
                                                      (1,))
                        cb = jax.lax.broadcast_in_dim(SCb[mm], (8, 128),
                                                      (1,))
                        merged = jnp.where(use_b, cb, ca)
                        gg = jnp.take_along_axis(merged, lo, axis=1)
                        g = jnp.where(m == mm, gg, g)
                    prod = g * val_ref[j]

                if variant not in ("noscan", "minimal"):
                    rowl = rowl_ref[j].astype(jnp.int32)
                    for sh in (1, 2, 4):
                        same = jnp.logical_and(
                            rowl == pltpu.roll(rowl, sh, 1),
                            lane_iota >= sh)
                        prod = prod + jnp.where(
                            same, pltpu.roll(prod, sh, 1), 0.0)

                if variant not in ("nodeposit", "minimal"):
                    dsrc = dep_ref[j].astype(jnp.int32)
                    valid = dsrc >= 0
                    dep = jnp.take_along_axis(
                        prod, jnp.where(valid, dsrc, 0), axis=1)
                    dacc = jnp.where(valid, dep, 0.0)
                else:
                    dacc = prod

                if variant in ("nomatmul", "minimal"):
                    yacc[...] = yacc[...] + dacc
                else:
                    oht = (jnp.bitwise_and(
                        jnp.right_shift(rgp, 3 * oh_lane), 7) == oh_sub
                           ).astype(jnp.float32)
                    yacc[...] = yacc[...] + jax.lax.dot_general(
                        oht, dacc, (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)

                @pl.when(last == 1)
                def _():
                    y_ref[0] = yacc[...]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((nb, 16), lambda u, o: (u, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((nb, 8, 128), lambda u, o: (u, 0, 0)),
                pl.BlockSpec((nb, 8, 128), lambda u, o: (u, 0, 0)),
                pl.BlockSpec((nb, 8, 128), lambda u, o: (u, 0, 0)),
                pl.BlockSpec((nb, 8, 128), lambda u, o: (u, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda u, o: (o[u], 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((w_sc, 8, 128), jnp.float32),
                pltpu.VMEM((w_sc, 8, 128), jnp.float32),
                pltpu.VMEM((8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32))

    args = (jnp.asarray(fmt.out_idx), jnp.asarray(fmt.meta),
            jnp.asarray(fmt.idx), jnp.asarray(fmt.vals),
            jnp.asarray(fmt.dep), jnp.asarray(fmt.rowl))
    L = fmt.padded_len
    x3 = jnp.zeros((L // 1024, 8, 128), jnp.float32) + 0.5

    for variant in VARIANTS:
        call = make_call(variant)
        n_iters = 100

        @jax.jit
        def run(a, x3):
            def step(x3, _):
                y = call(*a, x3)
                return y.reshape(x3.shape) * 0.5, None
            x3, _ = jax.lax.scan(step, x3, None, length=n_iters)
            return x3

        t0 = time.perf_counter()
        y = run(args, x3)
        float(jnp.sum(y))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter(); float(jnp.sum(y)); fetch = time.perf_counter()-t0
        t0 = time.perf_counter()
        for _ in range(3):
            y = run(args, y)
        float(jnp.sum(y))
        dt = time.perf_counter() - t0 - fetch
        per_step = dt / (3 * n_iters * fmt.n_steps) * 1e9
        eps = fmt.nnz * 3 * n_iters / dt
        print(f"{variant:10s} {eps:.3e} e/s  {per_step:6.0f} ns/step "
              f"(compile {comp:.0f}s)", file=sys.stderr)


if __name__ == "__main__":
    main()
