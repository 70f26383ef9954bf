"""Dataset generation + caching for the two learned-model families.

Reference counterparts: PyG `Dataset`s that generate matrices in `download()`
and convert in `process()`, cached under data/raw + data/processed
(TrainableJacobiDiag/Data.py:97-206, DiffCoeffs/data.py:51-455).

TPU-first redesign: FEM matrices on a fixed mesh resolution share one
sparsity pattern, so a "batch" is NOT a PyG block-diagonal graph with a batch
vector — it is a single pattern template (SparseOperator) plus stacked value
arrays [B, E] / [B, N] that `vmap` maps over. Samples are bucketed by mesh
resolution; each bucket is one stacked pytree (one XLA program per bucket).
Caching is one .npz per bucket (the analogue of the reference's
data/processed cache).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import numpy as np

from gnnla_tpu.ops.sparse import SparseOperator
from gnnla_tpu.problems.diffusion_fem import (alpha_beta_targets,
                                              constant_diffusion_matrix,
                                              cosine_diffusion_matrix)
from gnnla_tpu.problems.small_band import small_band_matrix


# ------------------------------------------------- parallel generation
def _accelerator_initialized() -> bool:
    """True when this process already initialized a non-CPU jax backend
    (fork-unsafe: the child inherits the device/grpc client state)."""
    import jax
    try:
        backends = jax._src.xla_bridge._backends  # noqa: SLF001
    except AttributeError:  # private layout changed — assume unsafe
        return True
    return any(name != "cpu" for name in backends)


def _parallel_map(fn, args_list, min_parallel: int = 64):
    """Host-process fan-out for matrix generation (the role joblib plays in
    the reference, Data.py:143, data.py:76). Workers are forked and run
    pure-numpy builders only — they must never touch jax (a second process
    on a tunneled TPU backend contends for the device). Serial fallback for
    small jobs, single-core hosts, GNNLA_SERIAL_DATAGEN=1, or when the
    parent already holds a live non-CPU jax client (forking a process that
    owns a TPU/grpc handle can deadlock even if the child never uses it)."""
    n_workers = os.cpu_count() or 1
    if (len(args_list) < min_parallel or n_workers < 2
            or os.environ.get("GNNLA_SERIAL_DATAGEN")
            or _accelerator_initialized()):
        return [fn(a) for a in args_list]
    import multiprocessing as mp
    ctx = mp.get_context("fork")
    with ctx.Pool(processes=min(n_workers, 8)) as pool:
        return pool.map(fn, args_list, chunksize=max(1,
                        len(args_list) // (4 * n_workers)))


def _gen_small_band(args):
    from gnnla_tpu.problems.small_band import small_band_matrix_host
    n, h, band_loc = args
    return small_band_matrix_host(n, h, band_loc)


def _gen_cosine(args):
    from gnnla_tpu.problems.diffusion_fem import (assemble_periodic,
                                                  cosine_field,
                                                  element_stiffness_field)
    thetas, n, convection, ref_sym = args
    tax, tay, tbx, tby = thetas
    ke = element_stiffness_field(n, cosine_field(tax, tay),
                                 cosine_field(tbx, tby),
                                 convection=convection,
                                 reference_symmetrized=ref_sym)
    return assemble_periodic(ke, n)


def _gen_stretched(args):
    from gnnla_tpu.problems.fem_heateqn import heateqn_fem_2d_host
    n_cells, stretch = args
    return heateqn_fem_2d_host((n_cells, n_cells), (1.0, stretch), (2, 2))


@dataclasses.dataclass
class StackedGraphs:
    """A bucket of same-pattern graphs, stacked for vmap.

    template        : full-pattern SparseOperator (vals of sample 0)
    template_nodiag : diagonal-removed pattern template
    vals            : [B, E_full]  full-pattern values per sample
    offdiag_vals    : [B, E_nd]    off-diagonal values per sample
    diags           : [B, N]       diagonal per sample
    coords          : [B, N, 2]    vertex coordinates (None if n/a)
    targets         : [B, N, T]    regression targets (None if n/a)
    globals_        : [B, G]       per-graph globals (None if n/a)
    meta            : dict of per-sample scalars (h, band_loc, thetas, ...)
    """

    template: SparseOperator
    template_nodiag: SparseOperator
    vals: np.ndarray
    offdiag_vals: np.ndarray
    diags: np.ndarray
    coords: Optional[np.ndarray] = None
    targets: Optional[np.ndarray] = None
    globals_: Optional[np.ndarray] = None
    meta: Optional[Dict[str, np.ndarray]] = None

    @property
    def n_graphs(self) -> int:
        return self.vals.shape[0]

    def band_stack_nodiag(self):
        """(BandLayout, band_ov [B, K, N]) — off-diagonal values in the
        zero-gather band layout (ops/band.py), host-packed once.

        The input of the banded feature path
        (`jacobi_diag_features_banded`): the train step then touches no
        edge-order device array at all (TPU gathers cap at ~7e7 elem/s)."""
        from gnnla_tpu.ops.band import BandLayout

        lay = BandLayout(self.template_nodiag)
        return lay, lay.pack(self.offdiag_vals)

    def dia_stack(self):
        """(offsets, diags [B, K, N]) — the bucket in DIA form.

        All FEM buckets are banded; the spectral-loss SpMMs run on this
        gather-free layout (faster on TPU than scatter-based segment sums,
        and it sidesteps scatter-kernel fragility on experimental backends).
        """
        rows, cols, _ = self.template.host_coo()
        offs = cols - rows
        uniq = np.unique(offs)
        off_idx = np.searchsorted(uniq, offs)
        n = self.template.n_rows
        b = self.n_graphs
        diags = np.zeros((b, uniq.size, n))
        np.add.at(diags, (slice(None), off_idx, rows),
                  self.vals.astype(np.float64))
        return tuple(int(o) for o in uniq), diags

    def select(self, idx) -> "StackedGraphs":
        idx = np.asarray(idx)
        return dataclasses.replace(
            self,
            vals=self.vals[idx],
            offdiag_vals=self.offdiag_vals[idx],
            diags=self.diags[idx],
            coords=None if self.coords is None else self.coords[idx],
            targets=None if self.targets is None else self.targets[idx],
            globals_=None if self.globals_ is None else self.globals_[idx],
            meta=None if self.meta is None else
            {k: v[idx] for k, v in self.meta.items()},
        )


def _stack_from_ops(ops, diags_first=True):
    """Split a list of same-pattern SparseOperators into template + stacks."""
    template = ops[0]
    nodiag = template.remove_diagonal()
    rows0, cols0, _ = template.host_coo()
    offmask = rows0 != cols0
    vals = np.stack([op.host_coo()[2] for op in ops])
    for op in ops[1:]:
        r, c, _ = op.host_coo()
        if not (np.array_equal(r, rows0) and np.array_equal(c, cols0)):
            raise ValueError("bucketed samples must share one pattern")
    offdiag_vals = vals[:, offmask]
    diags = np.stack([op.host_diagonal() for op in ops])
    return template, nodiag, vals, offdiag_vals, diags


# ------------------------------------------------------------- small band
def small_band_dataset(num_matrices: int, *, n: int = 38,
                       h_low: float = 0.0005, seed: int = 54681,
                       cache_dir: Optional[str] = None) -> StackedGraphs:
    """Small-band FEM matrices at fixed resolution n (one pattern bucket).

    Sampling mirrors SmallBandDataset.generate_and_save_matrix
    (Data.py:148-163): h ~ U(h_low, 1/(2(n-2))), band_loc ~ U(0.05, 0.95).
    The reference's default training run uses a fixed resolution too
    (N_low=38, N_high=39 -> always 38, train.py:74).
    """
    cache = None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        cache = os.path.join(
            cache_dir, f"smallband_{num_matrices}_{n}_{h_low}_{seed}.npz")
        if os.path.exists(cache):
            return _load_stacked(cache)

    rng = np.random.default_rng(seed)
    args, hs = [], []
    for _ in range(num_matrices):
        h_high = 1.0 / (2 * (n - 2))
        h = (h_high - h_low) * rng.random() + h_low
        band_loc = 0.9 * rng.random() + 0.05
        args.append((n, h, band_loc))
        hs.append(h)
    results = _parallel_map(_gen_small_band, args)
    ops = [SparseOperator.from_scipy(K) for K, _, _ in results]
    coords = [xy for _, xy, _ in results]
    blocs = [bl for _, _, bl in results]

    template, nodiag, vals, offdiag_vals, diags = _stack_from_ops(ops)
    ds = StackedGraphs(template=template, template_nodiag=nodiag,
                       vals=vals, offdiag_vals=offdiag_vals, diags=diags,
                       coords=np.stack(coords),
                       meta={"h": np.asarray(hs),
                             "band_loc": np.asarray(blocs)})
    if cache:
        _save_stacked(cache, ds)
    return ds


def stretched_mesh_dataset(num_matrices: int, *, n_cells: int = 5,
                           max_stretch: float = 5.0, seed: int = 0,
                           cache_dir: Optional[str] = None) -> StackedGraphs:
    """Stretched-mesh heat-equation matrices (one pattern bucket).

    The reference's other trainable-Jacobi data family: the MATLAB trainer
    draws heateqnfem2dfun([5,5],[1,stretch],[2,2]) with stretch swept
    linearly over [1, max_stretch] (train_jacobi_find_d.m:59-82), and
    gettrainingmatrices.m exports 1000 of them (stretch 1..7) for
    HeatEqnFEM2DDataset (Data.py:50-95). Stretches here follow the linear
    sweep; `seed` jitters them uniformly within their slot so distinct
    train/val/test draws differ like the reference's three sweeps do.
    """
    cache = None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        cache = os.path.join(
            cache_dir,
            f"stretched_{num_matrices}_{n_cells}_{max_stretch}_{seed}.npz")
        if os.path.exists(cache):
            return _load_stacked(cache)

    rng = np.random.default_rng(seed)
    stretches = []
    # eliminated Dirichlet BCs keep the interior (n_cells-1)^2 vertices
    xs_int = np.linspace(0.0, 1.0, n_cells + 1)[1:-1]
    for i in range(num_matrices):
        frac = i / max(num_matrices - 1, 1)
        stretch = 1.0 + frac * (max_stretch - 1.0)
        if seed:
            slot = (max_stretch - 1.0) / max(num_matrices - 1, 1)
            stretch = min(max(1.0, stretch + slot * (rng.random() - 0.5)),
                          max_stretch)
        stretches.append(stretch)
    hosts = _parallel_map(_gen_stretched,
                          [(n_cells, st) for st in stretches])
    ops = [SparseOperator.from_scipy(K) for K in hosts]
    xy = np.stack(np.meshgrid(xs_int, xs_int, indexing="xy"),
                  axis=-1).reshape(-1, 2)
    assert xy.shape[0] == ops[0].shape[0], (xy.shape, ops[0].shape)
    coords = [xy] * num_matrices

    template, nodiag, vals, offdiag_vals, diags = _stack_from_ops(ops)
    ds = StackedGraphs(template=template, template_nodiag=nodiag,
                       vals=vals, offdiag_vals=offdiag_vals, diags=diags,
                       coords=np.stack(coords),
                       meta={"stretch": np.asarray(stretches)})
    if cache:
        _save_stacked(cache, ds)
    return ds


# --------------------------------------------------------------- diffusion
def cosine_diffusion_dataset(num_matrices: int, *, n: int = 32,
                             max_freq: float = 3.0, seed: int = 41,
                             convection=None,
                             reference_symmetrized: bool = False,
                             cache_dir: Optional[str] = None
                             ) -> StackedGraphs:
    """Cosine-diffusion FEM matrices at fixed resolution n.

    Mirrors RandomCosineDiffusionDataset (data.py:137-221): thetas drawn
    from {0, 0.5, ..., max_freq}; targets y = [alpha_i, beta_i]; global = h.
    Edge features (built downstream) are [A_ij, rel_x, rel_y] with periodic
    wraparound (data.py:102-127). `convection=(cx, cy)` adds the advection
    term of CosineDiffusionConvectionFEM_Builder (FEM.py:231-239; the
    reference uses (0.1, 0)).

    Deliberate divergence: the reference assembles K[k,l]=K[l,k] from the
    k<=l integral (FEM.py:122-128), which silently SYMMETRIZES the
    convection term — i.e. its "convection" operators are still symmetric
    and the advective part is half-lost. Here the advection integral is
    assembled unsymmetrized (physically correct: convection-diffusion
    operators are nonsymmetric), so the convection dataset distribution
    intentionally differs from the reference's quirk
    (tests/test_training.py asserts the nonsymmetry end-to-end). Pass
    `reference_symmetrized=True` to reproduce the reference's exact
    (symmetrized) distribution instead — e.g. when comparing trained-model
    quality against reference-trained checkpoints.
    """
    cache = None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        ckey = "" if convection is None else \
            f"_c{convection[0]}_{convection[1]}"
        if reference_symmetrized:
            ckey += "_refsym"
        cache = os.path.join(
            cache_dir,
            f"cosdiff_{num_matrices}_{n}_{max_freq}_{seed}{ckey}.npz")
        if os.path.exists(cache):
            return _load_stacked(cache)

    rng = np.random.default_rng(seed)
    freqs = [0.5 * i for i in range(int(2 * max_freq) + 1)
             if 0.5 * i <= max_freq]
    targets, thetas_all = [], []
    for _ in range(num_matrices):
        thetas = rng.choice(freqs, 4, replace=True)
        a, b = alpha_beta_targets(tuple(thetas), n)
        targets.append(np.stack([a, b], axis=1))
        thetas_all.append(thetas)
    hosts = _parallel_map(
        _gen_cosine, [(tuple(t), n, convection, reference_symmetrized)
                      for t in thetas_all])
    ops = [SparseOperator.from_scipy(K) for K in hosts]

    template, nodiag, vals, offdiag_vals, diags = _stack_from_ops(ops)
    h = 1.0 / n
    ds = StackedGraphs(
        template=template, template_nodiag=nodiag, vals=vals,
        offdiag_vals=offdiag_vals, diags=diags,
        targets=np.stack(targets),
        globals_=np.full((num_matrices, 1), h),
        meta={"thetas": np.stack(thetas_all)})
    if cache:
        _save_stacked(cache, ds)
    return ds


def constant_diffusion_dataset(num_matrices: int, *, n: int = 32,
                               mode: str = "random", seed: int = 41,
                               cache_dir: Optional[str] = None
                               ) -> StackedGraphs:
    """Constant-coefficient diffusion matrices at fixed resolution n.

    mode='random' mirrors RandomConstantDiffusionDataset (reference
    data.py:302-324: alpha, beta ~ U(0, 1)); mode='small_alpha_large_beta'
    mirrors ConstantDiffusionDataset (data.py:253-256: alpha = 10^-i,
    beta = 0.8 — the out-of-distribution extrapolation sweep used by
    test_best_performing_model.py:63-88). Targets are the constant
    per-vertex [alpha_i, beta_i]; global = h.
    """
    cache = None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        cache = os.path.join(
            cache_dir, f"constdiff_{num_matrices}_{n}_{mode}_{seed}.npz")
        if os.path.exists(cache):
            return _load_stacked(cache)

    rng = np.random.default_rng(seed)
    ops, targets, alphas, betas = [], [], [], []
    for i in range(num_matrices):
        if mode == "random":
            alpha, beta = float(rng.random()), float(rng.random())
        elif mode == "small_alpha_large_beta":
            alpha, beta = 10.0 ** (-i), 0.8
        else:
            raise ValueError(f"unknown mode {mode!r}")
        ops.append(constant_diffusion_matrix(alpha, beta, n))
        targets.append(np.stack([np.full(n * n, alpha),
                                 np.full(n * n, beta)], axis=1))
        alphas.append(alpha)
        betas.append(beta)

    template, nodiag, vals, offdiag_vals, diags = _stack_from_ops(ops)
    ds = StackedGraphs(
        template=template, template_nodiag=nodiag, vals=vals,
        offdiag_vals=offdiag_vals, diags=diags,
        targets=np.stack(targets),
        globals_=np.full((num_matrices, 1), 1.0 / n),
        meta={"alpha": np.asarray(alphas), "beta": np.asarray(betas)})
    if cache:
        _save_stacked(cache, ds)
    return ds


def frequency_study_dataset(*, n: int = 32, max_freq: float = 4.0,
                            cache_dir: Optional[str] = None
                            ) -> StackedGraphs:
    """One cosine-diffusion matrix per (theta_x, theta_y) pair on the
    half-integer frequency grid — the error-surface sweep of
    FrequencyStudyDiffusionDataset (reference data.py:326-366, consumed by
    Freq_Study.py:50-108). thetas = [tx, ty, tx, ty]."""
    cache = None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        cache = os.path.join(cache_dir, f"freqstudy_{n}_{max_freq}.npz")
        if os.path.exists(cache):
            return _load_stacked(cache)

    freqs = [0.5 * i for i in range(int(2 * max_freq) + 1)
             if 0.5 * i <= max_freq]
    ops, targets, thetas_all = [], [], []
    for ty in freqs:
        for tx in freqs:
            thetas = (tx, ty, tx, ty)
            ops.append(cosine_diffusion_matrix(thetas, n))
            a, b = alpha_beta_targets(thetas, n)
            targets.append(np.stack([a, b], axis=1))
            thetas_all.append(thetas)

    template, nodiag, vals, offdiag_vals, diags = _stack_from_ops(ops)
    num = len(ops)
    ds = StackedGraphs(
        template=template, template_nodiag=nodiag, vals=vals,
        offdiag_vals=offdiag_vals, diags=diags,
        targets=np.stack(targets),
        globals_=np.full((num, 1), 1.0 / n),
        meta={"thetas": np.asarray(thetas_all)})
    if cache:
        _save_stacked(cache, ds)
    return ds


_PROBLEM_TYPES = {
    "cosine": lambda num, n, max_freq, seed, cache: cosine_diffusion_dataset(
        num, n=n, max_freq=max_freq, seed=seed, cache_dir=cache),
    # CosineDiffusionConvectionFEM_Builder's field (FEM.py:231-239)
    "cosine_convection": lambda num, n, max_freq, seed, cache:
        cosine_diffusion_dataset(num, n=n, max_freq=max_freq, seed=seed,
                                 convection=(0.1, 0.0), cache_dir=cache),
    "constant": lambda num, n, max_freq, seed, cache:
        constant_diffusion_dataset(num, n=n, mode="random", seed=seed,
                                   cache_dir=cache),
    "small_alpha_large_beta": lambda num, n, max_freq, seed, cache:
        constant_diffusion_dataset(num, n=n, mode="small_alpha_large_beta",
                                   seed=seed, cache_dir=cache),
    "freq_study": lambda num, n, max_freq, seed, cache:
        frequency_study_dataset(n=n, max_freq=max_freq, cache_dir=cache),
}


def diffusion_data_module(problem_type: str = "cosine", *,
                          num_matrices: int = 1000, n: int = 32,
                          max_freq: float = 3.0, seed: int = 41,
                          split=(0.7, 0.2, 0.1),
                          cache_dir: Optional[str] = None):
    """Dataset factory + 70/20/10 split — the DiffusionDataModule analogue
    (reference data.py:371-455, four problem_types). Returns
    (train, val, test) StackedGraphs views over one pattern bucket."""
    try:
        builder = _PROBLEM_TYPES[problem_type]
    except KeyError:
        raise ValueError(
            f"unknown problem_type {problem_type!r}; expected one of "
            f"{sorted(_PROBLEM_TYPES)}") from None
    ds = builder(num_matrices, n, max_freq, seed, cache_dir)
    num = ds.n_graphs
    n_tr = int(split[0] * num)
    n_va = int(split[1] * num)
    idx = np.arange(num)
    return (ds.select(idx[:n_tr]), ds.select(idx[n_tr:n_tr + n_va]),
            ds.select(idx[n_tr + n_va:]))


def periodic_rel_coords(op_nodiag: SparseOperator, n: int) -> np.ndarray:
    """[E, 2] integer relative coordinates (col - row) with periodic wrap,
    reference data.py:108-119 (entries of magnitude n-1 wrap to -/+1)."""
    rows, cols, _ = op_nodiag.host_coo()

    def rowcol(i):
        return np.stack([i % n, i // n], axis=1)

    rel = rowcol(cols) - rowcol(rows)
    rel = np.where(rel == n - 1, -1, rel)
    rel = np.where(rel == -(n - 1), 1, rel)
    return rel.astype(np.float64)


# ----------------------------------------------------------------- caching
def _save_stacked(path: str, ds: StackedGraphs) -> None:
    payload = dict(
        t_rows=ds.template.host_coo()[0],
        t_cols=ds.template.host_coo()[1],
        t_shape=np.asarray(ds.template.shape),
        vals=ds.vals, offdiag_vals=ds.offdiag_vals, diags=ds.diags)
    if ds.coords is not None:
        payload["coords"] = ds.coords
    if ds.targets is not None:
        payload["targets"] = ds.targets
    if ds.globals_ is not None:
        payload["globals"] = ds.globals_
    if ds.meta:
        for k, v in ds.meta.items():
            payload[f"meta_{k}"] = v
    np.savez_compressed(path, **payload)


def _load_stacked(path: str) -> StackedGraphs:
    z = np.load(path)
    shape = tuple(int(s) for s in z["t_shape"])
    template = SparseOperator.from_coo(z["t_rows"], z["t_cols"],
                                       z["vals"][0], shape, coalesce=False)
    meta = {k[5:]: z[k] for k in z.files if k.startswith("meta_")}
    return StackedGraphs(
        template=template,
        template_nodiag=template.remove_diagonal(),
        vals=z["vals"], offdiag_vals=z["offdiag_vals"], diags=z["diags"],
        coords=z["coords"] if "coords" in z.files else None,
        targets=z["targets"] if "targets" in z.files else None,
        globals_=z["globals"] if "globals" in z.files else None,
        meta=meta or None)
