"""Differentiable spectral (damping-factor) loss for the trainable Jacobi.

Reference semantics: /root/reference/pytorch/TrainableJacobiDiag/loss.py.
The loss per matrix is an estimate of the largest eigenvalue of the error
propagator T = I - omega D^{-1} A restricted to high-frequency modes:

  * exact path  (loss.py:59-64, eval only): dense eigvals of T
  * train path  (loss.py:68-71, 105-128): Gelfand estimate
        max_m || T^K y_m ||^{1/K}  over m probe vectors y_m, K = 3
    with probes drawn from high-frequency Fourier modes
    sin(theta_x pi x) sin(theta_y pi y), theta > n/2  (loss.py:139-170)

Design changes vs the reference (deliberate):
  * T is never materialised — the reference builds a sparse COO T
    (build_error_matrix, loss.py:92-102); here each application is
    y - omega * (A y) / d, one fused SpMM (SURVEY.md §7.4),
  * probe-vector generation is host-side and seeded (numpy), keeping the
    device loss a pure function of (A, d, probes),
  * the K applications run under lax.fori_loop and the whole loss is
    differentiable w.r.t. d via jax.grad (the reference relies on torch
    autograd through sparse matmuls).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gnnla_tpu.ops.sparse import SparseOperator

Array = jax.Array


# --------------------------------------------------------------- probes
def high_freq_probes(n_vertices: int, m: int, xy: Optional[np.ndarray],
                     rng: np.random.Generator) -> np.ndarray:
    """m unit vectors sampled from high-frequency Fourier modes [N, m].

    Mirrors get_random_high_freq (loss.py:139-170): draw theta_x, theta_y ~
    U(1, n), accept when theta_x > n/2 or theta_y > n/2, mode =
    sin(theta_x pi x) sin(theta_y pi y) on the vertex coordinates.
    """
    n = int(math.sqrt(n_vertices))
    if xy is None:
        idx = np.arange(n)
        x = (idx + 1) / (n + 1)
        xx, yy = np.meshgrid(x, x, indexing="xy")
        xx, yy = xx.ravel(), yy.ravel()
    else:
        xx, yy = np.asarray(xy)[:, 0], np.asarray(xy)[:, 1]

    cols = []
    while len(cols) < m:
        tx, ty = (n - 1) * rng.random(2) + 1
        if tx > n / 2 or ty > n / 2:
            t = np.sin(tx * np.pi * xx) * np.sin(ty * np.pi * yy)
            cols.append(t)
    Y = np.stack(cols, axis=1)
    return Y / np.linalg.norm(Y, axis=0, keepdims=True)


def uniform_probes(n_vertices: int, m: int,
                   rng: np.random.Generator) -> np.ndarray:
    """m unit vectors uniform on the sphere (loss.py:130-137)."""
    Y = rng.standard_normal((n_vertices, m))
    return Y / np.linalg.norm(Y, axis=0, keepdims=True)


# ----------------------------------------------------------- propagator
def error_apply(op: SparseOperator, diag: Array, omega: float,
                y: Array) -> Array:
    """One application of T = I - omega D^{-1} A, implicit (never built)."""
    ay = op.matvec(y)
    if y.ndim > 1:
        return y - omega * ay / diag[:, None]
    return y - omega * ay / diag


def damping_factor_gelfand(op: SparseOperator, diag: Array, omega: float,
                           probes: Array, k: int = 3) -> Array:
    """Gelfand estimate max_m ||T^k y_m||^{1/k} (loss.py:105-128).

    Differentiable w.r.t. diag. probes: [N, m] unit columns.
    """
    def body(_, y):
        return error_apply(op, diag, omega, y)

    y = jax.lax.fori_loop(0, k, body, probes)
    norms = jnp.linalg.norm(y, axis=0)
    return jnp.max(norms) ** (1.0 / k)


def dinv_a_spectrum(op: SparseOperator, diag) -> np.ndarray:
    """Spectrum of D^{-1} A (host, dense, eval-only).

    For symmetric A with positive diag, D^{-1}A is similar to the
    symmetric D^{-1/2} A D^{-1/2}, so `eigvalsh` applies — ~6x faster and
    exactly real. The damping factor of T = I - omega D^{-1}A for ANY
    omega is then max |1 - omega * spectrum| (one decomposition serves all
    omegas — used by the full-test-set evaluation drivers)."""
    A = np.asarray(op.to_dense(), dtype=np.float64)
    d = np.asarray(diag, dtype=np.float64)
    if (d > 0).all() and np.allclose(A, A.T, rtol=0.0,
                                     atol=1e-12 * np.abs(A).max()):
        s = 1.0 / np.sqrt(d)
        return np.linalg.eigvalsh(A * s[:, None] * s[None, :])
    return np.linalg.eigvals(A / d[:, None])


def damping_factor_exact(op: SparseOperator, diag: Array,
                         omega: float) -> float:
    """Exact |lambda|_max of T via dense eigvals (loss.py:59-64; eval only,
    not differentiable and O(N^3) — mirrors the reference's exact path).

    Runs on host: nonsymmetric eig has no TPU lowering, and the reference's
    exact path is likewise a dense eval-only escape (loss.py:57-64).
    """
    return float(np.max(np.abs(1.0 - omega * dinv_a_spectrum(op, diag))))


def optimal_omega(op: SparseOperator,
                  diag: Optional[Array] = None) -> float:
    """omega* = 2 / (lmax + lmin) of D^{-1} A (loss.py:221-233; dense,
    host-side eval-only)."""
    d = op.diagonal() if diag is None else diag
    evals = np.abs(dinv_a_spectrum(op, d))
    return float(2.0 / (np.max(evals) + np.min(evals)))


# ------------------------------------------------- stencil-resident path
def damping_factor_gelfand_stencil(planes, shifts, diag2d, omega: float,
                                   probes2d: Array, k: int = 3) -> Array:
    """Gelfand damping factor with the propagator applied as a grid
    stencil (jnp rolls; ops/pallas_stencil.stencil_matvec_jnp) instead of
    gather/segment-sum — differentiable w.r.t. `diag2d` (the trainable
    Jacobi diagonal), so training runs on the stencil fast path.

    planes:   [K, H, W] tap planes of A (host-built once, fixed)
    diag2d:   [H, W] trainable diagonal
    probes2d: [H, W, m] high-frequency probe block
    T = I - omega D^-1 A is formed implicitly: y - omega * (A y) / d.
    """
    from gnnla_tpu.ops.pallas_stencil import stencil_matvec_jnp

    def body(_, y):
        ay = stencil_matvec_jnp(planes, shifts, y)
        return y - omega * ay / diag2d[:, :, None]

    y = jax.lax.fori_loop(0, k, body, probes2d)
    norms = jnp.sqrt(jnp.sum(y * y, axis=(0, 1)))
    return jnp.max(norms) ** (1.0 / k)


# ------------------------------------------------- stream (SpMM) path
def damping_factor_gelfand_spmm(apply_fn, op_args, diag3: Array,
                                omega, probes4: Array,
                                k: int = 3) -> Array:
    """Gelfand damping factor with the propagator's A y applied by the
    multi-RHS stream kernel (ops/pallas_stream.StreamSpMM) — the
    unstructured-graph twin of `damping_factor_gelfand_stencil`: training
    the Jacobi diagonal on operators with no grid/band structure runs the
    T @ Y iteration (reference loss.py:105-128) on one shared-pack SpMM
    per step instead of m scatter-bound matvecs.

    apply_fn/op_args : a StreamSpMM's custom-VJP apply and packs (the
                       operator must be built on the kernel-order matrix;
                       with_transpose=True for training)
    diag3            : [t, 8, 128] trainable diagonal in padded kernel
                       order (pad entries 1); differentiable
    probes4          : [t, m*8, 128] probe block in SpMM input layout
                       (StreamSpMM.to_padded of an [n, m] probe matrix)
    """
    from gnnla_tpu.ops.pallas_stream import mrhs_out_to_in

    t, m8, _ = probes4.shape
    M = m8 // 8
    d4 = jnp.tile(diag3, (1, M, 1))

    def body(_, y4):
        ay = mrhs_out_to_in(apply_fn(op_args, y4))
        return y4 - omega * ay / d4

    y4 = jax.lax.fori_loop(0, k, body, probes4)
    norms = jnp.sqrt(jnp.sum(y4.reshape(t, M, 8, 128) ** 2,
                             axis=(0, 2, 3)))
    return jnp.max(norms) ** (1.0 / k)


# ------------------------------------------------------------ batch loss
def loss_batch_stacked(vals: Array, op_template: SparseOperator,
                       diags: Array, probes: Array,
                       omega: float = 2.0 / 3.0, k: int = 3) -> Array:
    """Mean damping factor over a batch of same-pattern matrices.

    TPU-first batching: datasets of FEM matrices on a fixed mesh share one
    sparsity pattern, so a batch is stacked values [B, E] + stacked diags
    [B, N] + stacked probes [B, N, m] vmapped over B — no PyG-style batch
    vector needed (contrast reference loss.py:185-203's per-graph loop).
    """
    def one(v, d, y):
        return damping_factor_gelfand(op_template.with_values(v), d, omega,
                                      y, k=k)

    return jnp.mean(jax.vmap(one)(vals, diags, probes))
