"""Periodic 2D diffusion FEM: stiffness matrices for the DiffCoeffs models.

Reimplements the capability of /root/reference/pytorch/DiffCoeffs/FEM.py:49-239
— element stiffness K_e(i,j) for div(D grad u), D = diag(alpha(x,y),
beta(x,y)), bilinear quads of side h = 1/N on the periodic unit square —
*without* sympy. The reference integrates symbolically and caches with dill;
the diffusion fields are smooth (cos^2 of frequency <= max_freq), so a fixed
tensor-product Gauss rule evaluates the same element integrals to near machine
precision, vectorized over all N^2 elements at once (no per-element lambdify).

Diffusion families (reference FEM.py:184-239):
  * constant:           alpha, beta constants
  * cosine:             alpha = cos^2(2 pi tx x) cos^2(2 pi ty y) + 0.1
                        beta  likewise with its own thetas
  * cosine+convection:  adds convection field (0.1, 0) — integrand gains
                        -(c phi_k) . grad phi_l
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
import scipy.sparse as sp

from gnnla_tpu.ops.sparse import SparseOperator

# Tensor-product Gauss-Legendre rule per element (order 8: exact to ~1e-14
# for the cos^2 fields at the reference's frequencies/mesh sizes).
_NQ = 8
_QP, _QW = np.polynomial.legendre.leggauss(_NQ)


def _basis_and_grads(xi, nu):
    """Bilinear basis on the reference square [0,1]^2 at points (xi, nu).

    Node order (reference FEM.py element_to_index_map): (0,0), (1,0), (1,1),
    (0,1) scaled by h. Returns phi [q,4], dphi/dxi [q,4], dphi/dnu [q,4].
    """
    phi = np.stack([(1 - xi) * (1 - nu), xi * (1 - nu),
                    xi * nu, (1 - xi) * nu], axis=-1)
    dxi = np.stack([-(1 - nu), (1 - nu), nu, -nu], axis=-1)
    dnu = np.stack([-(1 - xi), -xi, xi, (1 - xi)], axis=-1)
    return phi, dxi, dnu


def element_stiffness_field(
        n: int,
        alpha_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
        beta_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
        convection: Optional[Tuple[float, float]] = None,
        reference_symmetrized: bool = False) -> np.ndarray:
    """All element stiffness matrices at once: returns [n*n, 4, 4].

    Element (i, j) spans [i h, (i+1) h] x [j h, (j+1) h], h = 1/n.

    `reference_symmetrized=True` reproduces the reference's assembly quirk
    bit-for-distribution: FEM.py:122-128 computes only the k <= l integral
    and mirrors K_e[l,k] = K_e[k,l], silently symmetrizing the convection
    term (half the advection is lost). Default False assembles the true
    nonsymmetric integral; flip it on to train/evaluate on exactly the
    reference's data distribution.
    """
    h = 1.0 / n
    # reference points on [0,1]
    pts = 0.5 * (_QP + 1.0)
    wts = 0.5 * _QW
    XI, NU = np.meshgrid(pts, pts, indexing="ij")
    W = np.outer(wts, wts).ravel()              # [q]
    xi, nu = XI.ravel(), NU.ravel()

    phi, dxi, dnu = _basis_and_grads(xi, nu)    # [q, 4]
    # physical grads: d/dx = (1/h) d/dxi, d/dy = (1/h) d/dnu; dA = h^2 W
    i_idx = np.arange(n)
    ex, ey = np.meshgrid(i_idx, i_idx, indexing="ij")   # element (i, j)
    ex, ey = ex.ravel(), ey.ravel()                     # [E] (i fastest? no)
    # reference assembly iterates elem_idx with i = idx % n, j = idx // n
    # (FEM.py:154-170); build coords accordingly below in `assemble`.

    x = (ex[:, None] + xi[None, :]) * h          # [E, q]
    y = (ey[:, None] + nu[None, :]) * h
    a = alpha_fn(x, y)                           # [E, q]
    b = beta_fn(x, y)

    # grad.grad terms: (1/h^2) * h^2 = 1 -> no h factor on diffusion part
    ke = np.einsum("q,eq,qi,qj->eij", W, a, dxi, dxi) \
        + np.einsum("q,eq,qi,qj->eij", W, b, dnu, dnu)
    if convection is not None:
        # integrand is (D grad phi_k - c phi_k) . grad phi_l (FEM.py:122-128);
        # the convection part integrates to -h * sum_q W c.grad(phi_l) phi_k
        cx, cy = convection
        conv = (cx * np.einsum("q,qk,ql->kl", W, phi, dxi)
                + cy * np.einsum("q,qk,ql->kl", W, phi, dnu))
        ke = ke - h * conv[None, :, :]
        if reference_symmetrized:
            # keep the k <= l integrals, mirror them below the diagonal
            ke = np.triu(ke) + np.triu(ke, 1).transpose(0, 2, 1)
    # element (i,j) of the E axis is laid out with i = e % n, j = e // n
    # but we built it i-major; reorder to match reference elem indexing
    order = (ey * n + ex).argsort(kind="stable")
    return ke[order]


def element_to_index_map(k: int, n: int) -> np.ndarray:
    """Periodic vertex indices of element k (reference FEM.py:130-152)."""
    s = np.empty(4, dtype=np.int64)
    s[0] = k
    s[1] = k + 1
    s[2] = k + n + 1
    s[3] = k + n
    if k >= n * (n - 1):          # top row wraps
        s[3] = k - n * (n - 1)
        s[2] = 0 if k == n * n - 1 else s[3] + 1
    if (k + 1) % n == 0:          # right column wraps
        s[1] = k - (n - 1)
        if k != n * n - 1:
            s[2] = s[1] + n
    return s


def assemble_periodic(ke: np.ndarray, n: int) -> sp.coo_matrix:
    """Scatter [n*n, 4, 4] element matrices into the periodic global K.

    Matches the reference's entry pattern (FEM.py:154-182): per element it
    adds the 4 vertex self terms, the 8 edge terms and the 4 corner terms —
    i.e. all 16 entries of K_e.
    """
    maps = np.stack([element_to_index_map(k, n) for k in range(n * n)])
    rows = np.repeat(maps, 4, axis=1).ravel()
    cols = np.tile(maps, (1, 4)).ravel()
    K = sp.coo_matrix((ke.reshape(-1), (rows, cols)), shape=(n * n, n * n))
    K.sum_duplicates()
    return K


def cosine_field(theta_x: float, theta_y: float):
    def fn(x, y):
        return (np.cos(theta_x * 2 * np.pi * x) ** 2
                * np.cos(theta_y * 2 * np.pi * y) ** 2 + 0.1)
    return fn


def constant_field(value: float):
    def fn(x, y):
        return np.full_like(x, value)
    return fn


def constant_diffusion_matrix(alpha: float, beta: float, n: int, *,
                              dtype=None) -> SparseOperator:
    import jax.numpy as jnp
    ke = element_stiffness_field(n, constant_field(alpha),
                                 constant_field(beta))
    return SparseOperator.from_scipy(assemble_periodic(ke, n),
                                     dtype=dtype or jnp.float32)


def cosine_diffusion_matrix(thetas, n: int, *, convection=None,
                            reference_symmetrized: bool = False,
                            dtype=None) -> SparseOperator:
    """thetas = (theta_alpha_x, theta_alpha_y, theta_beta_x, theta_beta_y),
    matching CosineDiffusionFEM_Builder.generate_problem_stiffness_matrix."""
    import jax.numpy as jnp
    tax, tay, tbx, tby = thetas
    ke = element_stiffness_field(n, cosine_field(tax, tay),
                                 cosine_field(tbx, tby),
                                 convection=convection,
                                 reference_symmetrized=reference_symmetrized)
    return SparseOperator.from_scipy(assemble_periodic(ke, n),
                                     dtype=dtype or jnp.float32)


def alpha_beta_targets(thetas, n: int):
    """Per-vertex (alpha_i, beta_i) regression targets on the vertex grid,
    reference data.py:139-146 (note: *without* the +0.1 offset, matching
    RandomCosineDiffusionDataset.get_alpha_beta_ij)."""
    tax, tay, tbx, tby = thetas
    xs = np.linspace(0, 1, n)
    ys = np.linspace(0, 1, n)
    X, Y = np.meshgrid(xs, ys, indexing="xy")
    alpha = (np.cos(tax * 2 * np.pi * X) ** 2
             * np.cos(tay * 2 * np.pi * Y) ** 2).ravel()
    beta = (np.cos(tbx * 2 * np.pi * X) ** 2
            * np.cos(tby * 2 * np.pi * Y) ** 2).ravel()
    return alpha, beta
