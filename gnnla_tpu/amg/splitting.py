"""Coarse/fine splitting for AMG — replaces pyamg's native CLJP.

The reference calls pyamg's C++ `CLJP` splitting (DirectInterpGNN.py:178,194;
VCycle.py:46,114); the MATLAB variant shows that a trivial alternating
splitting is also acceptable for the oracle tests (test_vcycle.m:66-67,
test_direct_interpolation.m:64-65).

These are irregular, data-dependent host algorithms, so (like the reference)
they run host-side in numpy during the AMG *setup* phase, seeded for
reproducibility. Three splittings:

  * `split_alternating` — C = every other point (MATLAB parity fixture)
  * `split_pmis`        — parallel modified independent set (Sterck/Yang/Heys)
  * `split_cljp`        — Cleary-Luby-Jones-Plassmann with both edge-removal
                          heuristics (the reference's default)

Input is the boolean strength matrix S (S[i, j] True when j strongly
influences i, i.e. edge i->j is strong) as scipy CSR; output is an int array
with 1 = coarse, 0 = fine.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

UNDECIDED, FINE, COARSE = -1, 0, 1


def split_alternating(n: int) -> np.ndarray:
    out = np.zeros(n, dtype=np.int64)
    out[::2] = 1
    return out


def _strength_csr(S) -> sp.csr_matrix:
    S = sp.csr_matrix(S, copy=True)
    S.data = (S.data != 0).astype(np.int8)
    S.eliminate_zeros()
    S.setdiag(0)
    S.eliminate_zeros()
    return S


def split_pmis(S, seed: int = 0) -> np.ndarray:
    """PMIS: weights |S^T_i| + rand; iteratively pick distance-1 independent
    local maxima as C, mark their strong neighbors F.

    Fully vectorized over the strength graph — each round is a handful of
    O(nnz) sparse passes (the round count is the independent-set depth,
    ~O(log n)), so million-row setups take seconds, matching the role of
    pyamg's native splittings in the reference (VCycle.py:114)."""
    S = _strength_csr(S)
    n = S.shape[0]
    rng = np.random.default_rng(seed)
    influence = np.asarray(S.sum(axis=0)).ravel()  # |S^T_i|
    w = influence + rng.random(n)                  # strictly positive
    state = np.full(n, UNDECIDED, dtype=np.int64)
    state[(influence == 0) & (np.asarray(S.sum(axis=1)).ravel() == 0)] = FINE

    G = ((S + S.T) > 0).astype(np.int8).tocsr()  # symmetrised strength graph
    rows = np.repeat(np.arange(n), np.diff(G.indptr))
    cols = G.indices

    while np.any(state == UNDECIDED):
        active = state == UNDECIDED
        w_active = np.where(active, w, 0.0)
        # per-row max of active neighbor weights, one vectorized pass
        neigh_max = np.zeros(n)
        np.maximum.at(neigh_max, rows, w_active[cols])
        new_c = active & (w_active > neigh_max)
        if not np.any(new_c):  # isolated undecided points
            state[active] = FINE
            break
        state[new_c] = COARSE
        # strong neighbors of new C points become F
        touched = new_c[rows]
        nbrs = cols[touched]
        state[nbrs[state[nbrs] == UNDECIDED]] = FINE
    state[state == UNDECIDED] = FINE
    return (state == COARSE).astype(np.int64)


def split_cljp(S, seed: int = 0) -> np.ndarray:
    """CLJP splitting with the two classic edge-removal heuristics.

    H1: once c is C, values at c are not interpolated, so edges c->j lose
        value: remove them and decrement w(j).
    H2: if i and j both strongly depend on a common new C point and j also
        influences i, j is less valuable to i: remove edge i->j, decrement w(j).
    Any undecided point whose remaining weight < 1 becomes F.
    """
    S = _strength_csr(S).tolil()
    n = S.shape[0]
    rng = np.random.default_rng(seed)
    # weight = how many points i strongly influences (column count of S)
    influence = np.zeros(n)
    rows_sets = [set(row) for row in S.rows]  # S_i: strong deps of i
    cols_sets = [set() for _ in range(n)]      # S^T_i
    for i, deps in enumerate(rows_sets):
        for j in deps:
            influence[j] += 1
            cols_sets[j].add(i)
    w = influence + rng.random(n)
    state = np.full(n, UNDECIDED, dtype=np.int64)
    # isolated points: no strong connections either way -> F
    for i in range(n):
        if not rows_sets[i] and not cols_sets[i]:
            state[i] = FINE

    def neighborhood(i):
        return rows_sets[i] | cols_sets[i]

    while np.any(state == UNDECIDED):
        undecided = np.flatnonzero(state == UNDECIDED)
        # independent set: local maxima of w over remaining strength edges
        new_c = []
        for i in undecided:
            nbrs = [j for j in neighborhood(i) if state[j] == UNDECIDED]
            if all(w[i] > w[j] for j in nbrs):
                new_c.append(i)
        if not new_c:
            state[undecided] = FINE
            break
        for c in new_c:
            state[c] = COARSE
        for c in new_c:
            # H1: remove edges c -> j (c no longer needs to interpolate)
            for j in list(rows_sets[c]):
                rows_sets[c].discard(j)
                cols_sets[j].discard(c)
                if state[j] == UNDECIDED:
                    w[j] -= 1.0
            # H2: for each i strongly depending on c, edges i -> j where j
            # also strongly depends on c lose value
            for i in list(cols_sets[c]):
                rows_sets[i].discard(c)
                cols_sets[c].discard(i)
                for j in list(rows_sets[i]):
                    if c in rows_sets[j]:  # j also strongly depends on c
                        rows_sets[i].discard(j)
                        cols_sets[j].discard(i)
                        if state[j] == UNDECIDED:
                            w[j] -= 1.0
        # F assignment: weight fell below 1
        for i in np.flatnonzero(state == UNDECIDED):
            if w[i] < 1.0:
                state[i] = FINE
    state[state == UNDECIDED] = FINE
    return (state == COARSE).astype(np.int64)


_SPLITTERS = {
    "alternating": lambda S, seed=0: split_alternating(S.shape[0]),
    "pmis": split_pmis,
    "cljp": split_cljp,
}


def split(S, method: str = "cljp", seed: int = 0) -> np.ndarray:
    if method == "cljp":
        # prefer the C++ runtime when built (native/graphbuild.cpp) — same
        # role pyamg's native CLJP plays for the reference (VCycle.py:114)
        from gnnla_tpu import native_ext
        if native_ext.available():
            return native_ext.cljp_split(S, seed=seed)
    try:
        fn = _SPLITTERS[method]
    except KeyError:
        raise ValueError(f"unknown splitting {method!r}") from None
    return fn(S, seed=seed)
