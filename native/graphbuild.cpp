// gnnla_tpu native runtime: graph building + AMG setup hot paths.
//
// The reference delegates its native needs to third-party extensions
// (torch_scatter's C++ segment ops, pyamg's C++ CLJP splitting — SURVEY.md
// §2.4). On TPU the *device* aggregation path is XLA/Pallas, but the
// host-side setup phase (COO coalescing, CSR conversion, C/F splitting on
// irregular data-dependent graphs) stays on the CPU and is worth native
// speed for large operators. This library is loaded via ctypes
// (gnnla_tpu/native_ext.py) with a pure-numpy fallback.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <random>
#include <vector>

extern "C" {

// Sort COO by (row, col) and sum duplicates. Returns the coalesced count.
// rows/cols/vals are rewritten in place (first n_out entries valid).
int64_t coalesce_coo(int64_t nnz, int64_t* rows, int64_t* cols, double* vals,
                     int64_t n_cols_matrix) {
  if (nnz <= 0) return 0;
  std::vector<int64_t> order(nnz);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    const __int128 ka = (__int128)rows[a] * n_cols_matrix + cols[a];
    const __int128 kb = (__int128)rows[b] * n_cols_matrix + cols[b];
    return ka < kb;
  });
  std::vector<int64_t> r(nnz), c(nnz);
  std::vector<double> v(nnz);
  for (int64_t i = 0; i < nnz; ++i) {
    r[i] = rows[order[i]];
    c[i] = cols[order[i]];
    v[i] = vals[order[i]];
  }
  int64_t out = 0;
  for (int64_t i = 0; i < nnz; ++i) {
    if (out > 0 && r[i] == rows[out - 1] && c[i] == cols[out - 1]) {
      vals[out - 1] += v[i];
    } else {
      rows[out] = r[i];
      cols[out] = c[i];
      vals[out] = v[i];
      ++out;
    }
  }
  return out;
}

// CSR row pointers from row-sorted COO rows.
void csr_row_ptr(int64_t nnz, const int64_t* rows, int64_t n_rows,
                 int64_t* row_ptr /* length n_rows+1 */) {
  std::memset(row_ptr, 0, sizeof(int64_t) * (n_rows + 1));
  for (int64_t i = 0; i < nnz; ++i) row_ptr[rows[i] + 1] += 1;
  for (int64_t i = 0; i < n_rows; ++i) row_ptr[i + 1] += row_ptr[i];
}

// CLJP coarse/fine splitting over a boolean strength graph in CSR form
// (S[i,j]=1 when j strongly influences i). Mirrors the two edge-removal
// heuristics of gnnla_tpu/amg/splitting.py::split_cljp (and the reference's
// pyamg CLJP usage at DirectInterpGNN.py:178). out[i] = 1 coarse, 0 fine.
void cljp_split(int64_t n, const int64_t* indptr, const int64_t* indices,
                uint64_t seed, int64_t* out) {
  constexpr int8_t UNDECIDED = -1, FINE = 0, COARSE = 1;
  // adjacency as dynamic sets (vector<bool> rows would be O(n^2) memory)
  std::vector<std::vector<int64_t>> deps(n);   // S_i (sorted)
  std::vector<std::vector<int64_t>> infl(n);   // S^T_i
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
      const int64_t j = indices[k];
      if (j == i) continue;
      deps[i].push_back(j);
      infl[j].push_back(i);
    }
  }
  std::vector<double> w(n);
  std::mt19937_64 gen(seed);
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  for (int64_t i = 0; i < n; ++i) w[i] = (double)infl[i].size() + uni(gen);

  std::vector<int8_t> state(n, UNDECIDED);
  for (int64_t i = 0; i < n; ++i)
    if (deps[i].empty() && infl[i].empty()) state[i] = FINE;

  auto erase_val = [](std::vector<int64_t>& vec, int64_t val) {
    auto it = std::find(vec.begin(), vec.end(), val);
    if (it != vec.end()) {
      *it = vec.back();
      vec.pop_back();
      return true;
    }
    return false;
  };
  auto contains = [](const std::vector<int64_t>& vec, int64_t val) {
    return std::find(vec.begin(), vec.end(), val) != vec.end();
  };

  int64_t undecided = 0;
  for (int64_t i = 0; i < n; ++i)
    if (state[i] == UNDECIDED) ++undecided;

  while (undecided > 0) {
    // independent set: local maxima of w over remaining strength edges
    std::vector<int64_t> new_c;
    for (int64_t i = 0; i < n; ++i) {
      if (state[i] != UNDECIDED) continue;
      bool is_max = true;
      for (int64_t j : deps[i])
        if (state[j] == UNDECIDED && w[j] >= w[i]) { is_max = false; break; }
      if (is_max)
        for (int64_t j : infl[i])
          if (state[j] == UNDECIDED && w[j] >= w[i]) { is_max = false; break; }
      if (is_max) new_c.push_back(i);
    }
    if (new_c.empty()) {
      for (int64_t i = 0; i < n; ++i)
        if (state[i] == UNDECIDED) { state[i] = FINE; }
      break;
    }
    for (int64_t c : new_c) { state[c] = COARSE; --undecided; }
    for (int64_t c : new_c) {
      // H1: remove edges c -> j, decrement w(j)
      for (int64_t j : deps[c]) {
        erase_val(infl[j], c);
        if (state[j] == UNDECIDED) w[j] -= 1.0;
      }
      deps[c].clear();
      // H2: for i depending on c, remove i -> j when j also depends on c
      std::vector<int64_t> dependents = infl[c];
      for (int64_t i : dependents) {
        erase_val(deps[i], c);
        erase_val(infl[c], i);
        std::vector<int64_t> row = deps[i];
        for (int64_t j : row) {
          if (contains(deps[j], c)) {
            erase_val(deps[i], j);
            erase_val(infl[j], i);
            if (state[j] == UNDECIDED) w[j] -= 1.0;
          }
        }
      }
      infl[c].clear();
    }
    for (int64_t i = 0; i < n; ++i) {
      if (state[i] == UNDECIDED && w[i] < 1.0) { state[i] = FINE; --undecided; }
    }
  }
  for (int64_t i = 0; i < n; ++i) out[i] = (state[i] == COARSE) ? 1 : 0;
}

// Vanek standard aggregation (Vanek/Mandel/Brezina 1996) over a
// SYMMETRIZED strength graph in CSR form (no self loops). Scan-order
// greedy — the packing density of the sequential passes is what gives
// smoothed aggregation its textbook convergence factor (random-MIS
// variants leave a thick attach fringe and measurably worse cycles).
//   pass 1: node with fully unaggregated neighborhood seeds an aggregate
//           of itself + its entire neighborhood;
//   pass 2: leftovers join the adjacent aggregate they have the most
//           connections to (ties -> lower aggregate id), based on the
//           pass-1 state;
//   pass 3: remaining nodes seed aggregates from what is left.
// out[i] = aggregate id; returns the number of aggregates.
int64_t vanek_aggregate(int64_t n, const int64_t* indptr,
                        const int64_t* indices, int64_t* agg) {
  std::fill(agg, agg + n, (int64_t)-1);
  int64_t na = 0;
  // pass 1
  for (int64_t i = 0; i < n; ++i) {
    if (agg[i] != -1 || indptr[i + 1] == indptr[i]) continue;
    bool free_nbhd = true;
    for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k)
      if (agg[indices[k]] != -1) { free_nbhd = false; break; }
    if (!free_nbhd) continue;
    agg[i] = na;
    for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k)
      agg[indices[k]] = na;
    ++na;
  }
  // pass 2 (reads the pass-1 snapshot, writes agg2)
  std::vector<int64_t> agg2(agg, agg + n);
  std::vector<int64_t> nbr_aggs;
  for (int64_t i = 0; i < n; ++i) {
    if (agg[i] != -1) continue;
    nbr_aggs.clear();
    for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
      const int64_t a = agg[indices[k]];
      if (a >= 0) nbr_aggs.push_back(a);
    }
    if (nbr_aggs.empty()) continue;
    std::sort(nbr_aggs.begin(), nbr_aggs.end());
    int64_t best = nbr_aggs[0], best_cnt = 1, cur = nbr_aggs[0], cnt = 1;
    for (size_t k = 1; k < nbr_aggs.size(); ++k) {
      if (nbr_aggs[k] == cur) ++cnt;
      else { cur = nbr_aggs[k]; cnt = 1; }
      if (cnt > best_cnt) { best = cur; best_cnt = cnt; }
    }
    agg2[i] = best;
  }
  std::copy(agg2.begin(), agg2.end(), agg);
  // pass 3
  for (int64_t i = 0; i < n; ++i) {
    if (agg[i] != -1) continue;
    agg[i] = na;
    for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k)
      if (agg[indices[k]] == -1) agg[indices[k]] = na;
    ++na;
  }
  return na;
}

}  // extern "C"
