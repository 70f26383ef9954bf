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

// Reverse Cuthill-McKee ordering of a symmetric-pattern CSR graph —
// the host reorder phase of the stream SpMV kernel
// (ops/pallas_stream.py::rcm_csr). scipy's single-threaded RCM was ~90%
// of the general-fixture setup at 37M nnz (VERDICT r4 weak #4); this is
// the same George-Liu algorithm in flat arrays:
//   per component: pseudo-peripheral start (repeated BFS until the
//   eccentricity stops growing), then Cuthill-McKee BFS visiting each
//   node's unvisited neighbors in ascending-degree order; the final
//   order is reversed. perm[k] = old index of the k-th node in RCM order
//   (matches scipy.sparse.csgraph.reverse_cuthill_mckee).
void rcm_order(int64_t n, const int64_t* indptr, const int64_t* indices,
               int64_t* perm) {
  const int64_t nnz = indptr[n];
  // Bandwidth is a property of the SYMMETRIZED pattern (|i - j| of any
  // entry, either triangle), so traversal must follow out- AND in-edges;
  // build the transpose adjacency once (counting sort, O(nnz)).
  std::vector<int64_t> t_indptr(n + 1, 0), t_indices(nnz);
  for (int64_t k = 0; k < nnz; ++k) t_indptr[indices[k] + 1] += 1;
  for (int64_t i = 0; i < n; ++i) t_indptr[i + 1] += t_indptr[i];
  {
    std::vector<int64_t> cur(t_indptr.begin(), t_indptr.end() - 1);
    for (int64_t u = 0; u < n; ++u)
      for (int64_t k = indptr[u]; k < indptr[u + 1]; ++k)
        t_indices[cur[indices[k]]++] = u;
  }
  // union degree (upper bound — duplicates across the two directions are
  // fine, it is only a BFS tie-break key)
  auto deg = [&](int64_t i) {
    return (indptr[i + 1] - indptr[i]) + (t_indptr[i + 1] - t_indptr[i]);
  };
  auto for_neighbors = [&](int64_t u, auto&& f) {
    for (int64_t k = indptr[u]; k < indptr[u + 1]; ++k) f(indices[k]);
    for (int64_t k = t_indptr[u]; k < t_indptr[u + 1]; ++k) f(t_indices[k]);
  };

  std::vector<int64_t> order;  // CM order, reversed at the end
  order.reserve(n);
  std::vector<int64_t> frontier, next;

  // nodes by ascending degree: component starts pick the global minimum
  std::vector<int64_t> by_deg(n);
  std::iota(by_deg.begin(), by_deg.end(), 0);
  std::sort(by_deg.begin(), by_deg.end(),
            [&](int64_t a, int64_t b) { return deg(a) < deg(b); });

  std::vector<uint8_t> visited(n, 0);
  // scratch BFS for the pseudo-peripheral search (separate marks so the
  // main `visited` stays clean until the real CM pass). Restricted to
  // UNVISITED nodes: wandering into a finished component would restart
  // CM from a visited node and corrupt the permutation.
  std::vector<int64_t> mark(n, -1);
  int64_t mark_gen = 0;

  size_t scan = 0;
  int64_t n_done = 0;
  while (n_done < n) {
    while (scan < by_deg.size() && visited[by_deg[scan]]) ++scan;
    int64_t start = by_deg[scan];

    // George-Liu pseudo-peripheral: BFS, restart from the min-degree
    // node of the last level while the eccentricity grows (<= 8 rounds)
    int64_t ecc = -1;
    for (int round = 0; round < 8; ++round) {
      ++mark_gen;
      frontier.assign(1, start);
      mark[start] = mark_gen;
      int64_t depth = 0;
      int64_t best_last = start;
      while (!frontier.empty()) {
        next.clear();
        for (int64_t u : frontier)
          for_neighbors(u, [&](int64_t v) {
            if (!visited[v] && mark[v] != mark_gen) {
              mark[v] = mark_gen;
              next.push_back(v);
            }
          });
        if (next.empty()) break;
        frontier.swap(next);
        ++depth;
        best_last = frontier[0];
        for (int64_t v : frontier)
          if (deg(v) < deg(best_last)) best_last = v;
      }
      if (depth <= ecc) break;
      ecc = depth;
      start = best_last;
    }

    // Cuthill-McKee BFS from `start`
    visited[start] = 1;
    const size_t comp_begin = order.size();
    order.push_back(start);
    std::vector<std::pair<int64_t, int64_t>> nbrs;  // (deg, node)
    for (size_t head = comp_begin; head < order.size(); ++head) {
      const int64_t u = order[head];
      nbrs.clear();
      for_neighbors(u, [&](int64_t v) {
        if (!visited[v]) { visited[v] = 1; nbrs.emplace_back(deg(v), v); }
      });
      std::sort(nbrs.begin(), nbrs.end());
      for (auto& dv : nbrs) order.push_back(dv.second);
    }
    n_done += (int64_t)(order.size() - comp_begin);
  }
  for (int64_t i = 0; i < n; ++i) perm[i] = order[n - 1 - i];
}

// B = A[perm][:, perm] for CSR A with float32 data, output row-sorted —
// the other half of rcm_csr (scipy's double fancy-index + sort_indices
// was a multi-second host phase at 37M nnz). Rows are independent.
void csr_permute_sym(int64_t n, const int64_t* indptr,
                     const int64_t* indices, const float* data,
                     const int64_t* perm, int64_t* out_indptr,
                     int64_t* out_indices, float* out_data) {
  std::vector<int64_t> iperm(n);
  for (int64_t i = 0; i < n; ++i) iperm[perm[i]] = i;
  out_indptr[0] = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t r = perm[i];
    out_indptr[i + 1] = out_indptr[i] + (indptr[r + 1] - indptr[r]);
  }
#pragma omp parallel
  {
    std::vector<std::pair<int64_t, float>> row;
#pragma omp for schedule(dynamic, 1024)
    for (int64_t i = 0; i < n; ++i) {
      const int64_t r = perm[i];
      row.clear();
      for (int64_t k = indptr[r]; k < indptr[r + 1]; ++k)
        row.emplace_back(iperm[indices[k]], data[k]);
      std::sort(row.begin(), row.end(),
                [](const std::pair<int64_t, float>& a,
                   const std::pair<int64_t, float>& b) {
                  return a.first < b.first;
                });
      int64_t o = out_indptr[i];
      for (auto& cv : row) {
        out_indices[o] = cv.first;
        out_data[o] = cv.second;
        ++o;
      }
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------
// Stream-SpMV packer: the host setup phase of ops/pallas_stream.py.
//
// Produces the exact StreamFormat arrays of the numpy reference packer
// (build_stream), bit-identical — the numpy path remains the executable
// spec and the fallback; this native path exists because the packer is
// ~6 memory-bound numpy passes over nnz (43 s at 37M nnz in round 3),
// while a per-tile counting-sort in C++ is one cache-resident pass.
//
// Layout recap (see StreamFormat docstring): elements are keyed by
//   tile   = row / 1024         (output tile)
//   rg     = (row % 1024) / 128 (row group = deposit sublane)
//   cls    = (col - start_sc[tile]*1024) >> (10 - kb)  (chunk class)
//   region = occurrence within the (row, cls) run / 8  (RUNCAP split)
// Groups are 128-lane chunks of each (tile, rg, cls, region) bin in CSR
// order; groups are ordered (cls, rg, region, chunk) within a tile and
// packed 8 per unit within each (tile, sc = cls>>kb) run; tiles pad to
// >= nb units and the total pads to a multiple of nb.

namespace {
constexpr int64_t S_TILE = 1024;
constexpr int64_t S_NSUB = 8;
constexpr int64_t S_RUNCAP = 8;
}  // namespace

extern "C" {

// Pass 1: window + kb selection + unit counting.
// header out: [0] w_sc, [1] kb, [2] n_tiles, [3] n_units, [4] n_steps,
//             [5] status (0 ok, 1 window too wide, 3 kb-space too big).
void stream_pack_plan(int64_t n, int64_t n_cols, int64_t nnz,
                      const int64_t* indptr, const int64_t* cols,
                      int64_t nb, int64_t kb_in, int64_t min_w_sc,
                      int64_t* header, int64_t* tile_wstart,
                      int64_t* unit_offsets) {
  const int64_t n_tiles = (n + S_TILE - 1) / S_TILE;
  header[2] = n_tiles;
  header[5] = 0;
  // --- per-tile column windows (min col = first of row, max = last) ----
  std::vector<int64_t> max_c(n_tiles, 0);
  for (int64_t t = 0; t < n_tiles; ++t) {
    const int64_t r0 = t * S_TILE, r1 = std::min(n, (t + 1) * S_TILE);
    int64_t mn = -1, mx = 0;
    for (int64_t r = r0; r < r1; ++r) {
      if (indptr[r + 1] == indptr[r]) continue;
      const int64_t c0 = cols[indptr[r]], c1 = cols[indptr[r + 1] - 1];
      if (mn < 0 || c0 < mn) mn = c0;
      if (c1 > mx) mx = c1;
    }
    tile_wstart[t] = (mn < 0) ? 0 : mn / S_TILE;
    max_c[t] = (mn < 0) ? 0 : mx;
  }
  int64_t w_sc = 1;
  for (int64_t t = 0; t < n_tiles; ++t)
    w_sc = std::max(w_sc, (max_c[t] - tile_wstart[t] * S_TILE) / S_TILE + 1);
  w_sc = std::max(w_sc, min_w_sc);
  const int64_t lx_tiles = (n_cols + S_TILE - 1) / S_TILE;
  if (w_sc > lx_tiles) { header[5] = 1; return; }
  for (int64_t t = 0; t < n_tiles; ++t)
    tile_wstart[t] = std::min(tile_wstart[t], lx_tiles - w_sc);
  header[0] = w_sc;

  // --- kb selection: counts over (trg, cls3), aggregate for k < 3 ------
  int64_t kb = kb_in;
  if (kb < 0) {
    int64_t n_trg = 1;
    for (int64_t t = n_tiles - 1; t >= 0; --t) {
      const int64_t r0 = t * S_TILE, r1 = std::min(n, (t + 1) * S_TILE);
      bool found = false;
      for (int64_t r = r1 - 1; r >= r0; --r)
        if (indptr[r + 1] > indptr[r]) { n_trg = r / 128 + 1; found = true; break; }
      if (found) break;
    }
    const int64_t space3 = n_trg * (w_sc << 3);
    if (space3 > (int64_t)1 << 26) { header[5] = 3; return; }
    std::vector<int32_t> cnt3(space3, 0);
    for (int64_t r = 0; r < n; ++r) {
      const int64_t trg = r / 128, ws = tile_wstart[r / S_TILE] * S_TILE;
      const int64_t base = trg * (w_sc << 3);
      for (int64_t e = indptr[r]; e < indptr[r + 1]; ++e)
        cnt3[base + ((cols[e] - ws) >> 7)]++;
    }
    int64_t best_cost = -1;
    for (int64_t k = 0; k < 4; ++k) {
      const int64_t width = (int64_t)1 << (3 - k);  // cls3 per cls_k
      int64_t groups = 0;
      const int64_t per_trg3 = w_sc << 3;
      for (int64_t g = 0; g < n_trg; ++g) {
        const int32_t* row = cnt3.data() + g * per_trg3;
        for (int64_t c = 0; c < (w_sc << k); ++c) {
          int64_t s = 0;
          for (int64_t j = 0; j < width; ++j) s += row[c * width + j];
          groups += (s + 127) / 128;
        }
      }
      const int64_t cost = groups * 128 * (7 * (8 >> k) + 45);
      if (best_cost < 0 || cost < best_cost) { best_cost = cost; kb = k; }
    }
  }
  header[1] = kb;

  // --- per-tile unit counting ------------------------------------------
  std::vector<int32_t> e_cls, e_reg;   // per-element scratch (reused)
  std::vector<int32_t> bins;           // (cls*8+rg)*R + region counts
  std::vector<int64_t> groups_sc(w_sc, 0);
  for (int64_t t = 0; t < n_tiles; ++t) {
    const int64_t r0 = t * S_TILE, r1 = std::min(n, (t + 1) * S_TILE);
    const int64_t e0 = indptr[r0], e1 = indptr[r1];
    const int64_t m = e1 - e0, ws = tile_wstart[t] * S_TILE;
    if (m == 0) { unit_offsets[t] = 0; continue; }
    e_cls.resize(m); e_reg.resize(m);
    int64_t R = 1;
    for (int64_t r = r0; r < r1; ++r) {
      int64_t run_cls = -1, run_len = 0;
      for (int64_t e = indptr[r]; e < indptr[r + 1]; ++e) {
        const int64_t cls = (cols[e] - ws) >> (10 - kb);
        run_len = (cls == run_cls) ? run_len + 1 : 0;
        run_cls = cls;
        const int64_t reg = run_len / S_RUNCAP;
        e_cls[e - e0] = (int32_t)cls;
        e_reg[e - e0] = (int32_t)reg;
        if (reg + 1 > R) R = reg + 1;
      }
    }
    const int64_t n_bins = (w_sc << kb) * 8 * R;
    bins.assign(n_bins, 0);
    for (int64_t r = r0; r < r1; ++r) {
      const int32_t rg = (int32_t)((r % S_TILE) / 128);
      for (int64_t e = indptr[r]; e < indptr[r + 1]; ++e) {
        const int64_t i = e - e0;
        bins[((int64_t)e_cls[i] * 8 + rg) * R + e_reg[i]]++;
      }
    }
    std::fill(groups_sc.begin(), groups_sc.end(), 0);
    for (int64_t b = 0; b < n_bins; ++b)
      if (bins[b]) {
        const int64_t cls = b / (8 * R);
        groups_sc[cls >> kb] += (bins[b] + 127) / 128;
      }
    int64_t units = 0;
    for (int64_t s = 0; s < w_sc; ++s)
      units += (groups_sc[s] + S_NSUB - 1) / S_NSUB;
    unit_offsets[t] = units;
  }
  // pad each tile to >= nb units; pad the total to a multiple of nb
  // (tail pads belong to the last tile). unit_offsets[t] becomes the
  // tile's unit START; [n_tiles] the padded total.
  int64_t total = 0;
  for (int64_t t = 0; t < n_tiles; ++t) {
    const int64_t p = std::max(unit_offsets[t], nb);
    unit_offsets[t] = total;
    total += p;
  }
  const int64_t pad_tail = (nb - (total % nb)) % nb;
  total += pad_tail;
  unit_offsets[n_tiles] = total;
  header[3] = total;
  header[4] = total / nb;
}

// Pass 2: fill the packed arrays. unit_offsets/tile_wstart/header are the
// plan outputs; all output buffers must be zero-initialised by the caller.
void stream_pack_fill(int64_t n, int64_t nnz,
                      const int64_t* indptr, const int64_t* cols,
                      const float* vals, int64_t nb,
                      const int64_t* header, const int64_t* tile_wstart,
                      const int64_t* unit_offsets,
                      int32_t* meta,          // [n_steps * nb]
                      int32_t* gmeta,         // [n_units * NSUB]
                      int32_t* step_meta,     // [n_steps * 8]
                      int32_t* out_idx,       // [n_steps]
                      int32_t* word,          // [n_units * NSUB * 128]
                      float* vals_out,        // [n_units * NSUB * 128]
                      int32_t* tile_of_unit) {  // [n_units]
  const int64_t w_sc = header[0], kb = header[1], n_tiles = header[2];
  const int64_t n_units = header[3], n_steps = header[4];

  std::vector<int32_t> e_cls, e_reg;
  std::vector<int32_t> bins;
  std::vector<int64_t> bin_first_k, bin_pos;
  std::vector<int64_t> groups_sc(w_sc), unit_base_sc(w_sc);
  std::vector<int32_t> cur_rowl, cur_lane;  // per (local unit, sub)

  for (int64_t t = 0; t < n_tiles; ++t) {
    const int64_t u0 = unit_offsets[t], u1 = unit_offsets[t + 1];
    const int32_t par = (int32_t)(t % 2);
    for (int64_t u = u0; u < u1; ++u) {
      tile_of_unit[u] = (int32_t)t;
      meta[u] = par << 15;
      for (int64_t s = 0; s < S_NSUB; ++s) gmeta[u * S_NSUB + s] = par << 7;
    }
    const int64_t r0 = t * S_TILE, r1 = std::min(n, (t + 1) * S_TILE);
    const int64_t e0 = indptr[r0], e1 = indptr[r1];
    const int64_t m = e1 - e0, ws = tile_wstart[t] * S_TILE;
    if (m == 0) continue;
    e_cls.resize(m); e_reg.resize(m);
    int64_t R = 1;
    for (int64_t r = r0; r < r1; ++r) {
      int64_t run_cls = -1, run_len = 0;
      for (int64_t e = indptr[r]; e < indptr[r + 1]; ++e) {
        const int64_t cls = (cols[e] - ws) >> (10 - kb);
        run_len = (cls == run_cls) ? run_len + 1 : 0;
        run_cls = cls;
        const int64_t reg = run_len / S_RUNCAP;
        e_cls[e - e0] = (int32_t)cls;
        e_reg[e - e0] = (int32_t)reg;
        if (reg + 1 > R) R = reg + 1;
      }
    }
    const int64_t n_bins = (w_sc << kb) * 8 * R;
    bins.assign(n_bins, 0);
    for (int64_t r = r0; r < r1; ++r) {
      const int32_t rg = (int32_t)((r % S_TILE) / 128);
      for (int64_t e = indptr[r]; e < indptr[r + 1]; ++e) {
        const int64_t i = e - e0;
        bins[((int64_t)e_cls[i] * 8 + rg) * R + e_reg[i]]++;
      }
    }
    // group bases: bins in (cls, rg, region) order; per-sc group counters
    bin_first_k.assign(n_bins, 0);
    std::fill(groups_sc.begin(), groups_sc.end(), 0);
    for (int64_t b = 0; b < n_bins; ++b) {
      if (!bins[b]) continue;
      const int64_t sc = (b / (8 * R)) >> kb;
      bin_first_k[b] = groups_sc[sc];
      groups_sc[sc] += (bins[b] + 127) / 128;
    }
    int64_t ub = 0;
    int64_t n_local_units = 0;
    for (int64_t s = 0; s < w_sc; ++s) {
      unit_base_sc[s] = ub;
      ub += (groups_sc[s] + S_NSUB - 1) / S_NSUB;
    }
    n_local_units = ub;
    cur_rowl.assign(n_local_units * S_NSUB, -1);
    cur_lane.assign(n_local_units * S_NSUB, 0);
    bin_pos.assign(n_bins, 0);
    for (int64_t r = r0; r < r1; ++r) {
      const int32_t rg = (int32_t)((r % S_TILE) / 128);
      const int32_t rowl = (int32_t)(r % 128);
      for (int64_t e = indptr[r]; e < indptr[r + 1]; ++e) {
        const int64_t i = e - e0;
        const int64_t cls = e_cls[i];
        const int64_t b = (cls * 8 + rg) * R + e_reg[i];
        const int64_t p = bin_pos[b]++;
        const int64_t k_in_sc = bin_first_k[b] + p / 128;
        const int64_t lane = p % 128;
        const int64_t sc = cls >> kb;
        const int64_t clslow = cls & (((int64_t)1 << kb) - 1);
        const int64_t lu = unit_base_sc[sc] + k_in_sc / S_NSUB;
        const int64_t sub = k_in_sc % S_NSUB;
        const int64_t u = u0 + lu;
        const int64_t g = lu * S_NSUB + sub;           // tile-local group
        const int64_t slot = (u * S_NSUB + sub) * 128;
        const int64_t local = cols[e] - ws;
        word[slot + lane] |= (int32_t)(((rowl + 1) << 18) |
                                       (((local >> 7) & 7) << 7) |
                                       (local & 127) | (clslow << 26));
        vals_out[slot + lane] = vals[e];
        if (lane == 0) {
          meta[u] |= (int32_t)sc;
          gmeta[u * S_NSUB + sub] |= (int32_t)(rg | (clslow << 3));
        }
        if (cur_rowl[g] != rowl) {
          if (cur_rowl[g] >= 0)
            word[slot + cur_rowl[g]] |= (cur_lane[g] + 1) << 10;
          cur_rowl[g] = rowl;
        }
        cur_lane[g] = (int32_t)lane;
      }
    }
    // commit trailing dep per group
    for (int64_t g = 0; g < n_local_units * S_NSUB; ++g) {
      if (cur_rowl[g] < 0) continue;
      const int64_t u = u0 + g / S_NSUB, sub = g % S_NSUB;
      word[(u * S_NSUB + sub) * 128 + cur_rowl[g]] |= (cur_lane[g] + 1) << 10;
    }
  }

  // pad-lane clslow: numpy broadcasts clslow over ALL 128 lanes of a real
  // group, including pad lanes (word 0 there otherwise). Fix up: for every
  // (unit, sub) with any real lane, OR clslow<<26 into all its lanes.
  for (int64_t u = 0; u < n_units; ++u)
    for (int64_t s = 0; s < S_NSUB; ++s) {
      const int64_t slot = (u * S_NSUB + s) * 128;
      // real groups set gmeta bits at lane 0 write; clslow = gmeta>>3 & 0xf
      // pad subs have gmeta == par<<7 only and word all zero
      bool real = false;
      for (int64_t l = 0; l < 128; ++l)
        if (word[slot + l] & (0xff << 18)) { real = true; break; }
      if (!real) continue;
      const int32_t clslow = (gmeta[u * S_NSUB + s] >> 3) & 0xf;
      if (!clslow) continue;
      for (int64_t l = 0; l < 128; ++l)
        if (!(word[slot + l] & (0xff << 18))) word[slot + l] |= clslow << 26;
    }

  // --- per-step control + out tiles -------------------------------------
  std::vector<int64_t> step_last_tile(n_steps, -1);
  for (int64_t s = 0; s < n_steps; ++s) step_meta[s * 8 + 3] = -1;
  for (int64_t t = 0; t < n_tiles; ++t) {
    const int64_t s_first = unit_offsets[t] / nb;
    step_meta[s_first * 8 + 0] = 1;
    step_meta[s_first * 8 + 1] = (int32_t)(t % 2);
    step_meta[s_first * 8 + 2] = (int32_t)tile_wstart[t];
    step_meta[s_first * 8 + 3] =
        (t + 1 < n_tiles) ? (int32_t)tile_wstart[t + 1] : -1;
    const int64_t s_last = (unit_offsets[t + 1] - 1) / nb;
    step_meta[s_last * 8 + 4] = 1;
    step_meta[s_last * 8 + 5] = (int32_t)(t % 2);
    step_last_tile[s_last] = t;
  }
  int64_t nxt = n_tiles - 1;
  for (int64_t s = n_steps - 1; s >= 0; --s) {
    if (step_last_tile[s] >= 0) nxt = step_last_tile[s];
    out_idx[s] = (int32_t)nxt;
  }
}

}  // extern "C"
