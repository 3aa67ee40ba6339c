// Native greedy entity partitioner (METIS-lite) — C ABI, ctypes-loaded.
//
// Exact port of skge_tpu/data.py greedy_entity_partition (the Python spec
// is a per-entity interpreter loop — fine to ~1e6 edges, unusable at the
// 1e8-1e9-edge scale the partitioned/out-of-core trainers target). Same
// deterministic semantics bit-for-bit: degree-descending stable order,
// +-12.5% degree balance cap, neighbor-majority placement with
// least-loaded (first-index) tie-breaks, then up to 3 Kernighan-Lin
// flavored refinement sweeps moving entities to their strict
// neighbor-majority part under the balance cap.
// Parity pinned in tests/test_native.py (native == Python on several
// random/clustered graphs).
//
// Build: native/Makefile (g++ -O3 -shared); no external dependencies.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// triples: (n_edges, 3) int32 rows (s, o, p) — only s/o are read.
// out_part: (n_entities,) int32.
// Returns 0 on success, nonzero on invalid arguments.
int skge_greedy_partition(const int32_t* triples, int64_t n_edges,
                          int32_t n_entities, int32_t n_parts,
                          int32_t* out_part) {
  if (n_entities <= 0 || n_parts <= 0) return 1;
  if (n_parts == 1) {
    std::memset(out_part, 0, sizeof(int32_t) * n_entities);
    return 0;
  }

  const int64_t n = n_entities;
  std::vector<int64_t> deg(n, 0);
  for (int64_t i = 0; i < n_edges; ++i) {
    const int32_t s = triples[i * 3], o = triples[i * 3 + 1];
    if (s < 0 || s >= n_entities || o < 0 || o >= n_entities) return 2;
    ++deg[s];
    ++deg[o];
  }

  // undirected adjacency in CSR form (counting sort — matches the stable
  // argsort-by-src layout of the Python version; neighbor order within a
  // bucket is irrelevant to the algorithm, only the multiset is used)
  std::vector<int64_t> starts(n + 1, 0);
  for (int64_t e = 0; e < n; ++e) starts[e + 1] = starts[e] + deg[e];
  std::vector<int32_t> adj(starts[n]);
  {
    std::vector<int64_t> fill(starts.begin(), starts.end() - 1);
    for (int64_t i = 0; i < n_edges; ++i) {
      const int32_t s = triples[i * 3], o = triples[i * 3 + 1];
      adj[fill[s]++] = o;
      adj[fill[o]++] = s;
    }
  }

  // degree-descending stable order == np.argsort(-deg, kind='stable')
  std::vector<int32_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int32_t a, int32_t b) { return deg[a] > deg[b]; });

  const double total_deg = 2.0 * static_cast<double>(n_edges);
  const double cap =
      std::max(1.0, total_deg / static_cast<double>(n_parts) * 1.125);

  std::vector<int32_t> part(n, -1);
  std::vector<int64_t> load(n_parts, 0);
  std::vector<int64_t> score(n_parts);
  for (int64_t idx = 0; idx < n; ++idx) {
    const int32_t e = order[idx];
    std::fill(score.begin(), score.end(), 0);
    for (int64_t j = starts[e]; j < starts[e + 1]; ++j) {
      const int32_t pn = part[adj[j]];
      if (pn >= 0) ++score[pn];
    }
    // open = load + deg[e] <= cap; if none open, all open
    bool any_open = false;
    for (int32_t p = 0; p < n_parts; ++p) {
      if (static_cast<double>(load[p] + deg[e]) <= cap) {
        any_open = true;
        break;
      }
    }
    int64_t best_score = -2;
    int32_t best_p = 0;
    int64_t best_load = 0;
    for (int32_t p = 0; p < n_parts; ++p) {
      const bool open =
          !any_open || static_cast<double>(load[p] + deg[e]) <= cap;
      const int64_t sc = open ? score[p] : -1;
      // max score; among ties, min load; among those, first index
      if (sc > best_score ||
          (sc == best_score && load[p] < best_load)) {
        best_score = sc;
        best_p = p;
        best_load = load[p];
      }
    }
    part[e] = best_p;
    load[best_p] += deg[e];
  }

  // refinement sweeps (entity order 0..n-1, as in the Python spec)
  std::vector<int64_t> tally(n_parts);
  for (int sweep = 0; sweep < 3; ++sweep) {
    int64_t moved = 0;
    for (int64_t e = 0; e < n; ++e) {
      if (starts[e] == starts[e + 1]) continue;
      std::fill(tally.begin(), tally.end(), 0);
      for (int64_t j = starts[e]; j < starts[e + 1]; ++j)
        ++tally[part[adj[j]]];
      int32_t p_new = 0;
      for (int32_t p = 1; p < n_parts; ++p)
        if (tally[p] > tally[p_new]) p_new = p;  // first argmax
      const int32_t p_old = part[e];
      if (p_new == p_old || tally[p_new] <= tally[p_old]) continue;
      if (static_cast<double>(load[p_new] + deg[e]) > cap) continue;
      part[e] = p_new;
      load[p_old] -= deg[e];
      load[p_new] += deg[e];
      ++moved;
    }
    if (moved == 0) break;
  }

  std::memcpy(out_part, part.data(), sizeof(int32_t) * n);
  return 0;
}

}  // extern "C"
