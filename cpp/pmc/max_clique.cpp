// Parallel maximum-clique solver (native rebuild of the reference's
// prebuilt libpmc.so, GMF_PointDSC/utils/libpmc.so + utils/max_clique.py).
//
// Exposes the exact ctypes ABI the reference shim calls
// (utils/max_clique.py:29-36):
//
//   int32 max_clique(int32 nedges, const int32* ei, const int32* ej,
//                    int32 offset, int32 outsize, int32* out_clique);
//
// returns the clique size and writes the member vertex ids into
// out_clique (up to outsize entries).
//
// Algorithm (pmc-style, Rossi et al.):
//   1. adjacency as dense bitsets (N is a few thousand for the PMC
//      baseline's correspondence-consistency graphs),
//   2. degeneracy (k-core) vertex ordering for tight initial bounds,
//   3. branch & bound with greedy-coloring upper bounds (Tomita MCS),
//   4. OpenMP parallelism over root vertices with a shared atomic best.
//
// Build: see cpp/pmc/Makefile (g++ -O3 -fopenmp -shared -fPIC).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

using Word = uint64_t;
constexpr int kBits = 64;

struct BitGraph {
  int n = 0;
  int words = 0;
  std::vector<Word> adj;  // n rows of `words` words

  explicit BitGraph(int n_) : n(n_), words((n_ + kBits - 1) / kBits),
                              adj(static_cast<size_t>(n_) * ((n_ + kBits - 1) / kBits), 0) {}

  inline Word* row(int v) { return adj.data() + static_cast<size_t>(v) * words; }
  inline const Word* row(int v) const {
    return adj.data() + static_cast<size_t>(v) * words;
  }
  inline void add_edge(int u, int v) {
    row(u)[v / kBits] |= Word(1) << (v % kBits);
    row(v)[u / kBits] |= Word(1) << (u % kBits);
  }
  inline bool has_edge(int u, int v) const {
    return (row(u)[v / kBits] >> (v % kBits)) & 1;
  }
};

inline int popcount_words(const Word* w, int nwords) {
  int c = 0;
  for (int i = 0; i < nwords; ++i) c += __builtin_popcountll(w[i]);
  return c;
}

// Degeneracy ordering via repeated min-degree peeling. Returns order and
// the degeneracy (max core number) as a global clique-size upper bound.
int degeneracy_order(const BitGraph& g, std::vector<int>* order) {
  const int n = g.n;
  std::vector<int> deg(n);
  std::vector<char> removed(n, 0);
  for (int v = 0; v < n; ++v) deg[v] = popcount_words(g.row(v), g.words);
  order->resize(n);
  int degeneracy = 0;
  for (int it = 0; it < n; ++it) {
    int best = -1, bd = n + 1;
    for (int v = 0; v < n; ++v)
      if (!removed[v] && deg[v] < bd) { bd = deg[v]; best = v; }
    degeneracy = std::max(degeneracy, bd);
    (*order)[it] = best;
    removed[best] = 1;
    const Word* r = g.row(best);
    for (int v = 0; v < n; ++v)
      if (!removed[v] && ((r[v / kBits] >> (v % kBits)) & 1)) --deg[v];
  }
  return degeneracy;
}

struct Searcher {
  const BitGraph& g;
  std::atomic<int>& best_size;
  std::vector<int>& best_clique;
  std::vector<int> current;
  std::vector<Word> scratch;  // candidate sets, one level per depth

  Searcher(const BitGraph& g_, std::atomic<int>& bs, std::vector<int>& bc)
      : g(g_), best_size(bs), best_clique(bc) {
    scratch.resize(static_cast<size_t>(g.n + 2) * g.words);
  }

  // Greedy coloring of the candidate set; vertices come back ordered with
  // nondecreasing color; color number is the per-vertex pruning bound.
  void color_sort(const Word* cand, std::vector<int>* verts,
                  std::vector<int>* colors) {
    verts->clear();
    colors->clear();
    std::vector<Word> uncolored(cand, cand + g.words);
    int color = 0;
    std::vector<Word> wave(g.words);
    while (true) {
      bool any = false;
      for (int i = 0; i < g.words; ++i) {
        wave[i] = uncolored[i];
        any |= wave[i] != 0;
      }
      if (!any) break;
      ++color;
      // independent set of this color class
      for (int i = 0; i < g.words; ++i) {
        Word w = wave[i];
        while (w) {
          int b = __builtin_ctzll(w);
          w &= w - 1;
          int v = i * kBits + b;
          verts->push_back(v);
          colors->push_back(color);
          uncolored[i] &= ~(Word(1) << b);
          // remove v itself and v's neighbors from this color wave
          wave[i] &= ~(Word(1) << b);
          const Word* rv = g.row(v);
          for (int j = 0; j < g.words; ++j) wave[j] &= ~rv[j];
          w = wave[i];  // wave[i] may have changed
        }
      }
    }
  }

  void expand(Word* cand, int depth) {
    std::vector<int> verts, colors;
    color_sort(cand, &verts, &colors);
    for (int idx = static_cast<int>(verts.size()) - 1; idx >= 0; --idx) {
      int v = verts[idx];
      if (static_cast<int>(current.size()) + colors[idx] <=
          best_size.load(std::memory_order_relaxed))
        return;  // bound: even best coloring cannot beat incumbent
      current.push_back(v);
      Word* next = scratch.data() + static_cast<size_t>(depth) * g.words;
      const Word* rv = g.row(v);
      bool nonempty = false;
      for (int i = 0; i < g.words; ++i) {
        next[i] = cand[i] & rv[i];
        nonempty |= next[i] != 0;
      }
      if (nonempty) {
        expand(next, depth + 1);
      } else {
        int sz = static_cast<int>(current.size());
        int cur_best = best_size.load(std::memory_order_relaxed);
        while (sz > cur_best &&
               !best_size.compare_exchange_weak(cur_best, sz)) {
        }
        if (sz > cur_best) {
#ifdef _OPENMP
#pragma omp critical
#endif
          {
            if (sz >= best_size.load()) best_clique = current;
          }
        }
      }
      current.pop_back();
      // remove v from cand so later branches exclude it
      cand[v / kBits] &= ~(Word(1) << (v % kBits));
    }
  }
};

}  // namespace

extern "C" {

// Reference-ABI entry point (utils/max_clique.py:29-36).
int32_t max_clique(int32_t nedges, const int32_t* ei, const int32_t* ej,
                   int32_t offset, int32_t outsize, int32_t* out_clique) {
  int n = 0;
  for (int32_t k = 0; k < nedges; ++k)
    n = std::max(n, std::max(ei[k], ej[k]) + 1);
  if (n == 0) return 0;
  BitGraph g(n);
  for (int32_t k = 0; k < nedges; ++k) {
    int u = ei[k] - offset, v = ej[k] - offset;
    if (u == v || u < 0 || v < 0 || u >= n || v >= n) continue;
    g.add_edge(u, v);
  }

  std::vector<int> order;
  degeneracy_order(g, &order);

  std::atomic<int> best_size{0};
  std::vector<int> best_clique;

  // Roots in reverse degeneracy order (high-core vertices first).
#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    Searcher s(g, best_size, best_clique);
    std::vector<Word> cand(g.words);
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 8)
#endif
    for (int i = n - 1; i >= 0; --i) {
      int v = order[i];
      // candidates: neighbors of v that come LATER in the degeneracy
      // order (classic root decomposition — no duplicated subtrees).
      std::fill(cand.begin(), cand.end(), 0);
      const Word* rv = g.row(v);
      for (int j = i + 1; j < n; ++j) {
        int u = order[j];
        if ((rv[u / kBits] >> (u % kBits)) & 1)
          cand[u / kBits] |= Word(1) << (u % kBits);
      }
      if (popcount_words(cand.data(), g.words) + 1 <= best_size.load())
        continue;
      s.current.assign(1, v);
      s.expand(cand.data(), 1);
      s.current.clear();
    }
  }

  int sz = std::min<int>(best_size.load(), outsize);
  for (int i = 0; i < sz; ++i) out_clique[i] = best_clique[i] + offset;
  return best_size.load() == 0 && n > 0 ? (out_clique[0] = offset, 1)
                                        : best_size.load();
}

}  // extern "C"
