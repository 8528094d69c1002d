// Native GC-RANSAC for rigid 3-D correspondence registration.
//
// Replaces the external pygcransac wheel the reference shells out to
// (GMF_PointDSC/baseline_scripts/baseline_3DMatch.py:101-125,
// pygcransac.findRigidTransform) with a from-scratch implementation of
// Graph-Cut RANSAC (Barath & Matas, CVPR 2018): a classic hypothesize-
// and-verify loop whose local-optimization step labels inliers by
// minimizing a spatially-coherent energy
//     E(L) = sum_p U_p(L_p) + lambda * sum_{pq in N} [L_p != L_q]
// with an s-t min-cut, instead of by per-point thresholding.
//
// Host-side baseline code (like cpp/pmc): not on the accelerator path.
//
// Components, all first-party:
//  - Horn quaternion absolute orientation (weighted Kabsch) via a 4x4
//    Jacobi eigen-solver — no LAPACK dependency.
//  - Dinic max-flow for the binary-label min-cut (the graphs are small:
//    N correspondences, <=KNB neighbors each, so Dinic is exact and
//    runs in microseconds).
//  - Grid-hash neighborhood over the source points.
//
// C ABI (see gmf_tpu/utils/gcransac.py):
//   int gcransac_rigid(const double* src, const double* tgt, int n,
//                      double threshold, double conf, double lambda,
//                      int max_iters, double neigh_radius, uint32_t seed,
//                      double* out_pose16, uint8_t* out_mask_n)
// Returns the inlier count; out_pose is row-major 4x4 with
// tgt ~= R @ src + t (standard convention; the Python shim matches the
// reference wrapper's output orientation).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------------
// Pose + residuals
// ---------------------------------------------------------------------
struct Pose {
  double R[9];  // row-major
  double t[3];
};

inline void apply_pose(const Pose& P, const double* s, double* out) {
  for (int i = 0; i < 3; ++i) {
    out[i] = P.R[3 * i] * s[0] + P.R[3 * i + 1] * s[1] +
             P.R[3 * i + 2] * s[2] + P.t[i];
  }
}

inline double residual2(const Pose& P, const double* s, const double* t) {
  double w[3];
  apply_pose(P, s, w);
  double dx = w[0] - t[0], dy = w[1] - t[1], dz = w[2] - t[2];
  return dx * dx + dy * dy + dz * dz;
}

// ---------------------------------------------------------------------
// 4x4 symmetric Jacobi eigen-solver (for Horn's quaternion matrix)
// ---------------------------------------------------------------------
void jacobi4(double A[4][4], double V[4][4], double d[4]) {
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) V[i][j] = (i == j) ? 1.0 : 0.0;
  for (int sweep = 0; sweep < 64; ++sweep) {
    double off = 0;
    for (int p = 0; p < 4; ++p)
      for (int q = p + 1; q < 4; ++q) off += A[p][q] * A[p][q];
    if (off < 1e-24) break;
    for (int p = 0; p < 4; ++p) {
      for (int q = p + 1; q < 4; ++q) {
        if (std::fabs(A[p][q]) < 1e-18) continue;
        double theta = (A[q][q] - A[p][p]) / (2.0 * A[p][q]);
        double tt = (theta >= 0 ? 1.0 : -1.0) /
                    (std::fabs(theta) + std::sqrt(theta * theta + 1.0));
        double c = 1.0 / std::sqrt(tt * tt + 1.0), s = tt * c;
        for (int k = 0; k < 4; ++k) {
          double akp = A[k][p], akq = A[k][q];
          A[k][p] = c * akp - s * akq;
          A[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 4; ++k) {
          double apk = A[p][k], aqk = A[q][k];
          A[p][k] = c * apk - s * aqk;
          A[q][k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 4; ++k) {
          double vkp = V[k][p], vkq = V[k][q];
          V[k][p] = c * vkp - s * vkq;
          V[k][q] = s * vkp + c * vkq;
        }
      }
    }
  }
  for (int i = 0; i < 4; ++i) d[i] = A[i][i];
}

// Weighted absolute orientation: find R,t with tgt ~= R src + t.
// Horn quaternion method — immune to the reflection pitfall of naive SVD.
bool fit_pose(const double* src, const double* tgt, const int* idx,
              const double* w, int k, Pose& out) {
  if (k < 3) return false;
  double cs[3] = {0, 0, 0}, ct[3] = {0, 0, 0}, wsum = 0;
  for (int i = 0; i < k; ++i) {
    int p = idx[i];
    double wi = w ? w[i] : 1.0;
    wsum += wi;
    for (int a = 0; a < 3; ++a) {
      cs[a] += wi * src[3 * p + a];
      ct[a] += wi * tgt[3 * p + a];
    }
  }
  if (wsum <= 1e-12) return false;
  for (int a = 0; a < 3; ++a) {
    cs[a] /= wsum;
    ct[a] /= wsum;
  }
  double M[3][3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
  for (int i = 0; i < k; ++i) {
    int p = idx[i];
    double wi = w ? w[i] : 1.0;
    double s[3], t[3];
    for (int a = 0; a < 3; ++a) {
      s[a] = src[3 * p + a] - cs[a];
      t[a] = tgt[3 * p + a] - ct[a];
    }
    for (int a = 0; a < 3; ++a)
      for (int b = 0; b < 3; ++b) M[a][b] += wi * s[a] * t[b];
  }
  double Sxx = M[0][0], Sxy = M[0][1], Sxz = M[0][2];
  double Syx = M[1][0], Syy = M[1][1], Syz = M[1][2];
  double Szx = M[2][0], Szy = M[2][1], Szz = M[2][2];
  double N[4][4] = {
      {Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx},
      {Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz},
      {Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy},
      {Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz}};
  double V[4][4], d[4];
  jacobi4(N, V, d);
  int best = 0;
  for (int i = 1; i < 4; ++i)
    if (d[i] > d[best]) best = i;
  double q0 = V[0][best], qx = V[1][best], qy = V[2][best], qz = V[3][best];
  double nq = std::sqrt(q0 * q0 + qx * qx + qy * qy + qz * qz);
  if (nq < 1e-12) return false;
  q0 /= nq; qx /= nq; qy /= nq; qz /= nq;
  out.R[0] = q0 * q0 + qx * qx - qy * qy - qz * qz;
  out.R[1] = 2 * (qx * qy - q0 * qz);
  out.R[2] = 2 * (qx * qz + q0 * qy);
  out.R[3] = 2 * (qx * qy + q0 * qz);
  out.R[4] = q0 * q0 - qx * qx + qy * qy - qz * qz;
  out.R[5] = 2 * (qy * qz - q0 * qx);
  out.R[6] = 2 * (qx * qz - q0 * qy);
  out.R[7] = 2 * (qy * qz + q0 * qx);
  out.R[8] = q0 * q0 - qx * qx - qy * qy + qz * qz;
  for (int a = 0; a < 3; ++a)
    out.t[a] = ct[a] - (out.R[3 * a] * cs[0] + out.R[3 * a + 1] * cs[1] +
                        out.R[3 * a + 2] * cs[2]);
  return true;
}

// ---------------------------------------------------------------------
// Dinic max-flow (binary-label min-cut)
// ---------------------------------------------------------------------
struct Dinic {
  struct Edge {
    int to;
    double cap;
    int rev;
  };
  int n;
  std::vector<std::vector<Edge>> g;
  std::vector<int> level, iter;

  explicit Dinic(int n_) : n(n_), g(n_), level(n_), iter(n_) {}

  void add_edge(int u, int v, double cap, double rcap = 0.0) {
    g[u].push_back({v, cap, (int)g[v].size()});
    g[v].push_back({u, rcap, (int)g[u].size() - 1});
  }

  bool bfs(int s, int t) {
    std::fill(level.begin(), level.end(), -1);
    std::vector<int> q;
    q.push_back(s);
    level[s] = 0;
    for (size_t h = 0; h < q.size(); ++h) {
      int v = q[h];
      for (const Edge& e : g[v]) {
        if (e.cap > 1e-12 && level[e.to] < 0) {
          level[e.to] = level[v] + 1;
          q.push_back(e.to);
        }
      }
    }
    return level[t] >= 0;
  }

  double dfs(int v, int t, double f) {
    if (v == t) return f;
    for (int& i = iter[v]; i < (int)g[v].size(); ++i) {
      Edge& e = g[v][i];
      if (e.cap > 1e-12 && level[v] < level[e.to]) {
        double d = dfs(e.to, t, std::min(f, e.cap));
        if (d > 0) {
          e.cap -= d;
          g[e.to][e.rev].cap += d;
          return d;
        }
      }
    }
    return 0;
  }

  void max_flow(int s, int t) {
    while (bfs(s, t)) {
      std::fill(iter.begin(), iter.end(), 0);
      while (dfs(s, t, 1e30) > 0) {
      }
    }
  }

  // After max_flow: nodes reachable from s in the residual graph.
  void source_side(int s, std::vector<uint8_t>& mark) {
    mark.assign(n, 0);
    std::vector<int> q;
    q.push_back(s);
    mark[s] = 1;
    for (size_t h = 0; h < q.size(); ++h) {
      int v = q[h];
      for (const Edge& e : g[v]) {
        if (e.cap > 1e-12 && !mark[e.to]) {
          mark[e.to] = 1;
          q.push_back(e.to);
        }
      }
    }
  }
};

// ---------------------------------------------------------------------
// Grid-hash neighborhood over the source points
// ---------------------------------------------------------------------
void build_neighbors(const double* src, int n, double radius, int max_nb,
                     std::vector<std::pair<int, int>>& pairs) {
  pairs.clear();
  if (radius <= 0) return;
  auto cell = [&](const double* p, int64_t out[3]) {
    for (int a = 0; a < 3; ++a)
      out[a] = (int64_t)std::floor(p[a] / radius);
  };
  auto key = [](const int64_t c[3]) {
    return (uint64_t)(c[0] * 73856093LL) ^ (uint64_t)(c[1] * 19349663LL) ^
           (uint64_t)(c[2] * 83492791LL);
  };
  std::unordered_map<uint64_t, std::vector<int>> grid;
  grid.reserve(2 * n);
  for (int i = 0; i < n; ++i) {
    int64_t c[3];
    cell(src + 3 * i, c);
    grid[key(c)].push_back(i);
  }
  double r2 = radius * radius;
  std::vector<int> count(n, 0);
  for (int i = 0; i < n; ++i) {
    int64_t c[3];
    cell(src + 3 * i, c);
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          int64_t cc[3] = {c[0] + dx, c[1] + dy, c[2] + dz};
          auto it = grid.find(key(cc));
          if (it == grid.end()) continue;
          for (int j : it->second) {
            if (j <= i) continue;  // each undirected pair once
            if (count[i] >= max_nb || count[j] >= max_nb) continue;
            double ddx = src[3 * i] - src[3 * j];
            double ddy = src[3 * i + 1] - src[3 * j + 1];
            double ddz = src[3 * i + 2] - src[3 * j + 2];
            if (ddx * ddx + ddy * ddy + ddz * ddz < r2) {
              pairs.emplace_back(i, j);
              ++count[i];
              ++count[j];
            }
          }
        }
  }
}

// ---------------------------------------------------------------------
// Scoring + local optimization
// ---------------------------------------------------------------------

// MSAC-style truncated-quadratic score: sum over points of 1 - r^2/tau^2.
double score_pose(const Pose& P, const double* src, const double* tgt,
                  int n, double tau2, int* inliers_out) {
  double sc = 0;
  int cnt = 0;
  for (int i = 0; i < n; ++i) {
    double r2 = residual2(P, src + 3 * i, tgt + 3 * i);
    if (r2 < tau2) {
      sc += 1.0 - r2 / tau2;
      ++cnt;
    }
  }
  if (inliers_out) *inliers_out = cnt;
  return sc;
}

// One graph-cut labeling of the energy
//   E(L) = sum_p [L_p=1] q_p + [L_p=0] (1-q_p)  +  lambda sum_N [L_p!=L_q]
// with q_p = min(r_p^2/eps^2, 1). Returns the inlier (label-1) indices.
void graph_cut_inliers(const Pose& P, const double* src, const double* tgt,
                       int n, double eps2, double lambda,
                       const std::vector<std::pair<int, int>>& nb,
                       std::vector<int>& inliers) {
  Dinic din(n + 2);
  int S = n, T = n + 1;
  for (int i = 0; i < n; ++i) {
    double q = residual2(P, src + 3 * i, tgt + 3 * i) / eps2;
    if (q > 1.0) q = 1.0;
    // cut s->p  <=> p labeled 0, pays U_p(0) = 1-q
    // cut p->t  <=> p labeled 1, pays U_p(1) = q
    din.add_edge(S, i, 1.0 - q);
    din.add_edge(i, T, q);
  }
  for (const auto& pq : nb)
    din.add_edge(pq.first, pq.second, lambda, lambda);
  din.max_flow(S, T);
  std::vector<uint8_t> side;
  din.source_side(S, side);
  inliers.clear();
  for (int i = 0; i < n; ++i)
    if (side[i]) inliers.push_back(i);
}

// Local optimization (the "GC" in GC-RANSAC): graph-cut labeling with a
// widened threshold, weighted re-fit on the labeled set, then inner
// thresholded re-fit iterations; keeps the result only if the MSAC score
// improves.
bool local_opt(Pose& pose, double& score, const double* src,
               const double* tgt, int n, double tau2, double lambda,
               const std::vector<std::pair<int, int>>& nb,
               std::vector<int>& scratch, std::vector<double>& wts) {
  bool improved_any = false;
  double eps2 = 2.25 * tau2;  // 1.5*tau widened band for the labeling
  for (int gc = 0; gc < 3; ++gc) {
    graph_cut_inliers(pose, src, tgt, n, eps2, lambda, nb, scratch);
    if ((int)scratch.size() < 3) break;
    wts.resize(scratch.size());
    for (size_t i = 0; i < scratch.size(); ++i) {
      double q = residual2(pose, src + 3 * scratch[i],
                           tgt + 3 * scratch[i]) / eps2;
      wts[i] = 1.0 - std::min(q, 1.0);
    }
    Pose cand = pose;
    if (!fit_pose(src, tgt, scratch.data(), wts.data(),
                  (int)scratch.size(), cand))
      break;
    // inner iterations: threshold at tau, uniform re-fit
    for (int it = 0; it < 4; ++it) {
      scratch.clear();
      for (int i = 0; i < n; ++i)
        if (residual2(cand, src + 3 * i, tgt + 3 * i) < tau2)
          scratch.push_back(i);
      if ((int)scratch.size() < 3) break;
      Pose next = cand;
      if (!fit_pose(src, tgt, scratch.data(), nullptr,
                    (int)scratch.size(), next))
        break;
      cand = next;
    }
    double sc = score_pose(cand, src, tgt, n, tau2, nullptr);
    if (sc > score) {
      score = sc;
      pose = cand;
      improved_any = true;
    } else {
      break;
    }
  }
  return improved_any;
}

inline double triangle_area2(const double* a, const double* b,
                             const double* c) {
  double u[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
  double v[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
  double cx = u[1] * v[2] - u[2] * v[1];
  double cy = u[2] * v[0] - u[0] * v[2];
  double cz = u[0] * v[1] - u[1] * v[0];
  return cx * cx + cy * cy + cz * cz;
}

}  // namespace

extern "C" int gcransac_rigid(const double* src, const double* tgt, int n,
                              double threshold, double conf, double lambda,
                              int max_iters, double neigh_radius,
                              uint32_t seed, double* out_pose,
                              uint8_t* out_mask) {
  // identity defaults
  for (int i = 0; i < 16; ++i) out_pose[i] = (i % 5 == 0) ? 1.0 : 0.0;
  std::memset(out_mask, 0, n);
  if (n < 3 || threshold <= 0) return 0;

  double tau2 = threshold * threshold;
  std::vector<std::pair<int, int>> nb;
  build_neighbors(src, n, neigh_radius, /*max_nb=*/16, nb);

  std::mt19937 rng(seed);
  std::uniform_int_distribution<int> pick(0, n - 1);

  Pose best{};
  bool have_best = false;
  double best_score = -1;
  int best_inl = 0;
  std::vector<int> scratch;
  std::vector<double> wts;
  double log1mconf = std::log(std::max(1.0 - conf, 1e-300));
  long long needed = max_iters;
  double min_area2 = 1e-12;

  for (long long it = 0; it < std::min<long long>(max_iters, needed); ++it) {
    int a = pick(rng), b = pick(rng), c = pick(rng);
    if (a == b || b == c || a == c) continue;
    int sample[3] = {a, b, c};
    if (triangle_area2(src + 3 * a, src + 3 * b, src + 3 * c) < min_area2 ||
        triangle_area2(tgt + 3 * a, tgt + 3 * b, tgt + 3 * c) < min_area2)
      continue;
    Pose P;
    if (!fit_pose(src, tgt, sample, nullptr, 3, P)) continue;
    int inl = 0;
    double sc = score_pose(P, src, tgt, n, tau2, &inl);
    if (sc <= best_score) continue;
    best = P;
    best_score = sc;
    best_inl = inl;
    have_best = true;
    local_opt(best, best_score, src, tgt, n, tau2, lambda, nb, scratch,
              wts);
    score_pose(best, src, tgt, n, tau2, &best_inl);
    // adaptive termination: P(all-inlier minimal sample) with ratio w
    double w = (double)best_inl / n;
    double denom = std::log(std::max(1.0 - w * w * w, 1e-300));
    needed = (denom < 0) ? (long long)std::ceil(log1mconf / denom)
                         : max_iters;
  }

  if (!have_best) return 0;

  // final polish + mask
  local_opt(best, best_score, src, tgt, n, tau2, lambda, nb, scratch, wts);
  int cnt = 0;
  for (int i = 0; i < n; ++i) {
    if (residual2(best, src + 3 * i, tgt + 3 * i) < tau2) {
      out_mask[i] = 1;
      ++cnt;
    }
  }
  for (int a = 0; a < 3; ++a) {
    for (int b = 0; b < 3; ++b) out_pose[4 * a + b] = best.R[3 * a + b];
    out_pose[4 * a + 3] = best.t[a];
  }
  out_pose[12] = out_pose[13] = out_pose[14] = 0.0;
  out_pose[15] = 1.0;
  return cnt;
}
