// L0 cut-pursuit: minimal-partition solver for point-cloud oversegmentation.
//
// TPU-framework equivalent of the reference's libcp
// (reference: partition/cut-pursuit/src/cutpursuit.cpp:92-120 dispatching the
// "segmentation light" L0 variant of API.h:564-630 / CutPursuit.h:75-120).
// Solves
//     min_h  Σ_v ||x_v − h(v)||²  +  λ Σ_{(u,v)∈E} w_uv · 1[h(u) ≠ h(v)]
// by alternating a global binary split (2-means inside each constant
// component + a graph-cut refinement of the assignment, solved with Dinic
// max-flow) and a reduction step (connected components of the label map
// become the new constant components), until the energy stops improving.
//
// This is a fresh implementation of the published algorithm (Landrieu &
// Obozinski, "Cut Pursuit", 2017) — behavioral contract with the reference:
// same energy, same inputs (obs, knn-graph source/target/edge_weight, λ),
// same outputs (in_component map + ragged components), validated by the
// energy/partition property tests in tests/test_cutpursuit.py.
//
// Exposed as a plain C ABI consumed via ctypes (ssdr_al_tpu/partition/cp.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

#include "maxflow.h"

namespace {

struct Graph {
  int n_ver, n_edg, dim;
  const float* obs;           // [n_ver, dim]
  const uint32_t* source;     // [n_edg]
  const uint32_t* target;     // [n_edg]
  const float* edge_weight;   // [n_edg]
  float lambda;
};

// Energy of a labeling: fidelity w.r.t. component means + λ·cut weight.
double energy(const Graph& g, const std::vector<int32_t>& comp,
              const std::vector<std::vector<float>>& means) {
  double fid = 0;
  for (int v = 0; v < g.n_ver; ++v) {
    const float* x = g.obs + static_cast<size_t>(v) * g.dim;
    const float* h = means[comp[v]].data();
    for (int d = 0; d < g.dim; ++d) {
      double diff = x[d] - h[d];
      fid += diff * diff;
    }
  }
  double cut = 0;
  for (int e = 0; e < g.n_edg; ++e) {
    if (comp[g.source[e]] != comp[g.target[e]]) cut += g.edge_weight[e];
  }
  return fid + g.lambda * cut;
}

std::vector<std::vector<float>> component_means(
    const Graph& g, const std::vector<int32_t>& comp, int n_comp) {
  std::vector<std::vector<float>> means(n_comp, std::vector<float>(g.dim, 0.f));
  std::vector<int> count(n_comp, 0);
  for (int v = 0; v < g.n_ver; ++v) {
    const float* x = g.obs + static_cast<size_t>(v) * g.dim;
    auto& m = means[comp[v]];
    for (int d = 0; d < g.dim; ++d) m[d] += x[d];
    ++count[comp[v]];
  }
  for (int c = 0; c < n_comp; ++c) {
    if (count[c] > 0)
      for (int d = 0; d < g.dim; ++d) means[c][d] /= count[c];
  }
  return means;
}

// Connected components of the vertex set under edges whose endpoints share
// both the current component and binary side. Returns new component count.
int reduce(const Graph& g, const std::vector<int32_t>& comp,
           const std::vector<uint8_t>& side, std::vector<int32_t>* out) {
  // CSR adjacency (undirected view of the knn graph)
  std::vector<int> deg(g.n_ver, 0);
  for (int e = 0; e < g.n_edg; ++e) {
    ++deg[g.source[e]];
    ++deg[g.target[e]];
  }
  std::vector<int> off(g.n_ver + 1, 0);
  for (int v = 0; v < g.n_ver; ++v) off[v + 1] = off[v] + deg[v];
  std::vector<int> adj(off[g.n_ver]);
  std::vector<int> cur(off.begin(), off.end() - 1);
  for (int e = 0; e < g.n_edg; ++e) {
    adj[cur[g.source[e]]++] = g.target[e];
    adj[cur[g.target[e]]++] = g.source[e];
  }
  out->assign(g.n_ver, -1);
  std::vector<int> stack;
  int n_comp = 0;
  for (int seed = 0; seed < g.n_ver; ++seed) {
    if ((*out)[seed] >= 0) continue;
    stack.push_back(seed);
    (*out)[seed] = n_comp;
    while (!stack.empty()) {
      int v = stack.back();
      stack.pop_back();
      for (int a = off[v]; a < off[v + 1]; ++a) {
        int u = adj[a];
        if ((*out)[u] < 0 && comp[u] == comp[v] && side[u] == side[v]) {
          (*out)[u] = n_comp;
          stack.push_back(u);
        }
      }
    }
    ++n_comp;
  }
  return n_comp;
}

}  // namespace

extern "C" {

// Returns the number of components; fills in_component (int32 [n_ver]).
// Matches libcp.cutpursuit's contract (reference cutpursuit.cpp:92-120):
// obs [n_ver, dim] float32, edges (source, target) uint32 with weights, λ.
int cutpursuit_l0(int n_ver, int n_edg, int dim, const float* obs,
                  const uint32_t* source, const uint32_t* target,
                  const float* edge_weight, float lambda, int max_ite,
                  int32_t* in_component) {
  Graph g{n_ver, n_edg, dim, obs, source, target, edge_weight, lambda};

  std::vector<int32_t> comp(n_ver, 0);
  int n_comp = 1;
  auto means = component_means(g, comp, n_comp);
  double best_e = energy(g, comp, means);
  std::mt19937 rng(1);

  for (int ite = 0; ite < max_ite; ++ite) {
    // ---- split step: per component, 2-means alternate with graph cuts ----
    // candidate centroids per component
    std::vector<std::vector<float>> h0 = means, h1 = means;
    // seed h1 with the farthest-from-mean observation of each component
    {
      std::vector<double> far(n_comp, -1.0);
      std::vector<int> far_v(n_comp, -1);
      for (int v = 0; v < n_ver; ++v) {
        const float* x = g.obs + static_cast<size_t>(v) * dim;
        double d2 = 0;
        for (int d = 0; d < dim; ++d) {
          double diff = x[d] - means[comp[v]][d];
          d2 += diff * diff;
        }
        if (d2 > far[comp[v]]) {
          far[comp[v]] = d2;
          far_v[comp[v]] = v;
        }
      }
      for (int c = 0; c < n_comp; ++c) {
        if (far_v[c] >= 0) {
          const float* x = g.obs + static_cast<size_t>(far_v[c]) * dim;
          h1[c].assign(x, x + dim);
        }
      }
    }

    std::vector<uint8_t> side(n_ver, 0);
    const int kmeans_ite = 3;
    for (int ki = 0; ki < kmeans_ite; ++ki) {
      // graph cut: unary = distance to h0/h1 of own component,
      // pairwise = λ·w on same-component edges
      cp::MaxFlow mf(n_ver);
      for (int v = 0; v < n_ver; ++v) {
        const float* x = g.obs + static_cast<size_t>(v) * dim;
        double c0 = 0, c1 = 0;
        for (int d = 0; d < dim; ++d) {
          double d0 = x[d] - h0[comp[v]][d];
          double d1 = x[d] - h1[comp[v]][d];
          c0 += d0 * d0;
          c1 += d1 * d1;
        }
        // source side = label 0: pays c1 if cut to sink... convention:
        // cap_s = cost of label 1, cap_t = cost of label 0.
        mf.add_terminal(v, static_cast<float>(c1), static_cast<float>(c0));
      }
      for (int e = 0; e < n_edg; ++e) {
        int u = source[e], w = target[e];
        if (comp[u] == comp[w]) {
          float c = lambda * edge_weight[e];
          mf.add_edge(u, w, c, c);
        }
      }
      mf.solve();
      for (int v = 0; v < n_ver; ++v) side[v] = mf.min_cut_side(v) ? 0 : 1;

      // recompute candidate centroids from the cut assignment
      std::vector<std::vector<double>> acc0(n_comp, std::vector<double>(dim, 0)),
          acc1(n_comp, std::vector<double>(dim, 0));
      std::vector<int> cnt0(n_comp, 0), cnt1(n_comp, 0);
      for (int v = 0; v < n_ver; ++v) {
        const float* x = g.obs + static_cast<size_t>(v) * dim;
        if (side[v] == 0) {
          for (int d = 0; d < dim; ++d) acc0[comp[v]][d] += x[d];
          ++cnt0[comp[v]];
        } else {
          for (int d = 0; d < dim; ++d) acc1[comp[v]][d] += x[d];
          ++cnt1[comp[v]];
        }
      }
      for (int c = 0; c < n_comp; ++c) {
        if (cnt0[c]) for (int d = 0; d < dim; ++d) h0[c][d] = acc0[c][d] / cnt0[c];
        if (cnt1[c]) for (int d = 0; d < dim; ++d) h1[c][d] = acc1[c][d] / cnt1[c];
      }
    }

    // ---- reduce: connected components of (comp, side) ----
    std::vector<int32_t> new_comp;
    int new_n = reduce(g, comp, side, &new_comp);
    auto new_means = component_means(g, new_comp, new_n);
    double e = energy(g, new_comp, new_means);
    if (e < best_e - 1e-6 * std::abs(best_e)) {
      best_e = e;
      comp.swap(new_comp);
      n_comp = new_n;
      means.swap(new_means);
    } else {
      break;  // saturation (CutPursuit.h main-loop exit condition)
    }
  }

  std::memcpy(in_component, comp.data(), sizeof(int32_t) * n_ver);
  return n_comp;
}

// Connected components of a label map over a knn graph (libply_c
// connected_comp equivalent, reference ply_c.cpp:466-480).
int connected_components(int n_ver, int n_edg, const uint32_t* source,
                         const uint32_t* target, const int32_t* labels,
                         int32_t* out_comp) {
  std::vector<int> deg(n_ver, 0);
  for (int e = 0; e < n_edg; ++e) {
    ++deg[source[e]];
    ++deg[target[e]];
  }
  std::vector<int> off(n_ver + 1, 0);
  for (int v = 0; v < n_ver; ++v) off[v + 1] = off[v] + deg[v];
  std::vector<int> adj(off[n_ver]);
  std::vector<int> cur(off.begin(), off.end() - 1);
  for (int e = 0; e < n_edg; ++e) {
    adj[cur[source[e]]++] = target[e];
    adj[cur[target[e]]++] = source[e];
  }
  std::fill(out_comp, out_comp + n_ver, -1);
  std::vector<int> stack;
  int n_comp = 0;
  for (int seed = 0; seed < n_ver; ++seed) {
    if (out_comp[seed] >= 0) continue;
    stack.push_back(seed);
    out_comp[seed] = n_comp;
    while (!stack.empty()) {
      int v = stack.back();
      stack.pop_back();
      for (int a = off[v]; a < off[v + 1]; ++a) {
        int u = adj[a];
        if (out_comp[u] < 0 && labels[u] == labels[v]) {
          out_comp[u] = n_comp;
          stack.push_back(u);
        }
      }
    }
    ++n_comp;
  }
  return n_comp;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Host-native voxel-grid subsampling (N2 parity path).
//
// Same semantics as the reference C++ extension
// (utils/cpp_wrappers/cpp_subsampling/grid_subsampling/grid_subsampling.cpp:
// 4-106): voxel = floor((p - origin)/dl), barycenter points/features,
// majority label. The on-device implementation (ssdr_al_tpu/ops/
// grid_subsample.py) is the primary path; this one serves host-only
// preprocessing contexts. Output order: ascending flat voxel key.
// ---------------------------------------------------------------------------

#include <unordered_map>

extern "C" {

// Returns number of voxels. Caller passes out buffers sized n_points (upper
// bound). features may be null (fdim 0); labels may be null.
int grid_subsample(int n, int fdim, const float* points, const float* features,
                   const int32_t* labels, int num_classes, float dl,
                   float* out_points, float* out_features,
                   int32_t* out_labels) {
  float minc[3] = {points[0], points[1], points[2]};
  float maxc[3] = {points[0], points[1], points[2]};
  for (int i = 1; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      float v = points[3 * i + d];
      if (v < minc[d]) minc[d] = v;
      if (v > maxc[d]) maxc[d] = v;
    }
  double origin[3];
  for (int d = 0; d < 3; ++d)
    origin[d] = std::floor(minc[d] / dl) * dl;
  int64_t nx = static_cast<int64_t>(std::floor((maxc[0] - origin[0]) / dl)) + 1;
  int64_t ny = static_cast<int64_t>(std::floor((maxc[1] - origin[1]) / dl)) + 1;

  struct Acc {
    std::vector<double> pt;
    std::vector<double> feat;
    std::vector<int> hist;
    int count = 0;
  };
  std::unordered_map<int64_t, Acc> vox;
  vox.reserve(n / 4);
  for (int i = 0; i < n; ++i) {
    int64_t ix = static_cast<int64_t>(std::floor((points[3 * i] - origin[0]) / dl));
    int64_t iy = static_cast<int64_t>(std::floor((points[3 * i + 1] - origin[1]) / dl));
    int64_t iz = static_cast<int64_t>(std::floor((points[3 * i + 2] - origin[2]) / dl));
    int64_t key = ix + nx * iy + nx * ny * iz;
    Acc& a = vox[key];
    if (a.pt.empty()) {
      a.pt.assign(3, 0.0);
      if (fdim) a.feat.assign(fdim, 0.0);
      if (labels) a.hist.assign(num_classes, 0);
    }
    for (int d = 0; d < 3; ++d) a.pt[d] += points[3 * i + d];
    for (int d = 0; d < fdim; ++d) a.feat[d] += features[fdim * i + d];
    if (labels) ++a.hist[labels[i]];
    ++a.count;
  }
  // deterministic output: sort keys
  std::vector<int64_t> keys;
  keys.reserve(vox.size());
  for (auto& kv : vox) keys.push_back(kv.first);
  std::sort(keys.begin(), keys.end());
  int s = 0;
  for (int64_t key : keys) {
    Acc& a = vox[key];
    for (int d = 0; d < 3; ++d)
      out_points[3 * s + d] = static_cast<float>(a.pt[d] / a.count);
    for (int d = 0; d < fdim; ++d)
      out_features[fdim * s + d] = static_cast<float>(a.feat[d] / a.count);
    if (labels) {
      int best = 0;
      for (int c = 1; c < num_classes; ++c)
        if (a.hist[c] > a.hist[best]) best = c;
      out_labels[s] = best;
    }
    ++s;
  }
  return s;
}

}  // extern "C"
