// Dinic max-flow / min-cut on sparse float-capacity graphs.
//
// Used by the L0 cut-pursuit split step (cutpursuit.cpp) the same way the
// reference's solver uses Boost's BGL maxflow inside CutPursuit::split()
// (reference: partition/cut-pursuit/include/CutPursuit.h:75-120). Dinic's
// algorithm (BFS level graph + DFS blocking flow) is simple, exact, and fast
// on the sparse k-NN graphs this workload produces.
#pragma once

#include <cstdint>
#include <limits>
#include <vector>

namespace cp {

class MaxFlow {
 public:
  explicit MaxFlow(int n) : n_(n), head_(n, -1) {}

  // Adds a directed arc u->v with capacity cap and reverse capacity rev_cap.
  void add_edge(int u, int v, float cap, float rev_cap) {
    arcs_.push_back({v, head_[u], cap});
    head_[u] = static_cast<int>(arcs_.size()) - 1;
    arcs_.push_back({u, head_[v], rev_cap});
    head_[v] = static_cast<int>(arcs_.size()) - 1;
  }

  // Terminal capacities: source->v (cap_s) and v->sink (cap_t). Stored as
  // per-node excesses to avoid 2n extra arcs.
  void add_terminal(int v, float cap_s, float cap_t) {
    if (term_.empty()) term_.assign(n_, 0.f);
    term_[v] += cap_s - cap_t;
  }

  // Returns max flow; afterwards min_cut_side(v) gives the side of v.
  double solve() {
    if (term_.empty()) term_.assign(n_, 0.f);
    // materialize terminal arcs
    src_ = n_;
    sink_ = n_ + 1;
    head_.resize(n_ + 2, -1);
    for (int v = 0; v < n_; ++v) {
      float e = term_[v];
      if (e > 0) add_arc_internal(src_, v, e);
      else if (e < 0) add_arc_internal(v, sink_, -e);
    }
    double flow = 0;
    level_.assign(n_ + 2, -1);
    iter_.assign(n_ + 2, -1);
    while (bfs()) {
      iter_ = head_;
      while (true) {
        float f = dfs(src_, std::numeric_limits<float>::max());
        if (f <= 0) break;
        flow += f;
      }
    }
    // final BFS marks reachable set (source side)
    bfs();
    return flow;
  }

  // true => v on the source side of the min cut (call after solve()).
  bool min_cut_side(int v) const { return level_[v] >= 0; }

 private:
  struct Arc {
    int to;
    int next;
    float cap;
  };

  void add_arc_internal(int u, int v, float cap) {
    arcs_.push_back({v, head_[u], cap});
    head_[u] = static_cast<int>(arcs_.size()) - 1;
    arcs_.push_back({u, head_[v], 0.f});
    head_[v] = static_cast<int>(arcs_.size()) - 1;
  }

  bool bfs() {
    level_.assign(n_ + 2, -1);
    queue_.clear();
    queue_.push_back(src_);
    level_[src_] = 0;
    for (size_t qi = 0; qi < queue_.size(); ++qi) {
      int u = queue_[qi];
      for (int a = head_[u]; a != -1; a = arcs_[a].next) {
        if (arcs_[a].cap > 1e-9f && level_[arcs_[a].to] < 0) {
          level_[arcs_[a].to] = level_[u] + 1;
          queue_.push_back(arcs_[a].to);
        }
      }
    }
    return level_[sink_] >= 0;
  }

  float dfs(int u, float f) {
    if (u == sink_) return f;
    for (int& a = iter_[u]; a != -1; a = arcs_[a].next) {
      Arc& arc = arcs_[a];
      if (arc.cap > 1e-9f && level_[arc.to] == level_[u] + 1) {
        float d = dfs(arc.to, f < arc.cap ? f : arc.cap);
        if (d > 0) {
          arc.cap -= d;
          arcs_[a ^ 1].cap += d;
          return d;
        }
      }
    }
    return 0;
  }

  int n_, src_ = -1, sink_ = -1;
  std::vector<int> head_;
  std::vector<Arc> arcs_;
  std::vector<float> term_;
  std::vector<int> level_, iter_;
  std::vector<int> queue_;
};

}  // namespace cp
