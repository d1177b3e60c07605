"""chamfer_cap evidence study: how does subsampling superpoints to P points
change the pairwise chamfer — and the diversity picks that consume it?

The diversity chamfer is O(S²·P²); the cap is the quadratic knob
(region_graph.build_region_graph). The reference computes chamfer on FULL
point sets (fps_gcn_cpu.py:12-38 / chamfer3D.cu), our default cap is 512.
At Semantic3D scale superpoints run ~500 pts, so cap 512 never binds and
the chamfer costs 38 s of a 52 s selection round; halving the cap saves 4×
IF the picks don't move.

CPU/numpy study (no device): synthetic clustered superpoints, exact CD vs
capped CD (the same linspace subsample pad_regions_vectorized applies),
then the metric that matters — FPS pick overlap and kNN-graph agreement of
exp(−(ED+CD)) adjacencies.

  python scripts/bench_chamfer_cap.py [--sps 96] [--pts 500] [--caps 512,256,128,64]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def chamfer_np(a, b):
    d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
    return d.min(1).mean() + d.min(0).mean()


def subsample(pts, cap):
    """linspace subsample with pinned endpoint (pad_regions_vectorized)."""
    n = len(pts)
    if n <= cap:
        return pts
    pos = np.linspace(0, n - 1, cap).astype(np.int64)
    return pts[pos]


def fps(dists, start, k):
    """farthest-sample over a combined distance matrix (fps semantics)."""
    n = dists.shape[0]
    sel = [start]
    mind = dists[start].copy()
    for _ in range(k - 1):
        nxt = int(np.argmax(mind))
        sel.append(nxt)
        mind = np.minimum(mind, dists[nxt])
    return sel


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sps", type=int, default=96)
    p.add_argument("--pts", type=int, default=500)
    p.add_argument("--caps", default="512,256,128,64")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    rng = np.random.RandomState(args.seed)
    # clustered scene-like superpoints: anisotropic gaussian blobs of
    # varying size/extent scattered in a 10 m cell
    sps = []
    for _ in range(args.sps):
        n = int(args.pts * rng.uniform(0.4, 1.8))
        center = rng.rand(3) * 10
        scale = rng.uniform(0.05, 0.6, 3)
        pts = center + rng.randn(n, 3) * scale
        c = (pts.min(0) + pts.max(0)) / 2  # bbox centering (region_graph)
        sps.append((pts - c).astype(np.float32))

    s = len(sps)
    cents = np.stack([np.zeros(3) for _ in sps])  # centered: ED from blobs'
    # real centers instead (ED is cap-independent — reuse one matrix)
    centers = np.stack([sp.mean(0) for sp in sps])
    ed = np.linalg.norm(centers[:, None] - centers[None, :], axis=-1)

    def cd_matrix(cap):
        sub = [subsample(sp, cap) if cap else sp for sp in sps]
        cd = np.zeros((s, s), np.float32)
        for i in range(s):
            for j in range(i + 1, s):
                cd[i, j] = cd[j, i] = chamfer_np(sub[i], sub[j])
        return cd

    cd_exact = cd_matrix(None)
    base_fps = fps(ed + cd_exact, 0, 24)
    off = ~np.eye(s, dtype=bool)
    for cap in [int(c) for c in args.caps.split(",")]:
        cd = cd_matrix(cap)
        rel = np.abs(cd - cd_exact)[off] / np.maximum(cd_exact[off], 1e-9)
        picks = fps(ed + cd, 0, 24)
        overlap = len(set(picks) & set(base_fps)) / len(base_fps)
        # adjacency agreement: top-8 graph neighbors by exp(-(ED+CD))
        adj_e = np.exp(-(ed + cd_exact))
        adj_c = np.exp(-(ed + cd))
        hits = tot = 0
        for i in range(s):
            te = set(np.argsort(-adj_e[i])[:8])
            tc = set(np.argsort(-adj_c[i])[:8])
            hits += len(te & tc)
            tot += 8
        print(json.dumps({
            "cap": cap,
            "rel_err_mean": round(float(rel.mean()), 5),
            "rel_err_p99": round(float(np.percentile(rel, 99)), 5),
            "fps_pick_overlap_at_24": round(overlap, 4),
            "top8_graph_neighbor_agreement": round(hits / tot, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
