"""chamfer MXU-numerics evidence study: is the bf16x3 cross-term form safe?

The deferred Semantic3D chamfer lever (STATUS round 4 #1): the broadcast-
subtraction distance build is exact f32 but VPU-compute-bound at
S~1024/P=512 (38 s of a 52 s selection round). The MXU form
    d2 = |a|^2 + |b|^2 - 2 a.b
moves the 6-of-8 ops per pair onto the systolic array — but CLAUDE.md
records TPU-worker kernel faults from the HIGHEST-precision K=3 einsum, so
the implementation uses a MANUAL bf16 hi/lo split with three
DEFAULT-precision matmuls (the bf16_3x algorithm, f32 accumulation):
    x = hi + lo,  hi = bf16(x),  lo = bf16(x - hi)
    a.b ~= hi_a.hi_b + hi_a.lo_b + lo_a.hi_b     (drop lo.lo: ~2^-16 rel)

This study asks the question that matters (same metrics as
bench_chamfer_cap.py): with bf16x3 cross terms + f32 cancellation, do the
FPS picks and the exp(-(ED+CD)) top-8 graph neighbors move vs exact f32?

CPU/numpy only — emulates the TPU arithmetic bit-for-bit at the algorithm
level (bf16 rounding via ml_dtypes, f32 accumulation order differences are
below the reported digits).

  python scripts/bench_chamfer_mxu.py [--sps 96] [--pts 500]
"""

from __future__ import annotations

import argparse
import json

import ml_dtypes
import numpy as np

BF16 = ml_dtypes.bfloat16


def split_bf16(x):
    """Bitcast round-half-away split, mirroring ops/chamfer._split_bf16
    exactly (this platform's XLA folds convert-round-trip splits to
    lo == 0, so the implementation rounds+masks the low 16 mantissa bits
    by integer arithmetic; hi is then exactly bf16-representable and lo is
    bf16-rounded)."""
    bits = (x.view(np.uint32) + np.uint32(0x8000)) & np.uint32(0xFFFF0000)
    hi = np.frombuffer(bits.tobytes(), np.float32).reshape(x.shape)
    lo = (x - hi).astype(BF16).astype(np.float32)
    return hi, lo


def cross_bf16x3(a, b):
    """a [N,3], b [M,3] -> a @ b.T with the bf16x3 algorithm."""
    ah, al = split_bf16(a)
    bh, bl = split_bf16(b)
    # each product is a bf16xbf16->f32 matmul (exact: 8-bit mantissas,
    # K=3 f32 accumulation)
    return ah @ bh.T + ah @ bl.T + al @ bh.T


def chamfer_exact(a, b):
    d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
    return d.min(1).mean() + d.min(0).mean()


def chamfer_mxu(a, b):
    na = (a * a).sum(-1)  # f32 on the VPU (XLA mxu=True path)
    nb = (b * b).sum(-1)
    d2 = np.maximum(na[:, None] + nb[None, :] - 2.0 * cross_bf16x3(a, b), 0.0)
    d = np.sqrt(d2)
    return d.min(1).mean() + d.min(0).mean()


def chamfer_kernel_pack(a, b):
    """The Pallas kernel's FULL K-packed form: norms ALSO ride the matmul
    as bf16 hi/lo pairs (ops/chamfer._pack_chamfer_operands), so d² comes
    out of one MXU pass with zero VPU assembly."""
    nah, nal = split_bf16((a * a).sum(-1).astype(np.float32))
    nbh, nbl = split_bf16((b * b).sum(-1).astype(np.float32))
    na = nah.astype(BF16).astype(np.float32) + nal.astype(BF16).astype(np.float32)
    nb = nbh.astype(BF16).astype(np.float32) + nbl.astype(BF16).astype(np.float32)
    d2 = np.maximum(na[:, None] + nb[None, :] - 2.0 * cross_bf16x3(a, b), 0.0)
    d = np.sqrt(d2)
    return d.min(1).mean() + d.min(0).mean()


def fps(dists, start, k):
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
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--picks", type=int, default=24)
    args = p.parse_args()

    rng = np.random.RandomState(args.seed)
    sps = []
    for _ in range(args.sps):
        n = int(args.pts * rng.uniform(0.4, 1.8))
        center = rng.rand(3) * 10
        scale = rng.uniform(0.05, 0.6, 3)
        pts = center + rng.randn(n, 3) * scale
        c = (pts.min(0) + pts.max(0)) / 2
        sps.append((pts - c).astype(np.float32))

    s = len(sps)
    centers = np.stack([sp.mean(0) for sp in sps])
    ed = np.linalg.norm(centers[:, None] - centers[None, :], axis=-1)

    def cd_matrix(fn):
        cd = np.zeros((s, s), np.float32)
        for i in range(s):
            for j in range(i + 1, s):
                cd[i, j] = cd[j, i] = fn(sps[i], sps[j])
        return cd

    cd_exact = cd_matrix(chamfer_exact)
    base_fps = fps(ed + cd_exact, 0, args.picks)
    adj_e = np.exp(-(ed + cd_exact))
    off = ~np.eye(s, dtype=bool)

    for form, fn in (("bf16x3_mxu", chamfer_mxu),
                     ("bf16x3_kernel_pack", chamfer_kernel_pack)):
        cd = cd_matrix(fn)
        rel = np.abs(cd - cd_exact)[off] / np.maximum(cd_exact[off], 1e-9)
        picks = fps(ed + cd, 0, args.picks)
        overlap = len(set(picks) & set(base_fps)) / len(base_fps)
        adj_c = np.exp(-(ed + cd))
        hits = tot = 0
        for i in range(s):
            te = set(np.argsort(-adj_e[i])[:8])
            tc = set(np.argsort(-adj_c[i])[:8])
            hits += len(te & tc)
            tot += 8
        print(json.dumps({
            "form": form,
            "rel_err_mean": round(float(rel.mean()), 6),
            "rel_err_p99": round(float(np.percentile(rel, 99)), 6),
            "rel_err_max": round(float(rel.max()), 6),
            "fps_pick_overlap": round(overlap, 4),
            "top8_graph_neighbor_agreement": round(hits / tot, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
