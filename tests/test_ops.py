"""Unit tests for segment / fps / kcenter / chamfer / geof / grid_subsample
against numpy oracles mirroring the reference implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

from ssdr_al_tpu.ops import (
    chamfer_pairwise,
    farthest_feature_sample,
    farthest_superpoint_sample,
    geometric_features,
    grid_subsample_np,
    kcenter_greedy,
    segment_majority,
    segment_mean,
    segment_count,
)
from ssdr_al_tpu.ops.chamfer import chamfer_pairwise_blocks, pad_superpoints
from ssdr_al_tpu.ops.grid_subsample import grid_subsample_jax


# ---------------------------------------------------------------- segment ---
class TestSegment:
    def test_mean_and_count(self, rng):
        vals = rng.randn(100, 4).astype(np.float32)
        seg = rng.randint(0, 7, 100)
        got = np.asarray(segment_mean(vals, seg, 7))
        cnt = np.asarray(segment_count(seg, 7))
        for s in range(7):
            m = seg == s
            np.testing.assert_equal(cnt[s], m.sum())
            if m.any():
                np.testing.assert_allclose(got[s], vals[m].mean(0), rtol=1e-5)

    def test_majority_matches_dominant_label(self, rng):
        # oracle: sampler2.py:102-106 _dominant_label
        labels = rng.randint(0, 5, 200)
        seg = rng.randint(0, 9, 200)
        dom, rate = (np.asarray(x) for x in segment_majority(labels, seg, 9, 5))
        for s in range(9):
            m = seg == s
            if not m.any():
                continue
            hist = np.bincount(labels[m], minlength=5)
            assert dom[s] == hist.argmax()
            np.testing.assert_allclose(rate[s], hist.max() / m.sum(), rtol=1e-6)


# -------------------------------------------------------------------- fps ---
def np_fps(features, start, n_samples):
    """Oracle: fps_gcn_cpu.py:119-147."""
    feats = np.asarray(features, np.float64)
    centroids = np.zeros(n_samples, np.int64)
    centroids[0] = start
    distance = np.full(len(feats), 1e10)
    for i in range(n_samples - 1):
        cur = feats[centroids[i]]
        d = ((feats - cur) ** 2).sum(-1)
        distance = np.minimum(distance, d)
        centroids[i + 1] = distance.argmax()
    return centroids


class TestFPS:
    def test_matches_numpy(self, rng):
        feats = rng.randn(50, 8).astype(np.float32)
        got = np.asarray(farthest_feature_sample(feats, 3, 10))
        want = np_fps(feats, 3, 10)
        np.testing.assert_array_equal(got, want)

    def test_superpoint_fps_with_extra_distance(self, rng):
        # oracle: sampler2.py:49-80 with chamfer replaced by a fixed matrix
        cents = rng.randn(20, 3).astype(np.float32)
        cd = np.abs(rng.randn(20, 20)).astype(np.float32)
        cd = (cd + cd.T) / 2
        np.fill_diagonal(cd, 0)
        got = np.asarray(farthest_superpoint_sample(cents, cd, 0, 6))

        sel = np.zeros(6, np.int64)
        dist = np.full(20, 1e10)
        for i in range(5):
            ed = ((cents - cents[sel[i]]) ** 2).sum(-1)
            d = ed + cd[sel[i]]
            dist = np.minimum(dist, d)
            sel[i + 1] = dist.argmax()
        np.testing.assert_array_equal(got, sel)


# ---------------------------------------------------------------- kcenter ---
def np_kcenter(features, labeled_mask, batch):
    """Oracle: kcenterGreedy.py:60-128."""
    from sklearn.metrics import pairwise_distances

    feats = np.asarray(features, np.float64)
    centers = np.where(labeled_mask)[0]
    min_d = pairwise_distances(feats, feats[centers]).min(1)
    min_d[labeled_mask] = 0.0
    picked = []
    for _ in range(batch):
        cand = min_d.copy()
        cand[labeled_mask] = -1
        ind = cand.argmax()
        picked.append(ind)
        min_d = np.minimum(min_d, pairwise_distances(feats, feats[[ind]]).ravel())
    return np.array(picked)


class TestKCenter:
    def test_matches_sklearn_oracle(self, rng):
        feats = rng.randn(64, 16).astype(np.float32)
        mask = np.zeros(64, bool)
        mask[rng.choice(64, 10, replace=False)] = True
        got = np.asarray(kcenter_greedy(feats, mask, 8, chunk=32))
        want = np_kcenter(feats, mask, 8)
        np.testing.assert_array_equal(got, want)
        assert not mask[got].any()


# ---------------------------------------------------------------- chamfer ---
def np_chamfer_pairwise(clouds):
    """Oracle: fps_gcn_cpu.py:12-38 (KDTree replaced by brute force),
    including bbox-centroid alignment."""
    aligned = []
    for c in clouds:
        center = (c.min(0) + c.max(0)) / 2
        aligned.append(c - center)
    s = len(clouds)
    cd = np.zeros((s, s))
    for i in range(s):
        for j in range(s):
            if i == j:
                continue
            d = np.sqrt(((aligned[i][:, None] - aligned[j][None]) ** 2).sum(-1))
            cd[i, j] = d.min(1).mean() + d.min(0).mean()
    return cd


class TestChamfer:
    def test_matches_oracle_ragged(self, rng):
        clouds = [rng.randn(n, 3).astype(np.float32) for n in (17, 5, 30, 11)]
        pts, msk = pad_superpoints(clouds)
        got = np.asarray(chamfer_pairwise(pts, msk, row_chunk=2))
        want = np_chamfer_pairwise(clouds)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_symmetric_zero_diag(self, rng):
        clouds = [rng.randn(8, 3).astype(np.float32) for _ in range(5)]
        pts, msk = pad_superpoints(clouds)
        got = np.asarray(chamfer_pairwise(pts, msk))
        np.testing.assert_allclose(got, got.T, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.diag(got), 0, atol=1e-6)

    def test_target_chunking_invariant(self, rng):
        """Big shapes take the multi-target-chunk path (S=24, P=512 →
        tc<s_pad); the result must equal the single-chunk computation —
        the decomposition that fixed the TPU-worker crash at huge-anchor
        rounds must be value-preserving."""
        clouds = [rng.randn(rng.randint(100, 512), 3).astype(np.float32)
                  for _ in range(24)]
        pts, msk = pad_superpoints(clouds)
        assert pts.shape[1] >= 450  # ensures p*p*rc exceeds the tc budget
        multi = np.asarray(chamfer_pairwise(pts, msk, row_chunk=8))
        single = np.asarray(chamfer_pairwise(pts, msk, row_chunk=1))
        np.testing.assert_allclose(multi, single, rtol=1e-5, atol=1e-6)
        # spot-check two pairs against the numpy oracle
        want = np_chamfer_pairwise(clouds[:3])
        np.testing.assert_allclose(multi[:3, :3], want, rtol=1e-4, atol=1e-4)

    def test_mxu_form_matches_exact(self, rng):
        """The bf16x3 MXU distance build (d² = |a|²+|b|²−2a·b with a K=9
        hi/lo-split matmul) must track the exact VPU form to the studied
        tolerance (scripts/bench_chamfer_mxu.py: rel err ≤ ~5e-5), with
        identical masking semantics (ragged pads, empty superpoints)."""
        clouds = [
            (rng.randn(n, 3) * rng.uniform(0.05, 0.6, 3)).astype(np.float32)
            for n in rng.randint(20, 200, size=12)
        ]
        pts, msk = pad_superpoints(clouds)
        # inject an EMPTY superpoint (all-False mask row) — must stay the
        # ~sqrt(_BIG) isolated-node sentinel in both forms
        pts[4] = 0.0
        msk[4] = False
        exact = np.asarray(chamfer_pairwise(pts, msk, 8, False))
        got = np.asarray(chamfer_pairwise(pts, msk, 8, True))
        finite = exact < 1e9
        off = ~np.eye(len(clouds), dtype=bool)
        sel = finite & off
        rel = np.abs(got - exact)[sel] / np.maximum(exact[sel], 1e-9)
        assert rel.max() < 5e-4, rel.max()
        assert (got[~finite] > 1e12).all()  # empty region stays isolated
        np.testing.assert_allclose(np.diag(got), 0, atol=1e-6)

    def test_pallas_kernel_matches_exact_interpret(self, rng):
        """The fused MXU chamfer kernel (interpret mode on CPU; the real
        Mosaic compile is gated on TPU in test_tpu_gates). Checks the full
        packed form — bf16x3 cross term + bf16x2 norms in one K=16 matmul —
        plus the sentinel masking: padded tails excluded from the sums,
        empty superpoints isolated, zero diagonal."""
        from ssdr_al_tpu.ops.chamfer import chamfer_pairwise_blocks_pallas

        c, s, p = 2, 16, 128
        pts = (rng.randn(c, s, p, 3)
               * rng.uniform(0.05, 0.6, (c, s, 1, 3))).astype(np.float32)
        msk = np.ones((c, s, p), bool)
        for ci in range(c):
            for i in range(s):
                n = rng.randint(p // 3, p + 1)
                msk[ci, i, n:] = False
                pts[ci, i, n:] = 0
        pts[0, 5] = 0
        msk[0, 5] = False  # empty region
        e = np.asarray(chamfer_pairwise_blocks(
            jnp.asarray(pts), jnp.asarray(msk), 8, False))
        k = np.asarray(chamfer_pairwise_blocks_pallas(
            jnp.asarray(pts), jnp.asarray(msk), True))
        off = ~np.eye(s, dtype=bool)[None].repeat(c, 0)
        fin = off & (e < 1e9)
        rel = np.abs(k - e)[fin] / np.maximum(e[fin], 1e-9)
        assert rel.max() < 5e-4, rel.max()
        assert (k[off & ~(e < 1e9)] > 1e12).all()
        assert np.abs(k[:, np.arange(s), np.arange(s)]).max() == 0.0

    def test_kernel_shape_gates(self):
        """The kernel's safety gates (platform-independent parts): the
        C·S·P footprint cap keeps the packed operands under this platform's
        ~500 MB single-buffer worker-crash line, S % 8 rejects degenerate
        ti=tj=1 grids (arbitrary per-round S would also Mosaic-recompile
        every round), and P must be lane-sliceable."""
        from ssdr_al_tpu.ops.chamfer import (
            _CSP_CAP,
            _pallas_tiles,
            _subchunk,
        )

        assert _pallas_tiles(1024, 512) == (8, 8)
        assert _pallas_tiles(1023, 512) is None        # S % 8
        assert _pallas_tiles(256, 192) is None         # P % 128
        assert _pallas_tiles(256, 2048) is None        # P cap
        # footprint: the production 8x1024x512 dispatch runs in ONE
        # dispatch; the next ladder rung (S=2048, 537 MB packed operands)
        # must sub-chunk the block axis instead of losing kernel coverage
        assert _subchunk(8, 1024, 512) == 8
        assert _subchunk(8, 2048, 512) == 4
        assert _subchunk(16, 1024, 512) == 8
        # sub sizes are always divisors of C (non-power-of-two groups)
        assert _subchunk(6, 1024, 512) == 2
        assert _subchunk(5, 1024, 512) == 1
        # a SINGLE block over the cap cannot run at all
        assert _subchunk(8, 8192, 1024) == 0
        for c, s, p in [(8, 2048, 512), (16, 1024, 512), (6, 1024, 512)]:
            sub = _subchunk(c, s, p)
            assert c % sub == 0 and sub * s * p <= _CSP_CAP
        # the jitted entry enforces the per-dispatch cap (callers that skip
        # the supports check must not be able to crash the worker)
        from ssdr_al_tpu.ops.chamfer import chamfer_pairwise_blocks_pallas

        with pytest.raises(ValueError, match="unsupported"):
            chamfer_pairwise_blocks_pallas(
                jnp.zeros((8, 2048, 512, 3), jnp.float32),
                jnp.zeros((8, 2048, 512), bool), True)

    def test_chunked_matches_unchunked_interpret(self, rng, monkeypatch):
        """Block-axis sub-chunking is exact: with the live-buffer cap
        lowered so _subchunk splits C=4 into 2 sub-dispatches, the chunked
        wrapper must reproduce the single-dispatch kernel bitwise (blocks
        are independent; interpret mode on CPU, real Mosaic compile in
        test_tpu_gates)."""
        import ssdr_al_tpu.ops.chamfer as ch

        c, s, p = 4, 16, 128
        pts = (rng.randn(c, s, p, 3)
               * rng.uniform(0.05, 0.6, (c, s, 1, 3))).astype(np.float32)
        msk = np.ones((c, s, p), bool)
        msk[:, :, p // 2:] = False
        pts[~msk[..., None].repeat(3, -1).reshape(c, s, p, 3)] = 0.0
        full = np.asarray(ch.chamfer_pairwise_blocks_pallas(
            jnp.asarray(pts), jnp.asarray(msk), True))
        monkeypatch.setattr(ch, "_CSP_CAP", 2 * s * p)
        assert ch._subchunk(c, s, p) == 2
        got = np.asarray(ch.chamfer_pairwise_blocks_pallas_chunked(
            jnp.asarray(pts), jnp.asarray(msk), True))
        np.testing.assert_array_equal(got, full)
        # gathered-slab variant chunks identically (interpret passthrough
        # not exposed there — check the pure chunk/concat logic instead by
        # restoring the cap and comparing against the one-dispatch result)
        monkeypatch.setattr(ch, "_CSP_CAP", 5_242_880)
        idx = jnp.asarray(np.array([2, 0, 3, 1], np.int32))
        g_full = np.asarray(ch.chamfer_pairwise_blocks_pallas(
            jnp.asarray(pts)[idx], jnp.asarray(msk)[idx], True))
        np.testing.assert_array_equal(full[np.array([2, 0, 3, 1])], g_full)


# ------------------------------------------------------------------- geof ---
def np_geof(xyz, neighbor_idx):
    """Oracle: partition/ply_c/ply_c.cpp:385-464."""
    n, k = neighbor_idx.shape
    out = np.zeros((n, 4), np.float64)
    for i in range(n):
        pos = np.vstack([xyz[i : i + 1], xyz[neighbor_idx[i]]])
        centered = pos - pos.mean(0)
        cov = centered.T @ centered / (k + 1)
        w, v = np.linalg.eigh(cov)
        order = np.argsort(-w)
        lam = np.maximum(w[order], 0)
        vec = v[:, order]
        sq = np.sqrt(lam)
        out[i, 0] = (sq[0] - sq[1]) / sq[0]
        out[i, 1] = (sq[1] - sq[2]) / sq[0]
        out[i, 2] = sq[2] / sq[0]
        unary = (lam[None, :] * np.abs(vec)).sum(1)
        out[i, 3] = unary[2] / np.linalg.norm(unary)
    return out


class TestGeof:
    def test_matches_oracle(self, rng):
        xyz = rng.randn(200, 3).astype(np.float32)
        d2 = ((xyz[:, None] - xyz[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        nb = np.argsort(d2, 1)[:, :10].astype(np.int32)
        got = np.asarray(geometric_features(xyz, nb, chunk=64))
        want = np_geof(xyz, nb)
        # f32 closed-form vs f64 LAPACK: ~1e-2 jitter on near-degenerate
        # neighborhoods (the reference's f32 Eigen solver has the same noise)
        np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)

    def test_planar_cloud_is_planar(self, rng):
        xyz = rng.randn(100, 3).astype(np.float32)
        xyz[:, 2] = 0.0
        d2 = ((xyz[:, None] - xyz[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        nb = np.argsort(d2, 1)[:, :15].astype(np.int32)
        feats = np.asarray(geometric_features(xyz, nb))
        assert feats[:, 1].mean() > 0.5  # planarity dominates
        assert feats[:, 2].max() < 0.1   # no scattering


# -------------------------------------------------------- grid subsample ---
def np_grid_oracle(points, labels, grid_size):
    """Oracle mirroring grid_subsampling.cpp:4-106 voxel semantics."""
    origin = np.floor(points.min(0) / grid_size) * grid_size
    ij = np.floor((points - origin) / grid_size).astype(np.int64)
    vox = {}
    for p, l, key in zip(points, labels, map(tuple, ij)):
        vox.setdefault(key, []).append((p, l))
    pts, labs = [], []
    for key, items in vox.items():
        ps = np.array([p for p, _ in items])
        ls = [l for _, l in items]
        pts.append(ps.mean(0))
        labs.append(np.bincount(ls).argmax())
    return np.array(pts), np.array(labs)


class TestGridSubsample:
    def test_matches_oracle(self, rng):
        pts = (rng.rand(500, 3) * 2).astype(np.float32)
        labels = rng.randint(0, 4, 500)
        sub_pts, sub_lab = grid_subsample_np(pts, labels=labels, grid_size=0.25)
        want_pts, want_lab = np_grid_oracle(pts, labels, 0.25)
        # compare as sets (order is implementation-defined in the reference)
        got = sorted(map(tuple, np.round(sub_pts, 5)))
        want = sorted(map(tuple, np.round(want_pts, 5)))
        np.testing.assert_allclose(got, want, atol=1e-4)
        # labels follow their voxel
        order_got = np.lexsort(sub_pts.T)
        order_want = np.lexsort(want_pts.T)
        np.testing.assert_array_equal(sub_lab[order_got], want_lab[order_want])

    def test_features_mean(self, rng):
        pts = (rng.rand(300, 3) * 1.5).astype(np.float32)
        feats = rng.rand(300, 5).astype(np.float32)
        sub_pts, sub_feat = grid_subsample_np(pts, features=feats, grid_size=0.5)
        assert sub_feat.shape == (len(sub_pts), 5)
        assert sub_feat.min() >= 0 and sub_feat.max() <= 1

    def test_jax_matches_np(self, rng):
        pts = (rng.rand(400, 3) * 2).astype(np.float32)
        labels = rng.randint(0, 3, 400)
        sub_pts, sub_lab = grid_subsample_np(pts, labels=labels, grid_size=0.3)
        jp, _, jl, valid = grid_subsample_jax(
            pts, 0.3, max_voxels=512, labels=labels, num_classes=3
        )
        jp, jl, valid = np.asarray(jp), np.asarray(jl), np.asarray(valid)
        assert valid.sum() == len(sub_pts)
        got = sorted(map(tuple, np.round(jp[valid], 5)))
        want = sorted(map(tuple, np.round(sub_pts, 5)))
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestGatherHelpers:
    """CPU-testable pieces of the windowed gather (the pallas kernel itself
    is TPU-gated in tests/test_knn.py::TestSortedFastPath)."""

    def test_tile_min_starts_bounds(self, rng):
        from ssdr_al_tpu.ops.gather import tile_min_starts

        n, nq, k, tq, w = 4096, 1024, 16, 128, 1024
        idx = rng.randint(0, n, (2, nq, k)).astype(np.int32)
        starts = np.asarray(tile_min_starts(jnp.asarray(idx), n, w, tq))
        assert starts.shape == (2, nq // tq)
        assert (starts % 128 == 0).all()
        assert (starts >= 0).all() and (starts <= n - w).all()
        # each tile's min index is inside its window
        mins = idx.reshape(2, nq // tq, tq * k).min(-1)
        assert (mins >= starts).all()

    def test_window_violations_counts(self, rng):
        from ssdr_al_tpu.ops.gather import window_violations

        nq, k, tq = 256, 4, 128
        # tile 0 spans [0, 500) — fits a 1024 window; tile 1 spans [0, 5000)
        idx = np.zeros((1, nq, k), np.int32)
        idx[0, :tq] = rng.randint(0, 500, (tq, k))
        idx[0, tq:] = rng.randint(0, 5000, (tq, k))
        idx[0, tq] = [0, 4999, 0, 0]  # force the wide spread
        v = int(window_violations(jnp.asarray(idx), 1024, tq))
        assert v == 1
        assert int(window_violations(jnp.asarray(idx), 8192, tq)) == 0

    def test_pool_spread_fits_window(self, rng):
        """The sorted-pyramid pool invariant random_sample relies on: for a
        random kept subset (1/ratio prefix of a shuffled order), the per-tile
        index spread of pool_idx = neigh[kept_pos] stays within the search
        window + 2048 slack (models/randlanet.py random_sample)."""
        from ssdr_al_tpu.ops.gather import window_violations

        n, ratio, k, tq, w_search = 40960, 4, 16, 128, 3840
        n_sub = n // ratio
        perm = rng.permutation(n)
        kept_pos = np.sort(np.where(perm < n_sub)[0]).astype(np.int32)
        # emulate the self-search window invariant: neigh of tile t lies in
        # [start_t, start_t + w); starts step 256 per search tile
        neigh = np.zeros((n, k), np.int32)
        for t in range(n // 256):
            lo = min(max(t * 256 + 128 - w_search // 2, 0), n - w_search)
            lo = (lo // 128) * 128
            neigh[t * 256:(t + 1) * 256] = rng.randint(
                lo, lo + w_search, (256, k))
        pool_idx = neigh[kept_pos][None]
        v = int(window_violations(jnp.asarray(pool_idx), w_search + 2048, tq))
        assert v == 0
