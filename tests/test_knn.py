"""KNN kernels vs numpy brute-force oracle (SURVEY.md §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssdr_al_tpu.ops import knn_pallas, knn_xla


def brute_knn(support, query, k):
    d2 = ((query[:, None, :] - support[None, :, :]) ** 2).sum(-1)
    return np.argsort(d2, axis=1, kind="stable")[:, :k], np.sort(d2, axis=1)[:, :k]


def check_engine(fn, rng, ns, nq, k, batch=2, **kw):
    support = rng.randn(batch, ns, 3).astype(np.float32)
    query = rng.randn(batch, nq, 3).astype(np.float32)
    got = np.asarray(fn(support, query, k, **kw))
    assert got.shape == (batch, nq, k)
    for b in range(batch):
        _, want_d2 = brute_knn(support[b], query[b], k)
        got_d2 = ((query[b][:, None, :] - support[b][got[b]]) ** 2).sum(-1)
        # compare distances (ties make index comparison ambiguous)
        np.testing.assert_allclose(
            np.sort(got_d2, axis=1), want_d2, rtol=1e-4, atol=1e-5
        )


class TestKnnXLA:
    def test_small(self, rng):
        check_engine(knn_xla, rng, ns=100, nq=60, k=8)

    def test_chunked(self, rng):
        # forces both query and support chunking paths
        check_engine(knn_xla, rng, ns=1000, nq=700, k=16,
                     query_chunk=256, support_chunk=256)

    def test_self_query(self, rng):
        pts = rng.randn(1, 300, 3).astype(np.float32)
        idx = np.asarray(knn_xla(pts, pts, 1))
        np.testing.assert_array_equal(idx[0, :, 0], np.arange(300))

    def test_k1_upsample_semantics(self, rng):
        # up_i = knn(sub_points, all_points, 1) as in s3dis_dataset.py:170
        sub = rng.randn(1, 64, 3).astype(np.float32)
        full = rng.randn(1, 256, 3).astype(np.float32)
        idx = np.asarray(knn_xla(sub, full, 1))
        d2 = ((full[0][:, None] - sub[0][None]) ** 2).sum(-1)
        np.testing.assert_array_equal(idx[0, :, 0], d2.argmin(1))

    def test_sorted_by_distance(self, rng):
        support = rng.randn(1, 500, 3).astype(np.float32)
        query = rng.randn(1, 100, 3).astype(np.float32)
        idx = np.asarray(knn_xla(support, query, 16))
        d2 = ((query[0][:, None, :] - support[0][idx[0]]) ** 2).sum(-1)
        assert (np.diff(d2, axis=1) >= -1e-6).all()


def _on_tpu():
    import jax

    return jax.default_backend() == "tpu"


@pytest.mark.skipif(
    not _on_tpu(),
    reason="Pallas TPU kernel; interpret mode on this CPU is prohibitively "
    "slow — the kernel is validated on real TPU by bench.py and by running "
    "pytest with JAX_PLATFORMS=tpu",
)
class TestKnnPallas:
    def test_matches_oracle(self, rng):
        check_engine(knn_pallas, rng, ns=512, nq=256, k=16, batch=1,
                     tile_q=128, tile_s=256)

    def test_padded_sizes(self, rng):
        check_engine(knn_pallas, rng, ns=300, nq=130, k=8, batch=1,
                     tile_q=128, tile_s=128)


class TestKnnWindow:
    def test_recall_on_scene(self, rng):
        """Morton-window engine must keep ≥0.93 recall on scene-like data
        (the model-pyramid default; tighter 0.97 gate runs on TPU where the
        pallas impl is active)."""
        from ssdr_al_tpu.data.synthetic import make_room
        from ssdr_al_tpu.ops.knn import knn_window

        room = make_room(rng, "r", num_points=8000)
        pts = room.xyz[None]
        idx = np.asarray(knn_window(pts, pts, 16, window=2048))
        d2 = ((pts[0][:500, None] - pts[0][None]) ** 2).sum(-1)
        exact = [set(r) for r in np.argsort(d2, 1)[:, :16]]
        got = idx[0][:500]
        recall = np.mean([len(set(g) & e) / 16 for g, e in zip(got, exact)])
        assert recall >= 0.93, recall

    def test_two_probe_lifts_recall(self, rng):
        """probes=2 (shifted-grid second window, exact-distance merge) must
        strictly improve recall over a single probe, return valid ids, and
        never return duplicate neighbors."""
        from ssdr_al_tpu.data.synthetic import make_room
        from ssdr_al_tpu.ops.knn import knn_window

        room = make_room(rng, "r", num_points=8000)
        pts = room.xyz[None]
        k, w = 16, 512  # small window: recall gap large enough to measure
        i1 = np.asarray(knn_window(pts, pts, k, window=w))
        i2 = np.asarray(knn_window(pts, pts, k, window=w, probes=2))
        assert (i2 >= 0).all() and (i2 < pts.shape[1]).all()
        # no duplicates within a row
        assert all(len(set(r)) == k for r in i2[0][:500])
        d2 = ((pts[0][:500, None] - pts[0][None]) ** 2).sum(-1)
        exact = [set(r) for r in np.argsort(d2, 1)[:, :k]]

        def recall(idx):
            return np.mean([len(set(g) & e) / k
                            for g, e in zip(idx[0][:500], exact)])

        r1, r2 = recall(i1), recall(i2)
        assert r2 > r1 + 0.01, (r1, r2)
        # dual probes at half-window should be competitive with the single
        # probe at full window (the equal-cost comparison; measured
        # single 0.887 / dual 0.937 / single-2w 0.954 on this scene)
        ifull = np.asarray(knn_window(pts, pts, k, window=2 * w))
        assert r2 >= recall(ifull) - 0.03, (r2, recall(ifull))

    def test_small_cloud_falls_back_exact(self, rng):
        from ssdr_al_tpu.ops.knn import knn_window

        pts = rng.randn(1, 100, 3).astype(np.float32)
        idx = np.asarray(knn_window(pts, pts, 8))
        _, want_d2 = brute_knn(pts[0], pts[0], 8)
        got_d2 = ((pts[0][:, None, :] - pts[0][idx[0]]) ** 2).sum(-1)
        np.testing.assert_allclose(np.sort(got_d2, 1), want_d2, rtol=1e-4,
                                   atol=1e-5)

    def test_upsample_k1_correct(self, rng):
        from ssdr_al_tpu.ops.knn import knn_window

        pts = rng.rand(1, 6000, 3).astype(np.float32)
        sub = pts[:, :1500]
        idx = np.asarray(knn_window(sub, pts, 1, window=1024))
        d2 = ((pts[0][:300, None] - sub[0][None]) ** 2).sum(-1)
        want = d2.argmin(1)
        agree = (idx[0][:300, 0] == want).mean()
        assert agree > 0.93, agree


class TestHilbertCurve:
    """hilbert_codes must be a true Hilbert curve: a bijection on the grid
    whose consecutive codes are L1-adjacent cells (the locality property the
    window engine buys recall with). Validated on the transpose core with
    exact integer coordinates — the float quantization (×(2^b−1), same as
    morton's ×1023) can merge adjacent cells and is irrelevant to recall."""

    @pytest.mark.parametrize("bits", [2, 3, 4])
    def test_bijective_and_unit_steps(self, bits):
        from ssdr_al_tpu.ops.knn import _hilbert_transpose, _part1by2

        n = 1 << bits
        I, J, K = np.meshgrid(*([np.arange(n)] * 3), indexing="ij")
        cells = np.stack([I.ravel(), J.ravel(), K.ravel()], -1)
        q = jnp.asarray(cells.astype(np.int32))
        x0, x1, x2 = _hilbert_transpose(q, bits)
        code = np.asarray((_part1by2(x0) << 2) | (_part1by2(x1) << 1)
                          | _part1by2(x2))
        assert len(np.unique(code)) == n ** 3
        assert code.min() == 0 and code.max() == n ** 3 - 1
        steps = np.abs(np.diff(cells[np.argsort(code)], axis=0)).sum(1)
        assert steps.max() == 1

    def test_window_engine_accepts_curve(self, rng):
        """curve='hilbert' runs through knn_window and returns valid,
        duplicate-free neighbor ids with recall at least on par with
        morton at the same small window (its defining advantage)."""
        from ssdr_al_tpu.data.synthetic import make_room
        from ssdr_al_tpu.ops.knn import knn_window

        room = make_room(rng, "r", num_points=8000)
        pts = room.xyz[None]
        k, w = 16, 512
        d2 = ((pts[0][:400, None] - pts[0][None]) ** 2).sum(-1)
        exact = [set(r) for r in np.argsort(d2, 1)[:, :k]]

        def recall(curve):
            idx = np.asarray(knn_window(pts, pts, k, window=w, curve=curve))
            assert (idx >= 0).all() and (idx < pts.shape[1]).all()
            assert all(len(set(r)) == k for r in idx[0][:200])
            return np.mean([len(set(g) & e) / k
                            for g, e in zip(idx[0][:400], exact)])

        rm, rh = recall("morton"), recall("hilbert")
        assert rh >= rm - 0.01, (rm, rh)


@pytest.mark.parametrize("n,k", [(40960 // 16, 16)])
def test_layer_shapes_smoke(rng, n, k):
    """Downsampled layer sizes from ConfigS3DIS compile and run."""
    pts = rng.randn(1, n, 3).astype(np.float32)
    idx = np.asarray(knn_xla(pts, pts, k))
    assert idx.shape == (1, n, k)
    assert (idx >= 0).all() and (idx < n).all()


class TestScatterVmemGuard:
    """The backward scatter kernel holds the whole value slab in VMEM twice;
    oversize shapes must take the XLA scatter-add fallback (a pool-L1-shaped
    gather compiled into a train step OOMed the 16M scoped vmem limit when
    this guard was missing)."""

    def test_production_shapes(self):
        from ssdr_al_tpu.ops.gather import _scatter_fits_vmem, _scatter_parts

        assert _scatter_fits_vmem(40960, 16, 512, 16)      # LFA L0
        # pool L0 measured 16.86M scoped with the bf16 gather output
        # (3·n·c·4 + 4·tq·k·c·4) → whole-slab launch doesn't fit ...
        assert not _scatter_fits_vmem(40960, 32, 128, 16)
        assert not _scatter_fits_vmem(10240, 128, 128, 16)  # pool L1
        # ... but the channel-split backward recovers both from the XLA
        # scatter-add fallback
        assert _scatter_parts(40960, 16, 512, 16) == 1      # LFA L0 whole
        assert _scatter_parts(40960, 32, 128, 16) == 2      # pool L0 halves
        assert _scatter_parts(10240, 128, 128, 16) == 2     # pool L1 halves
        # un-splittable oversize shapes still fall back
        assert _scatter_parts(10_000_000, 16, 128, 16) == 0


class TestSortedFastPath:
    """TPU-only: the sorted-space pyramid + windowed MXU gather fast path."""

    @pytest.fixture(autouse=True)
    def _tpu_only(self):
        if jax.default_backend() != "tpu":
            pytest.skip("sorted fast path runs on TPU only")

    def test_gather_window_matches_xla_gather(self, rng):
        from ssdr_al_tpu.ops.gather import gather_window

        N, k, W, TQ, B, C = 2048, 16, 1024, 128, 2, 16
        pos = np.arange(N)
        starts = np.clip(((pos[::TQ]) // 128) * 128 - W // 2, 0, N - W)
        starts = ((starts // 128) * 128).astype(np.int32)
        idx = np.zeros((N, k), np.int32)
        for t in range(N // TQ):
            idx[t * TQ:(t + 1) * TQ] = rng.randint(
                starts[t], starts[t] + W, (TQ, k))
        f = rng.rand(B, N, C).astype(np.float32)
        out = np.asarray(gather_window(
            jnp.asarray(f), jnp.asarray(np.broadcast_to(idx, (B, N, k))).copy(),
            jnp.asarray(np.broadcast_to(starts, (B, len(starts)))).copy(),
            W, TQ,
        ))
        for b in range(B):
            # values round to bf16 inside the kernel
            np.testing.assert_allclose(out[b], f[b][idx], rtol=1e-2, atol=1e-3)

    def test_gather_window_backward_matches_scatter(self, rng):
        """The Pallas transpose-scatter backward must agree with the XLA
        scatter-add oracle (up to bf16 cotangent rounding)."""
        import jax

        from ssdr_al_tpu.ops.gather import gather_window

        N, k, W, TQ, B, C = 2048, 16, 1024, 128, 2, 16
        pos = np.arange(N)
        starts = np.clip(((pos[::TQ]) // 128) * 128 - W // 2, 0, N - W)
        starts = ((starts // 128) * 128).astype(np.int32)
        idx = np.zeros((N, k), np.int32)
        for t in range(N // TQ):
            idx[t * TQ:(t + 1) * TQ] = rng.randint(
                starts[t], starts[t] + W, (TQ, k))
        f = rng.rand(B, N, C).astype(np.float32)
        w = rng.rand(B, N, k, C).astype(np.float32)
        idx_b = jnp.asarray(np.broadcast_to(idx, (B, N, k))).copy()
        st_b = jnp.asarray(np.broadcast_to(starts, (B, len(starts)))).copy()
        wd = jnp.asarray(w)

        def loss(v):
            out = gather_window(v, idx_b, st_b, W, TQ)
            return jnp.sum(out * wd)

        dv = np.asarray(jax.jit(jax.grad(loss))(jnp.asarray(f)))
        want = np.zeros((B, N, C), np.float32)
        for b in range(B):
            np.add.at(want[b], idx.reshape(-1),
                      w[b].reshape(-1, C))
        scale = np.abs(want).max()
        np.testing.assert_allclose(dv / scale, want / scale,
                                   rtol=0, atol=1.5e-2)

    def test_gather_window_backward_split_matches_scatter(self, rng,
                                                          monkeypatch):
        """The channel-split scatter backward (forced parts=2 via the fit
        gate) must agree with the XLA scatter-add oracle — the pool-L0/L1
        recovery path."""
        import jax

        from ssdr_al_tpu.ops import gather as gmod

        N, k, W, TQ, B, C = 2048, 16, 1024, 128, 2, 32
        # force the split decision at this small shape: whole-C doesn't
        # "fit", C/2 does
        real_fits = gmod._scatter_fits_vmem
        monkeypatch.setattr(
            gmod, "_scatter_fits_vmem",
            lambda n, c, tq, kk: c < C and real_fits(n, c, tq, kk))
        assert gmod._scatter_parts(N, C, TQ, k) == 2
        pos = np.arange(N)
        starts = np.clip(((pos[::TQ]) // 128) * 128 - W // 2, 0, N - W)
        starts = ((starts // 128) * 128).astype(np.int32)
        idx = np.zeros((N, k), np.int32)
        for t in range(N // TQ):
            idx[t * TQ:(t + 1) * TQ] = rng.randint(
                starts[t], starts[t] + W, (TQ, k))
        f = rng.rand(B, N, C).astype(np.float32)
        w = rng.rand(B, N, k, C).astype(np.float32)
        idx_b = jnp.asarray(np.broadcast_to(idx, (B, N, k))).copy()
        st_b = jnp.asarray(np.broadcast_to(starts, (B, len(starts)))).copy()
        wd = jnp.asarray(w)

        def loss(v):
            out = gmod.gather_window(v, idx_b, st_b, W, TQ)
            return jnp.sum(out * wd)

        dv = np.asarray(jax.jit(jax.grad(loss))(jnp.asarray(f)))
        want = np.zeros((B, N, C), np.float32)
        for b in range(B):
            np.add.at(want[b], idx.reshape(-1), w[b].reshape(-1, C))
        scale = np.abs(want).max()
        np.testing.assert_allclose(dv / scale, want / scale,
                                   rtol=0, atol=1.5e-2)

    def test_sorted_model_matches_original_order(self, rng):
        """Same search windows → same neighbor sets; logits differ only by
        bf16 gather rounding (VERDICT r1 #7: a loud gate for the fast path)."""
        import dataclasses

        from ssdr_al_tpu.config import ConfigS3DIS
        from ssdr_al_tpu.models.randlanet import RandLANet, build_pyramid

        cfg = ConfigS3DIS
        model = RandLANet(cfg)
        B = 2
        xyz = (rng.rand(B, cfg.num_points, 3) * 10).astype(np.float32)
        feats = np.concatenate(
            [xyz, rng.rand(B, cfg.num_points, 3).astype(np.float32)], -1)
        xd, fd = jnp.asarray(xyz), jnp.asarray(feats)

        @jax.jit
        def init(key, x, f):
            return model.init({"params": key}, f,
                              build_pyramid(x, cfg, engine="window_og"), False)

        v = init(jax.random.PRNGKey(0), xd, fd)
        # randomize params so activations are O(1), keep BN var positive
        leaves, treedef = jax.tree_util.tree_flatten(v)
        key = jax.random.PRNGKey(42)
        new = []
        for leaf in leaves:
            key, k2 = jax.random.split(key)
            new.append(jax.random.normal(k2, leaf.shape, leaf.dtype) * 0.3)
        v2 = jax.tree_util.tree_unflatten(treedef, new)
        v2 = jax.tree_util.tree_map_with_path(
            lambda pth, x: jnp.abs(x) + 0.5
            if any(getattr(q, "key", "") == "var" for q in pth) else x, v2)

        og = jax.jit(lambda x, f: model.apply(
            v2, f, build_pyramid(x, cfg, engine="window_og"), False))
        fast = jax.jit(lambda x, f: model.apply(
            v2, f, build_pyramid(x, cfg, engine="window"), False))
        lo, _ = og(xd, fd)
        lf, _ = fast(xd, fd)
        lo, lf = np.asarray(lo), np.asarray(lf)
        scale = np.abs(lo).max()
        assert scale > 1.0  # the comparison is not vacuous
        # both paths approximate the up-search window slightly differently
        # (cumsum starts vs searchsorted-median starts), so this is a
        # two-approximations comparison, not bit parity: bound the logit
        # drift and require near-total prediction agreement
        rel = np.abs(lo - lf).max() / scale
        assert rel < 0.12, f"fast path diverged: rel diff {rel}"
        agree = (lo.argmax(-1) == lf.argmax(-1)).mean()
        assert agree > 0.95, f"pred agreement {agree}"
