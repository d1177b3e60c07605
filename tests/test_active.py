"""AL engine tests: uncertainty, oracle bookkeeping, state store, FPS-GCN."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from ssdr_al_tpu.active.oracle import (
    dominant_label,
    oracle_labeling,
    seed_labeling,
    sub_regions_by_predicted_class,
)
from ssdr_al_tpu.active.state import ALState, RoundStats, sampler_args_str
from ssdr_al_tpu.active.uncertainty import (
    add_classbal,
    add_clsbal,
    point_uncertainty,
    region_uncertainty,
)


# ----------------------------------------------------------- uncertainty ---
def np_region_unc(unc, cls, seg, s, c, mode):
    """Oracle: sampler2.py:12-26 per-region loop."""
    out = np.zeros(s)
    for i in range(s):
        m = seg == i
        if not m.any():
            continue
        u, k = unc[m], cls[m]
        if mode == "mean":
            out[i] = u.mean()
        elif mode == "sum_weight":
            dist = np.bincount(k, minlength=c) / len(k)
            out[i] = (dist[k] * u).sum()
        elif mode == "WetSU":
            d = np.bincount(k, minlength=c).argmax()
            eq = (k == d).astype(float)
            out[i] = (u * eq).sum() - (u * (1 - eq)).sum()
    return out


class TestUncertainty:
    def test_point_modes_match_numpy(self, rng):
        p = rng.rand(100, 7).astype(np.float32)
        p /= p.sum(1, keepdims=True)
        # lc
        np.testing.assert_allclose(
            np.asarray(point_uncertainty(p, "lc")), 1 - p.max(1), rtol=1e-6
        )
        # entropy (0 log 0 = 0)
        ent = -(p * np.where(p > 0, np.log2(p), 0)).sum(1)
        np.testing.assert_allclose(
            np.asarray(point_uncertainty(p, "entropy")), ent, rtol=1e-4
        )
        # sb
        srt = np.sort(p, 1)
        np.testing.assert_allclose(
            np.asarray(point_uncertainty(p, "sb")), srt[:, -2] / srt[:, -1],
            rtol=1e-5,
        )

    @pytest.mark.parametrize("mode", ["mean", "sum_weight", "WetSU"])
    def test_region_modes_match_numpy(self, rng, mode):
        n, s, c = 300, 11, 5
        unc = rng.rand(n).astype(np.float32)
        cls = rng.randint(0, c, n)
        seg = rng.randint(0, s, n)
        got = np.asarray(region_uncertainty(
            jnp.asarray(unc), jnp.asarray(cls), jnp.asarray(seg), s, c, mode
        ))
        want = np_region_unc(unc, cls, seg, s, c, mode)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_classbal_matches_reference_formula(self, rng):
        c = 4
        region_class = rng.randint(0, c, 50)
        unc = rng.rand(50)
        got = add_classbal(c, region_class, unc)
        dist = np.bincount(region_class, minlength=c) / 50
        want = unc * np.exp(-dist[region_class])
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_clsbal_counts_history(self, rng):
        c = 3
        region_class = np.array([0, 1, 2, 0])
        unc = np.ones(4)
        hist = [0, 0, 0, 0, 0]  # five past class-0 selections
        got = add_clsbal(c, region_class, unc, hist)
        # class 0 is now much more frequent → lower weight
        assert got[0] < got[1] and got[0] < got[2]


# ----------------------------------------------------------------- oracle ---
def make_cloud_partition(rng, n=200, n_sp=10, c=4):
    seg = rng.randint(0, n_sp, n)
    components = [np.where(seg == i)[0] for i in range(n_sp)]
    gt = rng.randint(0, c, n)
    return components, gt


class TestOracle:
    def test_dominant_budget_conservation(self, rng):
        components, gt = make_cloud_partition(rng)
        pseudo = np.zeros((2, 200), np.float32)
        stats = RoundStats()
        budget = {"click": 4}
        sel = []
        _, used = oracle_labeling(
            list(range(10)), components, gt, pseudo, stats, "dominant",
            None, 0.9, budget, 1, sel,
        )
        assert budget["click"] == 0
        assert len(used) == 4 == stats.sp_num == len(sel)
        # activation monotone + labels constant per region
        for sp in used:
            pids = components[sp]
            assert (pseudo[0][pids] == 1).all()
            assert len(np.unique(pseudo[1][pids])) == 1
            assert pseudo[1][pids][0] == dominant_label(gt[pids])[0]

    def test_min_size_skips_without_spending(self, rng):
        components = [np.array([0]), np.arange(1, 50)]
        gt = np.zeros(50, np.int64)
        pseudo = np.zeros((2, 50), np.float32)
        stats = RoundStats()
        budget = {"click": 5}
        _, used = oracle_labeling(
            [0, 1], components, gt, pseudo, stats, "dominant",
            None, 0.9, budget, 2, [],
        )
        assert used == [1]
        assert budget["click"] == 4

    def test_nail_pure_region_behaves_like_dominant(self, rng):
        components, _ = make_cloud_partition(rng)
        gt = np.zeros(200, np.int64)  # perfectly pure
        pseudo = np.zeros((2, 200), np.float32)
        stats = RoundStats()
        budget = {"click": 3}
        _, used = oracle_labeling(
            list(range(10)), components, gt, pseudo, stats, "NAIL",
            np.zeros(200, np.int64), 0.9, budget, 1, [],
        )
        assert stats.sp_num == 3 and stats.ignore_sp_num == 0
        assert budget["click"] == 0

    def test_nail_without_predictions_raises_clearly(self, rng):
        # NAIL splits rejected superpoints by MODEL predictions; samplers
        # with no inference pass (random/seed) must fail with a clear error
        # instead of the reference's opaque 0-d index crash
        # (sampler2.py:117-122 with prob_class=None)
        components, gt = make_cloud_partition(rng)
        pseudo = np.zeros((2, 200), np.float32)
        with pytest.raises(ValueError, match="dominant"):
            oracle_labeling(
                list(range(10)), components, gt, pseudo, RoundStats(),
                "NAIL", None, 0.9, {"click": 3}, 1, [],
            )

    def test_nail_splits_impure_region(self, rng):
        # one superpoint, half class 0 / half class 1, predictions match gt
        components = [np.arange(100)]
        gt = np.array([0] * 50 + [1] * 50)
        prob_class = gt.copy()
        pseudo = np.zeros((2, 100), np.float32)
        stats = RoundStats()
        budget = {"click": 10}
        _, used = oracle_labeling(
            [0], components, gt, pseudo, stats, "NAIL",
            prob_class, 0.9, budget, 1, [],
        )
        # 1 click for the superpoint + 2 for the confirmed sub-regions
        assert budget["click"] == 10 - 3
        assert stats.split_sp_num == 1 and stats.sub_num == 2
        assert stats.sub_p_num == 100
        assert (pseudo[0] == 1).all()
        np.testing.assert_array_equal(pseudo[1], gt)

    def test_nail_budget_overshoots_inside_split(self, rng):
        """The click budget CAN go negative inside a NAIL sub-region split:
        the budget>0 guard runs per superpoint, and each confirmed sub-region
        decrements unguarded — exactly the reference's semantics
        (sampler2.py:167-180). Pinned so nobody 'fixes' it into divergence."""
        components = [np.arange(90)]
        gt = np.array([0] * 30 + [1] * 30 + [2] * 30)  # dominance 1/3 < 0.9
        prob_class = gt.copy()  # three pure sub-regions
        pseudo = np.zeros((2, 90), np.float32)
        stats = RoundStats()
        budget = {"click": 1}
        oracle_labeling(
            [0], components, gt, pseudo, stats, "NAIL",
            prob_class, 0.9, budget, 1, [],
        )
        # 1 click for the superpoint, then 3 unguarded sub-region clicks
        assert budget["click"] == 1 - 1 - 3 == -3
        assert stats.sub_num == 3 and stats.split_sp_num == 1
        assert (pseudo[0] == 1).all()

    def test_nail_ignores_hopeless_region(self, rng):
        # impure gt AND predictions disagree with gt groups → no pure subregion
        components = [np.arange(60)]
        gt = rng.randint(0, 3, 60)
        prob_class = np.zeros(60, np.int64)  # one big subregion, impure gt
        pseudo = np.zeros((2, 60), np.float32)
        stats = RoundStats()
        budget = {"click": 5}
        oracle_labeling(
            [0], components, gt, pseudo, stats, "NAIL",
            prob_class, 0.99, budget, 1, [],
        )
        assert stats.ignore_sp_num == 1
        assert budget["click"] == 4  # superpoint click still paid
        assert pseudo[0].sum() == 0

    def test_seed_labeling_precise(self, rng):
        components, gt = make_cloud_partition(rng)
        pseudo = np.zeros((2, 200), np.float32)
        stats = RoundStats()
        seed_labeling([0, 3], components, gt, pseudo, stats)
        for sp in (0, 3):
            pids = components[sp]
            np.testing.assert_array_equal(pseudo[1][pids], gt[pids])
            assert (pseudo[0][pids] == 1).all()

    def test_sub_regions(self):
        prob = np.array([0, 0, 1, 1, 2, 0])
        subs = sub_regions_by_predicted_class(prob, np.arange(6))
        assert [list(s) for s in subs] == [[0, 1, 5], [2, 3], [4]]


# ------------------------------------------------ vectorized scoring path ---
class TestVectorizedScoring:
    """The selection hot loop (per-superpoint numpy bincounts,
    sampler2.py:612-631) is replaced by one O(N) vectorized pass; these
    tests pin elementwise equivalence with the per-region formulation."""

    def test_dominant_ids_all_matches_per_region(self, rng):
        from ssdr_al_tpu.active.oracle import (
            dominant_point_ids,
            dominant_point_ids_all,
            gt_dominant_all,
        )

        n, n_sp, c = 700, 25, 6
        seg = rng.randint(0, n_sp, n).astype(np.int32)
        components = [np.where(seg == i)[0] for i in range(n_sp)]
        labels = rng.randint(0, c, n)
        dom = gt_dominant_all(seg, n_sp, labels, c)
        all_ids = dominant_point_ids_all(seg, n_sp, labels, dom)
        assert len(all_ids) == n_sp
        for i, comp in enumerate(components):
            if not len(comp):
                assert len(all_ids[i]) == 0
                continue
            dl, ids = dominant_point_ids(comp, labels[comp])
            assert dl == dom[i]
            np.testing.assert_array_equal(all_ids[i], ids)

    def test_gt_dominant_matches_dominant_label(self, rng):
        from ssdr_al_tpu.active.oracle import gt_dominant_all

        n, n_sp, c = 400, 12, 5
        seg = rng.randint(0, n_sp, n).astype(np.int32)
        labels = rng.randint(0, c, n)
        dom = gt_dominant_all(seg, n_sp, labels, c)
        for i in range(n_sp):
            m = seg == i
            if not m.any():
                continue
            assert dom[i] == dominant_label(labels[m])[0]

    def _make_sampler(self, rng, tmp_path, min_size=3):
        import dataclasses

        from ssdr_al_tpu.active.samplers import TSampler, TSamplerArgs
        from ssdr_al_tpu.config import get_config
        from ssdr_al_tpu.data.cloud import Cloud

        cfg = dataclasses.replace(
            get_config("S3DIS"), num_points=256, num_classes=5
        )
        clouds, total_obj = [], {"unlabeled": {}, "selected_class_list": []}
        state = ALState(str(tmp_path), ["t0", "test"])
        for name, n, n_sp in (("roomA", 900, 30), ("roomB", 700, 22)):
            seg = rng.randint(0, n_sp, n).astype(np.int32)
            comps = [np.where(seg == i)[0] for i in range(n_sp)]
            clouds.append(Cloud(
                name=name,
                xyz=(rng.rand(n, 3) * 8).astype(np.float32),
                colors=rng.rand(n, 3).astype(np.float32),
                labels=rng.randint(0, 5, n).astype(np.int32),
            ))
            state.write_superpoints(name, comps, seg, n)
            total_obj["unlabeled"][name] = list(
                rng.permutation(n_sp)[: n_sp * 2 // 3]
            )
        args = TSamplerArgs(
            point_uncertainty_mode="sb", uncertainty_mode="mean",
            class_balance="", diversity="", min_size=min_size,
        )
        sampler = TSampler(state, clouds, cfg, args, 52, seed=0)
        return sampler, clouds, state, total_obj, cfg

    @staticmethod
    def _stub_eval_step(model_state, batch):
        xyz = jnp.asarray(batch["xyz"])
        w = jnp.asarray(
            [[1.0, 0, 0], [0, 1, 0], [0, 0, 1], [0.5, 0.5, 0], [0, 0.3, 0.7]]
        )
        probs = jnp.exp(xyz @ w.T)
        probs = probs / probs.sum(-1, keepdims=True)
        feats = jnp.tile(xyz, (1, 1, 11))[..., :32]
        return probs, feats

    def test_prediction_matches_per_region_loop(self, rng, tmp_path):
        """New vectorized prediction == the literal per-superpoint loop
        (old implementation / reference structure) on refs, dominant ids,
        labeled registry and score ordering."""
        sampler, clouds, state, total_obj, cfg = self._make_sampler(
            rng, tmp_path
        )
        a = sampler.args
        refs, sorted_inds, inference, labeled = sampler.prediction(
            self._stub_eval_step, None, total_obj, 2, RoundStats()
        )

        # ---- expected: the per-region loop over the SAME inference outputs
        from ssdr_al_tpu.active.oracle import dominant_point_ids

        exp_unc, exp_refs, exp_labeled = [], [], {}
        for cloud in clouds:
            name = cloud.name
            inf = inference[name]
            sp = state.load_superpoints(name)
            s = sp.num_superpoints
            runc = np.asarray(region_uncertainty(
                jnp.asarray(inf.uncertainty), jnp.asarray(inf.prob_class),
                jnp.asarray(sp.in_component), s, cfg.num_classes,
                a.uncertainty_mode,
            ))
            unl_set = set(total_obj["unlabeled"][name])
            for sp_idx in range(s):
                pids = sp.components[sp_idx]
                if len(pids) < a.min_size:
                    continue
                if sp_idx in unl_set:
                    _, dom_ids = dominant_point_ids(
                        pids, inf.prob_class[pids]
                    )
                    exp_unc.append(float(runc[sp_idx]))
                    exp_refs.append((name, sp_idx, dom_ids))
                else:
                    exp_labeled.setdefault(name, []).append(sp_idx)

        assert len(refs) == len(exp_refs)
        for r, (name, sp_idx, dom_ids) in zip(refs, exp_refs):
            assert (r.cloud_name, r.sp_idx) == (name, sp_idx)
            np.testing.assert_array_equal(r.dominant_point_ids, dom_ids)
        assert set(labeled) == set(exp_labeled)
        for name in labeled:  # values are flat arrays now (RegionTable era)
            np.testing.assert_array_equal(labeled[name], exp_labeled[name])
        np.testing.assert_array_equal(
            sorted_inds, np.argsort(-np.asarray(exp_unc))
        )

    def test_run_many_matches_per_cloud_run(self, rng, tmp_path):
        """Cross-cloud chunk grouping (run_many) must reproduce the
        per-cloud runner exactly: eval is per-sample independent, so only
        the dispatch grouping differs."""
        import dataclasses

        from ssdr_al_tpu.active.samplers import InferenceRunner
        from ssdr_al_tpu.config import get_config
        from ssdr_al_tpu.data.cloud import Cloud

        cfg = dataclasses.replace(
            get_config("S3DIS"), num_points=256, num_classes=5
        )
        clouds = [
            Cloud(name=f"c{i}",
                  xyz=(rng.rand(500 + 70 * i, 3) * 8).astype(np.float32),
                  colors=rng.rand(500 + 70 * i, 3).astype(np.float32),
                  labels=rng.randint(0, 5, 500 + 70 * i).astype(np.int32))
            for i in range(3)
        ]
        mk = lambda: InferenceRunner(  # noqa: E731
            cfg, clouds, TestVectorizedScoring._stub_eval_step, None,
            "sb", seed=3, chunk_batch=4,
        )
        many = mk().run_many(clouds)
        r2 = mk()   # one runner, clouds in order → same pipeline RNG stream
        single = {c.name: r2.run(c) for c in clouds}
        for c in clouds:
            np.testing.assert_array_equal(
                many[c.name].prob_class, single[c.name].prob_class)
            np.testing.assert_allclose(
                many[c.name].uncertainty, single[c.name].uncertainty,
                rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(
                np.asarray(many[c.name].penult, np.float32),
                np.asarray(single[c.name].penult, np.float32),
                rtol=1e-2, atol=1e-3)

    def test_anchors_match_per_region_loop(self, rng, tmp_path):
        sampler, clouds, state, total_obj, cfg = self._make_sampler(
            rng, tmp_path
        )
        refs, _, _, labeled = sampler.prediction(
            self._stub_eval_step, None, total_obj, 2, RoundStats()
        )
        sampler.rng = np.random.RandomState(7)
        got = sampler.select_labeled_anchors(labeled, round_num=3)

        # expected: per-region loop (old implementation)
        from ssdr_al_tpu.active.oracle import dominant_point_ids
        from ssdr_al_tpu.active.uncertainty import _class_frequency_weights

        dominant_labels, exp = [], []
        for name, sp_list in labeled.items():
            sp = state.load_superpoints(name)
            labels = next(c for c in clouds if c.name == name).labels
            for sp_idx in sp_list:
                pids = sp.components[sp_idx]
                dl, dom_ids = dominant_point_ids(pids, labels[pids])
                dominant_labels.append(dl)
                exp.append((name, sp_idx, dom_ids))
        w = _class_frequency_weights(dominant_labels, cfg.num_classes)
        p = w / w.sum()
        rng2 = np.random.RandomState(7)
        sel = rng2.choice(len(exp), min(2000, len(exp)), replace=False, p=p)
        assert len(got) == len(sel)
        for r, i in zip(got, sel):
            name, sp_idx, dom_ids = exp[i]
            assert (r.cloud_name, r.sp_idx, r.is_labeled) == (name, sp_idx, True)
            np.testing.assert_array_equal(r.dominant_point_ids, dom_ids)


# ------------------------------------------------------------------ state ---
class TestState:
    def test_round_trip_and_round_copy(self, rng, tmp_path):
        state = ALState(str(tmp_path), sampler_args=["t0", "sb", "NAIL"])
        comps = [np.array([0, 1, 2]), np.array([3, 4])]
        in_comp = np.array([0, 0, 0, 1, 1], np.int32)
        state.write_superpoints("cloudA", comps, in_comp, 5)
        sp = state.load_superpoints("cloudA")
        assert sp.num_superpoints == 2
        np.testing.assert_array_equal(sp.in_component, in_comp)

        total = {"unlabeled": {"cloudA": [0, 1]}, "sp_num": 2,
                 "file_num": 1, "point_num": 5}
        state.write_registry(total)

        rd = state.begin_round(0)
        assert os.path.basename(rd) == "round_1"
        gt = state.load_pseudo_gt(rd, "cloudA")
        assert gt.shape == (2, 5) and (gt == 0).all()

        gt[0, :3] = 1
        gt[1, :3] = 2
        state.write_pseudo_gt(rd, "cloudA", gt)
        t = state.load_registry(rd)
        state.mark_labeled(t, "cloudA", [0])
        assert t["unlabeled"]["cloudA"] == [1]
        state.write_registry(t, rd)

        rd2 = state.begin_round(1)
        gt2 = state.load_pseudo_gt(rd2, "cloudA")
        np.testing.assert_array_equal(gt, gt2)
        t2 = state.load_registry(rd2)
        assert t2["unlabeled"]["cloudA"] == [1]

    def test_sampler_args_str(self):
        assert sampler_args_str(["t0", "sb", "clsbal"]) == "t0-sb-clsbal"
        assert sampler_args_str([]) == ""


# --------------------------------------------------------------- fps_gcn ---
class TestFpsGcn:
    def test_block_adjacency_matches_reference_normalization(self, rng):
        from ssdr_al_tpu.active.fps_gcn import _normalize_adjacency

        s = 6
        ed_cd = np.abs(rng.randn(1, s, s)).astype(np.float32)
        ed_cd = (ed_cd + ed_cd.transpose(0, 2, 1)) / 2
        np.fill_diagonal(ed_cd[0], 0.0)
        mask = np.ones((1, s), bool)
        got = np.asarray(_normalize_adjacency(
            jnp.asarray(ed_cd), jnp.asarray(mask), 0
        ))[0]
        # numpy oracle: fps_gcn_cpu.py:102-116
        adj = np.exp(-ed_cd[0])
        adj += -np.eye(s)
        d_inv = 1.0 / adj.sum(1)
        want = adj @ np.diag(d_inv) + np.eye(s)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_gcn_fps_selects_requested_count(self, rng):
        from ssdr_al_tpu.active.region_graph import build_region_graph
        from ssdr_al_tpu.active.fps_gcn import gcn_fps_sampling

        xyz = rng.randn(300, 3).astype(np.float32)
        comps = [np.arange(i * 30, (i + 1) * 30) for i in range(10)]
        regions = {"c0": [(i, i >= 8, comps[i][:5]) for i in range(10)]}
        graph = build_region_graph(
            regions, {"c0": xyz}, {"c0": comps}
        )
        feats = rng.randn(10, 8).astype(np.float32)
        unl = np.array([True] * 8 + [False] * 2)
        out = gcn_fps_sampling(graph, feats, unl, 4,
                               gcn_number=2, gcn_top=3,
                               rng=np.random.RandomState(0))
        sel = [s for v in out.values() for s in v]
        assert len(sel) == 4 and len(set(sel)) == 4
        assert all(s < 8 for s in sel)  # only unlabeled


class TestPadRegionsVectorized:
    """pad_regions_vectorized == the literal per-region loop
    (bbox_center + ops.chamfer.pad_superpoints), bit-exact — including the
    linspace endpoint pinning for regions larger than the cap."""

    @pytest.fixture
    def rng(self):
        return np.random.RandomState(7)

    def _loop_form(self, xyz, ids_list, cap):
        from ssdr_al_tpu.active.region_graph import bbox_center
        from ssdr_al_tpu.ops.chamfer import pad_superpoints

        sp_points = [xyz[ids] for ids in ids_list]
        cents = np.stack([bbox_center(p) for p in sp_points])
        pts, msk = pad_superpoints(sp_points, max_points=cap)
        return cents, pts, msk

    @pytest.mark.parametrize("cap", [None, 16, 64])
    def test_matches_loop(self, rng, cap):
        from ssdr_al_tpu.active.region_graph import pad_regions_vectorized

        xyz = rng.randn(4000, 3).astype(np.float32) * 5
        # ragged sizes straddling the cap, incl. size-1 and size==cap
        sizes = [1, 3, 16, 17, 63, 64, 65, 200, 999]
        ids_list, at = [], 0
        for s in sizes:
            ids_list.append(np.arange(at, at + s, dtype=np.int64))
            at += s
        cents, pts, msk = pad_regions_vectorized(xyz, ids_list, cap)
        want_c, want_p, want_m = self._loop_form(xyz, ids_list, cap)
        np.testing.assert_array_equal(cents, want_c)
        np.testing.assert_array_equal(msk, want_m)
        np.testing.assert_array_equal(pts, want_p)

    def test_linspace_endpoint_pinned(self, rng):
        """Regression: arange·step truncation can land one index short of
        L-1; linspace pins it. A size where (p-1)*step rounds down exposes
        the difference through the last subsampled point."""
        from ssdr_al_tpu.active.region_graph import pad_regions_vectorized

        xyz = rng.randn(2000, 3).astype(np.float32)
        for size in [103, 257, 511, 1023, 1999]:
            ids = [np.arange(size, dtype=np.int64)]
            cents, pts, msk = pad_regions_vectorized(xyz, ids, 32)
            want_c, want_p, want_m = self._loop_form(xyz, ids, 32)
            np.testing.assert_array_equal(pts, want_p)


class TestSortedEvalConsumers:
    """Consumers of make_eval_step(sorted_outputs=True) must reproduce the
    original-order results exactly: output row r is input row order[r] and
    the consumer permutes its host index maps (samplers._scatter_map,
    Evaluator fold, simple_evaluate label permute)."""

    @staticmethod
    def _perm_wrap(stub):
        """Wrap a (probs, feats) stub into a sorted-outputs (3-tuple) stub
        with a nontrivial per-row permutation (row reversal)."""
        def eval_step(model_state, batch):
            probs, feats = stub(model_state, batch)
            b, n = probs.shape[:2]
            order = jnp.broadcast_to(
                jnp.arange(n - 1, -1, -1, dtype=jnp.int32)[None], (b, n))
            probs = jnp.take_along_axis(probs, order[..., None], axis=1)
            feats = jnp.take_along_axis(feats, order[..., None], axis=1)
            return probs, feats, order
        return eval_step

    def _clouds(self, rng, n_clouds=3, base=500):
        from ssdr_al_tpu.data.cloud import Cloud

        return [
            Cloud(name=f"c{i}",
                  xyz=(rng.rand(base + 70 * i, 3) * 8).astype(np.float32),
                  colors=rng.rand(base + 70 * i, 3).astype(np.float32),
                  labels=rng.randint(0, 5, base + 70 * i).astype(np.int32))
            for i in range(n_clouds)
        ]

    def test_inference_runner_matches_unsorted(self, rng):
        import dataclasses

        from ssdr_al_tpu.active.samplers import InferenceRunner
        from ssdr_al_tpu.config import get_config

        cfg = dataclasses.replace(
            get_config("S3DIS"), num_points=256, num_classes=5)
        clouds = self._clouds(rng)
        stub = TestVectorizedScoring._stub_eval_step
        plain = InferenceRunner(cfg, clouds, stub, None, "sb",
                                seed=3, chunk_batch=4).run_many(clouds)
        wrapped = InferenceRunner(cfg, clouds, self._perm_wrap(stub), None,
                                  "sb", seed=3, chunk_batch=4).run_many(clouds)
        for c in clouds:
            np.testing.assert_array_equal(
                plain[c.name].prob_class, wrapped[c.name].prob_class)
            np.testing.assert_array_equal(
                plain[c.name].uncertainty, wrapped[c.name].uncertainty)
            np.testing.assert_array_equal(
                plain[c.name].penult, wrapped[c.name].penult)

    def test_simple_evaluate_matches_unsorted(self, rng):
        from ssdr_al_tpu.train.evaluator import simple_evaluate

        stub = TestVectorizedScoring._stub_eval_step
        batches = [
            {"xyz": (rng.rand(2, 128, 3) * 8).astype(np.float32),
             "labels": rng.randint(0, 5, (2, 128)).astype(np.int32)}
            for _ in range(3)
        ]
        a = simple_evaluate(stub, None, batches, 5)
        b = simple_evaluate(self._perm_wrap(stub), None, batches, 5)
        assert a == b

    def test_evaluator_matches_unsorted(self, rng):
        import dataclasses

        from ssdr_al_tpu.config import get_config
        from ssdr_al_tpu.train.evaluator import Evaluator

        cfg = dataclasses.replace(
            get_config("S3DIS"), num_points=256, num_classes=5,
            val_batch_size=4, val_steps=6)
        clouds = self._clouds(rng)
        stub = TestVectorizedScoring._stub_eval_step
        ev = Evaluator(cfg, clouds, seed=11, max_epochs=3)
        a = ev(stub, None)
        ev2 = Evaluator(cfg, clouds, seed=11, max_epochs=3)
        b = ev2(self._perm_wrap(stub), None)
        assert a == b


class TestRegionGraphBuckets:
    def test_grouped_buckets_match_exact_chamfer(self, rng):
        """(S,P)-bucketed grouped chamfer blocks in build_region_graph ==
        per-cloud exact (unpadded-count) chamfer + centroid ED, across
        clouds heterogeneous enough to land in different buckets."""
        from ssdr_al_tpu.active.region_graph import (
            bbox_center,
            build_region_graph,
        )
        from ssdr_al_tpu.ops.chamfer import chamfer_pairwise, pad_superpoints

        regions, cloud_xyz, components = {}, {}, {}
        # cloud sizes chosen to force distinct (S bucket, P bucket) groups:
        # (num regions, max region size)
        for ci, (n_reg, max_sz) in enumerate([(3, 10), (20, 10), (3, 300)]):
            name = f"c{ci}"
            comps, at, pts = [], 0, []
            for r in range(n_reg):
                sz = int(rng.randint(2, max_sz + 1)) if r else max_sz
                comps.append(np.arange(at, at + sz, dtype=np.int64))
                at += sz
            cloud_xyz[name] = (rng.rand(at, 3) * 6).astype(np.float32)
            components[name] = comps
            regions[name] = [(r, False, comps[r][:2]) for r in range(n_reg)]
        graph = build_region_graph(
            regions, cloud_xyz, components, max_points_per_sp=64)

        for ci, name in enumerate(graph.cloud_names):
            comps = components[name]
            xyz = cloud_xyz[name]
            sp_points = [xyz[c] for c in comps]
            cents = np.stack([bbox_center(p) for p in sp_points])
            diff = cents[:, None] - cents[None, :]
            ed = np.sqrt((diff * diff).sum(-1))
            pts, msk = pad_superpoints(sp_points, max_points=64)
            cd = np.asarray(chamfer_pairwise(
                jnp.asarray(pts), jnp.asarray(msk)))
            s = len(comps)
            np.testing.assert_allclose(
                graph.ed_cd[ci, :s, :s], ed + cd, rtol=1e-4, atol=1e-4)


    @staticmethod
    def _make_workload(rng, specs):
        """specs: [(n_reg, max_sz)] per cloud; region list selects a
        SUBSET of superpoints (every other one) like a real round."""
        regions, cloud_xyz, components = {}, {}, {}
        for ci, (n_reg, max_sz) in enumerate(specs):
            name = f"c{ci}"
            comps, at = [], 0
            for r in range(n_reg):
                sz = int(rng.randint(2, max_sz + 1)) if r else max_sz
                comps.append(np.arange(at, at + sz, dtype=np.int64))
                at += sz
            cloud_xyz[name] = (rng.rand(at, 3) * 6).astype(np.float32)
            components[name] = comps
            regions[name] = [(r, False, comps[r][:2])
                             for r in range(0, n_reg, 2)]
        return regions, cloud_xyz, components

    def test_block_cache_matches_streaming(self, rng):
        """Device-resident SuperpointBlockCache chamfer == streaming path,
        exactly — including clouds where the subsample cap binds and clouds
        whose largest superpoint exceeds the round's largest SELECTED one
        (the padded width is masked, so cd is unchanged)."""
        from ssdr_al_tpu.active.region_graph import (
            SuperpointBlockCache,
            build_region_graph,
        )

        specs = [(5, 10), (21, 10), (4, 300), (9, 40)]
        regions, cloud_xyz, components = self._make_workload(rng, specs)
        base = build_region_graph(
            regions, cloud_xyz, components, max_points_per_sp=64)

        cache = SuperpointBlockCache(max_points_per_sp=64)
        for n in regions:
            assert cache.ensure(n, cloud_xyz[n], components[n])
        cache.finalize()
        got = build_region_graph(
            regions, cloud_xyz, components, max_points_per_sp=64,
            cache=cache)

        assert got.cloud_names == base.cloud_names
        assert [r.sp_idx for r in got.refs] == [r.sp_idx for r in base.refs]
        np.testing.assert_array_equal(got.mask, base.mask)
        np.testing.assert_allclose(got.ed_cd, base.ed_cd, rtol=1e-6,
                                   atol=1e-6)

    def test_block_cache_late_stage_and_idempotent_finalize(self, rng):
        """finalize() without new stages never re-uploads; staging another
        cloud later re-concatenates from retained HOST parts (no device
        readback) and the grown slab still matches a fresh cache built with
        both clouds at once."""
        from ssdr_al_tpu.active.region_graph import SuperpointBlockCache

        regions, cloud_xyz, components = self._make_workload(
            rng, [(5, 10), (4, 30)])
        names = sorted(regions)

        cache = SuperpointBlockCache(max_points_per_sp=64)
        assert cache.ensure(names[0], cloud_xyz[names[0]],
                            components[names[0]])
        cache.finalize()
        p0 = cache.p_rung(names[0])
        slab0 = cache._device[p0][0]
        cache.finalize()
        assert cache._device[p0][0] is slab0  # idempotent: no re-upload

        assert cache.ensure(names[1], cloud_xyz[names[1]],
                            components[names[1]])
        cache.finalize()

        fresh = SuperpointBlockCache(max_points_per_sp=64)
        for n in names:
            fresh.ensure(n, cloud_xyz[n], components[n])
        fresh.finalize()
        for n in names:
            p = cache.p_rung(n)
            ids = np.arange(len(components[n]))
            np.testing.assert_array_equal(
                np.asarray(cache._device[p][0])[cache.rows(n, ids)],
                np.asarray(fresh._device[p][0])[fresh.rows(n, ids)])

    def test_block_cache_budget_rejects_and_streams(self, rng, monkeypatch):
        """A cache with a ~zero budget rejects every cloud; the graph build
        falls back to streaming and still produces identical results."""
        monkeypatch.setenv("SSDR_CHAMFER_CACHE_MB", "0.0001")
        from ssdr_al_tpu.active.region_graph import (
            SuperpointBlockCache,
            build_region_graph,
        )

        regions, cloud_xyz, components = self._make_workload(
            rng, [(5, 10), (4, 30)])
        cache = SuperpointBlockCache(max_points_per_sp=64)
        for n in regions:
            assert not cache.ensure(n, cloud_xyz[n], components[n])
        cache.finalize()
        base = build_region_graph(
            regions, cloud_xyz, components, max_points_per_sp=64)
        got = build_region_graph(
            regions, cloud_xyz, components, max_points_per_sp=64,
            cache=cache)
        np.testing.assert_allclose(got.ed_cd, base.ed_cd, rtol=1e-6,
                                   atol=1e-6)

    def test_block_cache_handles_empty_components(self, rng):
        """Empty superpoints (size-0 components) get an all-False mask row:
        chamfer treats them as empty regions (cd row 0), no crash."""
        from ssdr_al_tpu.active.region_graph import SuperpointBlockCache

        comps = [np.arange(0, 5, dtype=np.int64), np.zeros(0, np.int64),
                 np.arange(5, 12, dtype=np.int64)]
        cache = SuperpointBlockCache(max_points_per_sp=8)
        assert cache.ensure("c0", rng.rand(12, 3).astype(np.float32), comps)
        cache.finalize()
        pts, msk = cache._device[cache.p_rung("c0")]
        assert not bool(np.asarray(msk)[1].any())

    def test_gcn_fps_exhausted_pool_returns_empty(self, rng):
        """When every superpoint is labeled (late AL rounds drain the pool),
        gcn_fps_sampling returns {} instead of crashing on randint(0, 0)
        (the reference's behavior at fps_gcn_cpu.py:155)."""
        from ssdr_al_tpu.active.fps_gcn import gcn_fps_sampling
        from ssdr_al_tpu.active.region_graph import build_region_graph

        comps = [np.arange(i * 4, (i + 1) * 4, dtype=np.int64)
                 for i in range(4)]
        regions = {"c0": [(r, True, comps[r][:1]) for r in range(4)]}
        graph = build_region_graph(
            regions, {"c0": rng.rand(16, 3).astype(np.float32)},
            {"c0": comps}, max_points_per_sp=8)
        out = gcn_fps_sampling(
            graph, rng.rand(4, 8).astype(np.float32),
            np.zeros(4, bool), 10, rng=np.random.RandomState(0))
        assert out == {}

    def test_chamfer_dispatch_shapes_are_closed(self, rng, monkeypatch):
        """Every chamfer dispatch in build_region_graph has the FIXED block
        count _G_CHUNK and ladder-rung (S, P) dims — the compiled-shape set
        is closed, so AL rounds with drifting per-cloud region counts never
        trigger fresh XLA compiles (a drifting group-count dim cost 14-21 s
        of recompiles per 200-cloud round; see build_region_graph)."""
        from ssdr_al_tpu.active import region_graph as rg

        seen = []
        real = rg.chamfer_pairwise_blocks

        def spy(points, mask, row_chunk=8):
            seen.append(tuple(points.shape))
            return real(points, mask, row_chunk)

        monkeypatch.setattr(rg, "chamfer_pairwise_blocks", spy)

        # two builds with different cloud counts / drifted region counts —
        # the kind of shape drift an AL round produces
        for n_clouds, base in [(5, 3), (11, 7)]:
            regions, cloud_xyz, components = {}, {}, {}
            for ci in range(n_clouds):
                name = f"c{ci}"
                n_reg = base + ci
                comps, at = [], 0
                for r in range(n_reg):
                    sz = int(rng.randint(2, 40))
                    comps.append(np.arange(at, at + sz, dtype=np.int64))
                    at += sz
                cloud_xyz[name] = rng.rand(at, 3).astype(np.float32)
                components[name] = comps
                regions[name] = [(r, False, comps[r][:1])
                                 for r in range(n_reg)]
            rg.build_region_graph(regions, cloud_xyz, components,
                                  max_points_per_sp=64)

        assert seen, "no chamfer dispatches recorded"
        for g, sb, p, _ in seen:
            assert g == rg._G_CHUNK
            assert sb in rg._S_LADDER
            assert p in rg._P_LADDER


class TestDeviceRegionFeatures:
    """region_feature_means (penult kept on device, one segment-mean with a
    point→slot map) == the host reduceat path over the transferred f16
    penult — for original-order AND sorted eval outputs."""

    @pytest.mark.parametrize("sorted_stub", [False, True])
    def test_matches_host_reduceat(self, rng, sorted_stub):
        import dataclasses

        from ssdr_al_tpu.active.samplers import InferenceRunner
        from ssdr_al_tpu.config import get_config

        cfg = dataclasses.replace(
            get_config("S3DIS"), num_points=256, num_classes=5)
        clouds = TestSortedEvalConsumers()._clouds(rng)
        stub = TestVectorizedScoring._stub_eval_step
        if sorted_stub:
            stub = TestSortedEvalConsumers._perm_wrap(stub)

        host = InferenceRunner(cfg, clouds, stub, None, "sb",
                               seed=3, chunk_batch=4)
        host_inf = host.run_many(clouds)
        dev = InferenceRunner(cfg, clouds, stub, None, "sb",
                              seed=3, chunk_batch=4,
                              keep_penult_on_device=True)
        dev_inf = dev.run_many(clouds)
        assert all(v.penult is None for v in dev_inf.values())

        # random disjoint "regions" per cloud
        slot_maps, want, slot = {}, [], 0
        for c in clouds:
            sm = np.full(c.num_points, -1, np.int64)
            perm = rng.permutation(c.num_points)
            at = 0
            for _ in range(4):
                size = int(rng.randint(3, 40))
                ids = np.sort(perm[at: at + size]); at += size
                sm[ids] = slot
                want.append(
                    host_inf[c.name].penult[ids].astype(np.float32).mean(0))
                slot += 1
            slot_maps[c.name] = sm
        got = dev.region_feature_means(slot_maps, slot)
        np.testing.assert_allclose(got, np.stack(want), rtol=1e-5, atol=1e-6)
