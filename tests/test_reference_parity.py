"""Golden-parity tests: run the REFERENCE'S OWN numpy code (AST-extracted from
/root/reference, no torch/TF imports needed) against this framework's
implementations on randomized inputs.

Unlike the oracle tests elsewhere (which compare against re-implementations),
these execute the literal reference source — sampler2.py scoring/oracle,
fps_gcn_cpu.py adjacency/FPS, kcenterGreedy.py — and assert elementwise
agreement, proving the ports match the actual reference behavior.
"""

import ast
import os
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/SSDR_AL_s3dis")

pytestmark = pytest.mark.skipif(
    not REF.is_dir(), reason="reference checkout not mounted"
)


class _NumpyCompat:
    """numpy shim for legacy reference code: np.float/np.int removed in
    numpy>=1.24; optionally pins np.random.randint for deterministic FPS."""

    def __init__(self, randint=None):
        self.float = float
        self.int = int
        self.bool = bool
        if randint is not None:
            real = np.random
            self.random = types.SimpleNamespace(
                randint=lambda *a, **k: randint,
                choice=real.choice,
            )

    def __getattr__(self, name):
        return getattr(np, name)


def load_ref(filename, names, *, ns=None, randint=None):
    """Extract the named top-level functions/classes from a reference file and
    exec them with a numpy-compat namespace. Returns the namespace dict."""
    src = (REF / filename).read_text()
    tree = ast.parse(src)
    wanted = [
        node for node in tree.body
        if isinstance(node, (ast.FunctionDef, ast.ClassDef))
        and node.name in names
    ]
    missing = set(names) - {w.name for w in wanted}
    assert not missing, f"functions not found in {filename}: {missing}"
    mod = ast.Module(body=wanted, type_ignores=[])
    ast.fix_missing_locations(mod)
    space = {"np": _NumpyCompat(randint=randint), "os": os}
    if ns:
        space.update(ns)
    exec(compile(mod, str(REF / filename), "exec"), space)
    return space


# --------------------------------------------------------------------------
# sampler2.py — point/region uncertainty + class balance
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sampler2():
    return load_ref("sampler2.py", [
        "compute_point_uncertainty", "compute_entropy",
        "compute_region_uncertainty", "weights_percentage",
        "_dominant_label", "_get_sub_region_from_superpoint",
        "oracle_labeling", "add_classbal", "add_clsbal",
        "farthest_superpoint_sample",
    ], ns={"get_sampler_args_str": lambda a: str(a)})


def _probs(rng, n, c):
    p = rng.rand(n, c).astype(np.float32)
    return p / p.sum(axis=1, keepdims=True)


class TestPointUncertaintyParity:
    @pytest.mark.parametrize("mode", ["lc", "entropy", "sb"])
    def test_matches_reference(self, sampler2, rng, mode):
        from ssdr_al_tpu.active.uncertainty import point_uncertainty

        p = _probs(rng, 300, 13)
        ref = sampler2["compute_point_uncertainty"](p.copy(), [mode])
        ours = np.asarray(point_uncertainty(p, mode))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_entropy_zero_prob(self, sampler2):
        """0·log2(0) := 0 exactly as the reference's inf→0 patch."""
        from ssdr_al_tpu.active.uncertainty import point_uncertainty

        p = np.array([[0.0, 0.5, 0.5], [1.0, 0.0, 0.0]], np.float32)
        ref = sampler2["compute_point_uncertainty"](p.copy(), ["entropy"])
        ours = np.asarray(point_uncertainty(p, "entropy"))
        np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestRegionUncertaintyParity:
    @pytest.mark.parametrize("mode", ["mean", "sum_weight", "WetSU"])
    def test_matches_reference_per_region(self, sampler2, rng, mode):
        import jax.numpy as jnp

        from ssdr_al_tpu.active.uncertainty import region_uncertainty

        n, s, c = 400, 12, 6
        unc = rng.rand(n).astype(np.float32)
        cls = rng.randint(0, c, n).astype(np.int32)
        seg = rng.randint(0, s, n).astype(np.int32)

        ours = np.asarray(region_uncertainty(
            jnp.asarray(unc), jnp.asarray(cls), jnp.asarray(seg), s, c, mode
        ))
        for r in range(s):
            ids = np.where(seg == r)[0]
            if not len(ids):
                continue
            ref = sampler2["compute_region_uncertainty"](
                unc[ids], cls[ids], c, [mode]
            )
            np.testing.assert_allclose(ours[r], ref, rtol=1e-4, atol=1e-5,
                                       err_msg=f"region {r} mode {mode}")


class TestClassBalanceParity:
    def test_weights_percentage(self, sampler2, rng):
        from ssdr_al_tpu.active.uncertainty import _class_frequency_weights

        cls = rng.randint(0, 9, 200)
        np.testing.assert_allclose(
            _class_frequency_weights(cls, 9),
            sampler2["weights_percentage"](list(cls), 9),
        )

    def test_add_classbal(self, sampler2, rng):
        from ssdr_al_tpu.active.uncertainty import add_classbal

        cls = list(rng.randint(0, 5, 60))
        unc = rng.rand(60)
        np.testing.assert_allclose(
            add_classbal(5, cls, unc.copy()),
            sampler2["add_classbal"](5, cls, unc.copy()),
            rtol=1e-6,
        )

    def test_add_clsbal(self, sampler2, rng):
        from ssdr_al_tpu.active.uncertainty import add_clsbal

        cls = list(rng.randint(0, 5, 60))
        unc = rng.rand(60)
        selected = list(rng.randint(0, 5, 30))
        np.testing.assert_allclose(
            add_clsbal(5, cls, unc.copy(), selected),
            sampler2["add_clsbal"](5, cls, unc.copy(),
                                   {"selected_class_list": list(selected)}),
            rtol=1e-6,
        )


# --------------------------------------------------------------------------
# sampler2.py — oracle labeling (dominant + NAIL)
# --------------------------------------------------------------------------


def _random_partition(rng, n, n_sp):
    perm = rng.permutation(n)
    cuts = np.sort(rng.choice(np.arange(1, n), n_sp - 1, replace=False))
    return [np.sort(c) for c in np.split(perm, cuts)]


class TestOracleParity:
    @pytest.mark.parametrize("mode", ["dominant", "NAIL"])
    def test_oracle_labeling(self, sampler2, rng, mode):
        from ssdr_al_tpu.active.oracle import oracle_labeling
        from ssdr_al_tpu.active.state import RoundStats

        n, n_sp, c = 500, 20, 5
        components = _random_partition(rng, n, n_sp)
        input_gt = rng.randint(0, c, n).astype(np.int32)
        prob_class = rng.randint(0, c, n).astype(np.int32)
        sp_inds = list(rng.permutation(n_sp)[:14])

        ref_pg = np.zeros((2, n), np.float32)
        ref_budget = {"click": 10}
        ref_w = {k: 0 for k in ("sp_num", "p_num", "sub_num", "sub_p_num",
                                "ignore_sp_num", "split_sp_num")}
        ref_total = {"selected_class_list": []}
        ref_pg, ref_used = sampler2["oracle_labeling"](
            list(sp_inds), components, input_gt, ref_pg, "cloud", ref_w,
            [mode], prob_class, 0.7, ref_budget, 2, ref_total,
        )

        pg = np.zeros((2, n), np.float32)
        budget = {"click": 10}
        stats = RoundStats()
        selected = []
        pg, used = oracle_labeling(
            list(sp_inds), components, input_gt, pg, stats, mode,
            prob_class, 0.7, budget, 2, selected,
        )

        np.testing.assert_array_equal(pg, ref_pg)
        assert list(used) == [int(u) for u in ref_used]
        assert budget["click"] == ref_budget["click"]
        assert selected == ref_total["selected_class_list"]
        assert stats.sp_num == ref_w["sp_num"]
        assert stats.p_num == ref_w["p_num"]
        assert stats.sub_num == ref_w["sub_num"]
        assert stats.sub_p_num == ref_w["sub_p_num"]
        assert stats.ignore_sp_num == ref_w["ignore_sp_num"]
        assert stats.split_sp_num == ref_w["split_sp_num"]


    def test_nail_budget_overshoot_matches_reference(self, sampler2):
        """Deterministic overshoot case: budget=1, one impure superpoint whose
        NAIL split confirms 3 pure sub-regions. The reference decrements the
        budget past zero (sampler2.py:167-180); ours must land on the SAME
        negative value."""
        from ssdr_al_tpu.active.oracle import oracle_labeling
        from ssdr_al_tpu.active.state import RoundStats

        n = 90
        components = [np.arange(n)]
        input_gt = np.array([0] * 30 + [1] * 30 + [2] * 30)
        prob_class = input_gt.copy()

        ref_pg = np.zeros((2, n), np.float32)
        ref_budget = {"click": 1}
        ref_w = {k: 0 for k in ("sp_num", "p_num", "sub_num", "sub_p_num",
                                "ignore_sp_num", "split_sp_num")}
        ref_total = {"selected_class_list": []}
        ref_pg, _ = sampler2["oracle_labeling"](
            [0], components, input_gt, ref_pg, "cloud", ref_w,
            ["NAIL"], prob_class, 0.9, ref_budget, 1, ref_total,
        )

        pg = np.zeros((2, n), np.float32)
        budget = {"click": 1}
        stats = RoundStats()
        pg, _ = oracle_labeling(
            [0], components, input_gt, pg, stats, "NAIL",
            prob_class, 0.9, budget, 1, [],
        )
        assert ref_budget["click"] == -3  # the reference DOES overshoot
        assert budget["click"] == ref_budget["click"]
        assert stats.sub_num == ref_w["sub_num"] == 3
        np.testing.assert_array_equal(pg, ref_pg)


# --------------------------------------------------------------------------
# sampler2.py — edcd FPS over superpoints (ED² + chamfer)
# --------------------------------------------------------------------------


class TestFpsSuperpointParity:
    def test_selection_sequence(self, sampler2, rng):
        import jax.numpy as jnp
        from sklearn.neighbors import KDTree

        from ssdr_al_tpu.active.region_graph import bbox_center
        from ssdr_al_tpu.ops.chamfer import chamfer_pairwise, pad_superpoints
        from ssdr_al_tpu.ops.fps import farthest_superpoint_sample

        fps_gcn = load_ref("fps_gcn_cpu.py", ["chamfer_distance"])
        sp_list = [
            (rng.rand(rng.randint(20, 60), 3) * 3
             + rng.rand(3) * 8).astype(np.float32)
            for _ in range(12)
        ]
        cents = np.stack([bbox_center(p) for p in sp_list])

        ref_ns = dict(sampler2)
        ref_ns["KDTree"] = KDTree
        ref_ns["chamfer_distance"] = fps_gcn["chamfer_distance"]
        # re-exec farthest_superpoint_sample with KDTree+chamfer in scope
        fss_src = load_ref("sampler2.py", ["farthest_superpoint_sample"],
                           ns={"KDTree": KDTree,
                               "chamfer_distance": fps_gcn["chamfer_distance"]})
        ref_sel = fss_src["farthest_superpoint_sample"](
            [p.copy() for p in sp_list], cents.copy(), 6, 3
        )

        pts, msk = pad_superpoints(sp_list, max_points=None)
        cd = chamfer_pairwise(jnp.asarray(pts), jnp.asarray(msk))
        ours = np.asarray(
            farthest_superpoint_sample(jnp.asarray(cents), cd, 3, 6)
        )
        np.testing.assert_array_equal(ours, ref_sel)


# --------------------------------------------------------------------------
# fps_gcn_cpu.py — adjacency + GCN propagation + feature FPS (end-to-end)
# --------------------------------------------------------------------------


class TestGcnFpsParity:
    def _setup_disk(self, rng, tmp_path, clouds):
        """Write .superpoint pickles + input plys the reference reads."""
        import pickle

        from ssdr_al_tpu.data.ply import write_ply

        data_path = tmp_path / "data"
        input_path = tmp_path / "input"
        os.makedirs(data_path / "superpoint")
        os.makedirs(input_path)
        for name, (xyz, comps) in clouds.items():
            with open(data_path / "superpoint" / f"{name}.superpoint",
                      "wb") as f:
                pickle.dump({"components": comps}, f)
            write_ply(str(input_path / f"{name}.ply"),
                      [xyz], ["x", "y", "z"])
        return str(input_path), str(data_path)

    def test_end_to_end_selection(self, rng, tmp_path):
        """GCN_FPS_sampling (reference, from-disk) vs gcn_fps_sampling (ours,
        on-device block-diagonal) must pick the same regions."""
        from sklearn.neighbors import KDTree

        from ssdr_al_tpu.active.fps_gcn import gcn_fps_sampling
        from ssdr_al_tpu.active.region_graph import build_region_graph
        from ssdr_al_tpu.data.ply import read_ply

        # two clouds, 6 + 5 regions (last one labeled in each cloud)
        clouds = {}
        for name, n_sp in (("roomA", 6), ("roomB", 5)):
            xyz = (rng.rand(260, 3) * 10).astype(np.float32)
            comps = _random_partition(rng, 260, n_sp)
            clouds[name] = (xyz, comps)
        input_path, data_path = self._setup_disk(rng, tmp_path, clouds)

        unl_ref, lab_ref = [], []
        for name, (_, comps) in clouds.items():
            for i in range(len(comps) - 1):
                unl_ref.append({"cloud_name": name, "sp_idx": i})
            lab_ref.append({"cloud_name": name, "sp_idx": len(comps) - 1})
        feats_unl = rng.rand(len(unl_ref), 16).astype(np.float64) * 4
        feats_lab = rng.rand(len(lab_ref), 16).astype(np.float64) * 4

        ref_ns = load_ref(
            "fps_gcn_cpu.py",
            ["fps_adj_all", "GCN_FPS_sampling", "farthest_features_sample",
             "chamfer_distance", "create_cd"],
            ns={"KDTree": KDTree, "read_ply": read_ply,
                "join": os.path.join, "time": __import__("time"),
                "pickle": __import__("pickle")},
            randint=2,  # pins the FPS start index
        )
        ref_files = ref_ns["GCN_FPS_sampling"](
            feats_lab.copy(), lab_ref, feats_unl.copy(), unl_ref,
            input_path, data_path, sampling_batch=4, gcn_number=2, gcn_top=0,
        )

        # ours: same regions through the block-diagonal graph
        regions_by_cloud, flat_feats, flags = {}, [], []
        for r, f in list(zip(unl_ref, feats_unl)) + list(zip(lab_ref, feats_lab)):
            name, sp = r["cloud_name"], r["sp_idx"]
            regions_by_cloud.setdefault(name, []).append(
                (sp, r in lab_ref, np.arange(1))
            )
            flat_feats.append(f)
            flags.append(r in unl_ref)
        graph = build_region_graph(
            regions_by_cloud,
            {n: clouds[n][0] for n in clouds},
            {n: clouds[n][1] for n in clouds},
            max_points_per_sp=None,
        )
        # reorder features/flags to the graph's flat order
        order = {}
        for i, r in enumerate(unl_ref + lab_ref):
            order[(r["cloud_name"], r["sp_idx"])] = i
        perm = [order[(ref.cloud_name, ref.sp_idx)] for ref in graph.refs]
        feats_g = np.asarray(flat_feats, np.float32)[perm]
        flags_g = np.asarray(flags)[perm]

        # pin our FPS start to the same region the reference started from
        start_region = unl_ref[2]
        unl_idx = np.where(flags_g)[0]
        our_start = [
            k for k, fi in enumerate(unl_idx)
            if (graph.refs[fi].cloud_name, graph.refs[fi].sp_idx)
            == (start_region["cloud_name"], start_region["sp_idx"])
        ][0]
        rng_pin = types.SimpleNamespace(randint=lambda *a, **k: our_start)
        ours = gcn_fps_sampling(
            graph, feats_g, flags_g, 4, gcn_number=2, gcn_top=0, rng=rng_pin,
        )
        assert {k: sorted(v) for k, v in ours.items()} == \
               {k: sorted(v) for k, v in ref_files.items()}

    def test_adjacency_matches(self, rng, tmp_path):
        """fps_adj_all's dense N×N matrix == our per-block normalized
        adjacency scattered to the same layout."""
        import jax.numpy as jnp
        from sklearn.neighbors import KDTree

        from ssdr_al_tpu.active.fps_gcn import _normalize_adjacency
        from ssdr_al_tpu.active.region_graph import build_region_graph
        from ssdr_al_tpu.data.ply import read_ply

        clouds = {}
        for name, n_sp in (("roomA", 5), ("roomB", 4)):
            xyz = (rng.rand(200, 3) * 10).astype(np.float32)
            comps = _random_partition(rng, 200, n_sp)
            clouds[name] = (xyz, comps)
        input_path, data_path = self._setup_disk(rng, tmp_path, clouds)

        refs = [{"cloud_name": n, "sp_idx": i}
                for n, (_, comps) in clouds.items()
                for i in range(len(comps))]
        ref_ns = load_ref(
            "fps_gcn_cpu.py",
            ["fps_adj_all", "chamfer_distance", "create_cd"],
            ns={"KDTree": KDTree, "read_ply": read_ply,
                "join": os.path.join, "time": __import__("time"),
                "pickle": __import__("pickle")},
        )
        adj_ref, _ = ref_ns["fps_adj_all"](
            labeled_select_ref=[], unlabeled_candidate_ref=refs,
            input_path=input_path, data_path=data_path,
        )

        regions_by_cloud = {}
        for r in refs:
            regions_by_cloud.setdefault(r["cloud_name"], []).append(
                (r["sp_idx"], False, np.arange(1))
            )
        graph = build_region_graph(
            regions_by_cloud,
            {n: clouds[n][0] for n in clouds},
            {n: clouds[n][1] for n in clouds},
            max_points_per_sp=None,
        )
        adj_blocks = np.asarray(_normalize_adjacency(
            jnp.asarray(graph.ed_cd), jnp.asarray(graph.mask), 0
        ))
        flat_of = {(r["cloud_name"], r["sp_idx"]): i
                   for i, r in enumerate(refs)}
        for i, ri in enumerate(graph.refs):
            for j, rj in enumerate(graph.refs):
                ours = (
                    adj_blocks[graph.block_of[i], graph.slot_of[i],
                               graph.slot_of[j]]
                    if graph.block_of[i] == graph.block_of[j] else
                    float(i == j)
                )
                ref = adj_ref[flat_of[(ri.cloud_name, ri.sp_idx)],
                              flat_of[(rj.cloud_name, rj.sp_idx)]]
                np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


# --------------------------------------------------------------------------
# kcenterGreedy.py — core-set selection
# --------------------------------------------------------------------------


class TestKCenterParity:
    def test_select_batch(self, rng):
        import jax.numpy as jnp
        from sklearn.metrics import pairwise_distances

        from ssdr_al_tpu.ops.kcenter import kcenter_greedy

        ref_ns = load_ref("kcenterGreedy.py",
                          ["SamplingMethod", "kCenterGreedy"],
                          ns={"pairwise_distances": pairwise_distances,
                              "abc": __import__("abc")})
        x = rng.rand(120, 8).astype(np.float64)
        already = [3, 40, 77]

        kc = ref_ns["kCenterGreedy"](x.copy())
        ref_batch = kc.select_batch_(already_selected=list(already), N=6)

        mask = np.zeros(120, bool)
        mask[already] = True
        ours = np.asarray(kcenter_greedy(jnp.asarray(x, jnp.float32),
                                         jnp.asarray(mask), 6))
        np.testing.assert_array_equal(ours, np.asarray(ref_batch))
