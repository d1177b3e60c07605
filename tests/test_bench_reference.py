"""Smoke-guard for bench.py's reference-selection measurement.

bench.measure_reference_selection AST-executes the reference's own numpy
selection (scoring loop, clsbal, candidates, anchors, features, GCN-FPS) —
this test runs it on a tiny workload so loader drift (renamed reference
symbols, numpy-compat breakage, artifact-format changes) fails in CI
instead of inside the benchmark run.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/SSDR_AL_s3dis"),
    reason="reference checkout not mounted",
)


def test_reference_selection_smoke(tmp_path):
    import bench
    from ssdr_al_tpu.active.samplers import SeedSampler
    from ssdr_al_tpu.active.state import ALState, RoundStats
    from ssdr_al_tpu.data.synthetic import grid_superpoints, make_dataset

    work = str(tmp_path)
    train, _ = make_dataset(num_train=2, num_points=1500)
    state = ALState(work, ["t0", "x"])
    total_obj = {"unlabeled": {}}
    sp_num = 0
    for c in train:
        comps, in_comp = grid_superpoints(c.xyz, 40)
        state.write_superpoints(c.name, comps, in_comp, c.num_points)
        total_obj["unlabeled"][c.name] = np.arange(len(comps))
        sp_num += len(comps)
    total_obj.update(file_num=2, sp_num=sp_num, point_num=3000)
    state.write_registry(total_obj)
    seed_state = ALState(work, ["seed"])
    SeedSampler(seed_state, train, sp_num).sampling(
        max(1, sp_num // 10), 0, RoundStats())
    seed_round = os.path.join(work, "sampling", "seed", "round_1")

    phases = bench.measure_reference_selection(
        work, train, state, seed_round, budget=8, round_num=2)

    for key in ("scoring_s", "classbal_sort_s", "candidates_s", "anchors_s",
                "features_s", "gcn_fps_s", "total_s"):
        assert key in phases and phases[key] >= 0, (key, phases)
    # every unlabeled region large enough was scored
    assert 0 < phases["regions_scored"] <= sp_num
    assert phases["total_s"] == pytest.approx(
        sum(v for k, v in phases.items()
            if k.endswith("_s") and k != "total_s"))
