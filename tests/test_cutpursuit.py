"""Native cut-pursuit tests: energy/partition properties on toy graphs
(mirrors the reference's smoke test, cut-pursuit/src/test.py, plus the
assertions it lacked)."""

import numpy as np
import pytest

from ssdr_al_tpu.partition.cp import connected_components, cutpursuit


def chain_graph(n):
    src = np.arange(n - 1, dtype=np.uint32)
    return src, src + 1, np.ones(n - 1, np.float32)


class TestCutPursuit:
    def test_two_clusters_split(self, rng):
        n = 120
        obs = np.zeros((n, 2), np.float32)
        obs[n // 2:] += 5.0
        obs += rng.randn(n, 2).astype(np.float32) * 0.01
        src, tgt, w = chain_graph(n)
        comps, in_comp = cutpursuit(obs, src, tgt, w, reg_strength=0.5)
        assert len(comps) == 2
        assert sorted(len(c) for c in comps) == [60, 60]
        # in_component consistent with components
        for ci, c in enumerate(comps):
            assert (in_comp[c] == ci).all()

    def test_huge_lambda_one_component(self, rng):
        n = 60
        obs = rng.randn(n, 3).astype(np.float32)
        src, tgt, w = chain_graph(n)
        comps, _ = cutpursuit(obs, src, tgt, w, reg_strength=1e6)
        assert len(comps) == 1

    def test_small_lambda_fine_partition(self, rng):
        n = 60
        obs = (rng.randn(n, 2) * 10).astype(np.float32)
        src, tgt, w = chain_graph(n)
        comps_fine, _ = cutpursuit(obs, src, tgt, w, reg_strength=1e-3)
        comps_coarse, _ = cutpursuit(obs, src, tgt, w, reg_strength=10.0)
        assert len(comps_fine) > len(comps_coarse)

    def test_partition_is_exhaustive_and_disjoint(self, rng):
        n = 200
        obs = rng.randn(n, 4).astype(np.float32)
        src = rng.randint(0, n, 800).astype(np.uint32)
        tgt = rng.randint(0, n, 800).astype(np.uint32)
        keep = src != tgt
        src, tgt = src[keep], tgt[keep]
        w = np.abs(rng.randn(len(src))).astype(np.float32)
        comps, in_comp = cutpursuit(obs, src, tgt, w, reg_strength=0.1)
        all_pts = np.concatenate(comps)
        assert len(all_pts) == n
        assert len(np.unique(all_pts)) == n
        assert in_comp.min() == 0 and in_comp.max() == len(comps) - 1

    def test_energy_beats_trivial_partitions(self, rng):
        """The solver's energy must be ≤ both the 1-component and the
        per-vertex-singleton labelings (it can realize either)."""
        n = 80
        obs = rng.randn(n, 3).astype(np.float32) * 2
        src, tgt, w = chain_graph(n)
        lam = 0.5
        comps, in_comp = cutpursuit(obs, src, tgt, w, reg_strength=lam)

        def energy(assign):
            k = assign.max() + 1
            e = 0.0
            for c in range(k):
                m = assign == c
                if m.any():
                    e += ((obs[m] - obs[m].mean(0)) ** 2).sum()
            e += lam * (w * (assign[src] != assign[tgt])).sum()
            return e

        e_solver = energy(in_comp)
        e_one = energy(np.zeros(n, np.int64))
        e_singl = energy(np.arange(n))
        assert e_solver <= e_one + 1e-3
        assert e_solver <= e_singl + 1e-3


class TestConnectedComponents:
    def test_label_respecting(self):
        n = 10
        src, tgt, _ = chain_graph(n)
        labels = np.array([0, 0, 1, 1, 1, 0, 0, 2, 2, 2], np.int32)
        cc = connected_components(n, src, tgt, labels)
        assert cc.max() + 1 == 4
        assert cc[0] == cc[1] and cc[2] == cc[3] == cc[4]
        assert cc[5] == cc[6] != cc[0]


class TestPartitionPipeline:
    def test_partition_cloud_superpoints_are_label_coherent(self, rng):
        """Partitioning a synthetic room should produce superpoints whose
        points mostly share one ground-truth class (the whole premise of
        superpoint AL — compute_superpoint.py + SURVEY §0)."""
        from ssdr_al_tpu.data.synthetic import make_room
        from ssdr_al_tpu.partition.superpoint import partition_cloud

        room = make_room(rng, "r", num_points=3000)
        comps, in_comp = partition_cloud(
            room.xyz, room.colors, reg_strength=0.05, knn_backend="host"
        )
        assert 2 <= len(comps) < 3000
        purity = []
        for c in comps:
            if len(c) >= 5:
                labels = room.labels[c]
                purity.append(np.bincount(labels).max() / len(labels))
        assert np.mean(purity) > 0.85
