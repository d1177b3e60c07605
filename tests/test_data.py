"""Data layer tests: PLY round-trip, block sampling, pipelines, synthetic."""

import numpy as np

from ssdr_al_tpu.config import ConfigS3DIS
from ssdr_al_tpu.data.cloud import (
    Cloud,
    knn_block_query,
    load_cloud,
    sample_block,
    stack_blocks,
)
from ssdr_al_tpu.data.dataset import (
    PossibilityEvalPipeline,
    SamplingPipeline,
    TrainingPipeline,
)
from ssdr_al_tpu.data.ply import read_ply, write_ply
from ssdr_al_tpu.data.synthetic import make_dataset, make_room

import dataclasses

TINY = dataclasses.replace(ConfigS3DIS, num_points=512)


class TestPly:
    def test_round_trip(self, rng, tmp_path):
        xyz = rng.rand(100, 3).astype(np.float32)
        colors = (rng.rand(100, 3) * 255).astype(np.uint8)
        labels = rng.randint(0, 13, 100).astype(np.uint8)
        p = str(tmp_path / "t.ply")
        write_ply(p, [xyz, colors, labels],
                  ["x", "y", "z", "red", "green", "blue", "class"])
        data = read_ply(p)
        np.testing.assert_allclose(data["x"], xyz[:, 0])
        np.testing.assert_array_equal(data["class"], labels)
        np.testing.assert_array_equal(data["green"], colors[:, 1])

    def test_load_cloud(self, rng, tmp_path):
        xyz = rng.rand(50, 3).astype(np.float32)
        colors = rng.rand(50, 3).astype(np.float32)
        labels = rng.randint(0, 5, 50).astype(np.int32)
        p = str(tmp_path / "roomX.ply")
        write_ply(p, [xyz, colors, labels],
                  ["x", "y", "z", "red", "green", "blue", "class"])
        c = load_cloud(p)
        assert c.name == "roomX" and c.num_points == 50
        np.testing.assert_allclose(c.xyz, xyz, rtol=1e-6)


class TestBlocks:
    def test_knn_block_query_exact(self, rng):
        xyz = rng.randn(500, 3).astype(np.float32)
        center = xyz[7]
        idx = knn_block_query(xyz, center, 50)
        d2 = ((xyz - center) ** 2).sum(1)
        want = set(np.argsort(d2)[:50])
        assert set(idx) == want

    def test_sample_block_shapes_and_upsample(self, rng):
        cloud = make_room(rng, "r", num_points=300)
        b = sample_block(cloud, 512, rng)  # cloud smaller than block
        assert b.xyz.shape == (512, 3)
        assert b.features.shape == (512, 6)
        assert len(np.unique(b.point_idx)) <= cloud.num_points

    def test_block_centered_on_pick(self, rng):
        cloud = make_room(rng, "r", num_points=5000)
        b = sample_block(cloud, 512, rng)
        # xyz is recentered: reconstruct from point_idx
        recon = cloud.xyz[b.point_idx] - (cloud.xyz[b.point_idx] - b.xyz)
        np.testing.assert_allclose(recon, b.xyz, atol=1e-5)
        # features first 3 dims == xyz (s3dis_dataset.py:158)
        np.testing.assert_allclose(b.features[:, :3], b.xyz, atol=1e-6)


class TestGridSuperpoints:
    def test_partition_contract(self, rng):
        """grid_superpoints (selection-scale benchmark partitioner) must
        honor the partition/cp.py contract: exhaustive disjoint components,
        ascending point ids per region, in_component consistency, region
        count near the target."""
        from ssdr_al_tpu.data.synthetic import grid_superpoints

        xyz = (rng.rand(5000, 3) * np.array([8.0, 6.0, 3.0])).astype(
            np.float32)
        comps, in_comp = grid_superpoints(xyz, target_sp=120)
        assert len(comps) == in_comp.max() + 1
        assert 60 <= len(comps) <= 240, len(comps)
        seen = np.concatenate(comps)
        assert len(seen) == 5000 and len(np.unique(seen)) == 5000
        for i, c in enumerate(comps):
            assert (np.diff(c) > 0).all()          # ascending
            assert (in_comp[c] == i).all()


class TestPipelines:
    def test_training_pipeline_batches(self, rng):
        train, _ = make_dataset(num_train=3, num_points=2000)
        pipe = TrainingPipeline(train, TINY, seed=0)
        batches = list(pipe.batches(3, batch_size=2))
        assert len(batches) == 3
        for b in batches:
            assert b["xyz"].shape == (2, 512, 3)
            assert b["pseudo"].shape == (2, 512)

    def test_training_pipeline_uses_pseudo_gt(self, rng):
        train, _ = make_dataset(num_train=1, num_points=1000)
        gt = np.zeros((2, 1000), np.float32)
        gt[0, :100] = 1
        gt[1, :100] = 3
        pipe = TrainingPipeline(train, TINY, pseudo_gt={train[0].name: gt})
        b = pipe.sample_batch(1)
        act_points = b["activation"][0] > 0
        assert (b["pseudo"][0][act_points] == 3).all()

    def test_sampling_pipeline_covers_cloud(self, rng):
        train, _ = make_dataset(num_train=1, num_points=1500)
        pipe = SamplingPipeline(train, TINY)
        seen = np.zeros(train[0].num_points, bool)
        for batch, idx, valid in pipe.cloud_chunks(train[0]):
            assert batch["xyz"].shape == (1, 512, 3)
            seen[idx[:valid]] = True
        assert seen.all()

    def test_possibility_pipeline_coverage_increases(self, rng):
        train, _ = make_dataset(num_train=2, num_points=1000)
        pipe = PossibilityEvalPipeline(train, TINY)
        m0 = pipe.global_min
        for _ in range(4):
            pipe.get_batch(2)
        assert pipe.global_min > m0


class TestSynthetic:
    def test_labels_geometrically_sane(self, rng):
        room = make_room(rng, "r", num_points=8000)
        floor = room.xyz[room.labels == 0]
        ceil = room.xyz[room.labels == 1]
        assert abs(floor[:, 2].mean()) < 0.1
        assert ceil[:, 2].mean() > 2.5
