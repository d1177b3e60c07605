"""Semantic3D-variant tests: possibility training pipeline, augmentation,
ignored-label loss path, chunked big-cloud inference."""

import dataclasses

import numpy as np

from ssdr_al_tpu.config import ConfigSemantic3D
from ssdr_al_tpu.data.dataset import (
    PossibilityTrainingPipeline,
    SamplingPipeline,
    augment_block_features,
)
from ssdr_al_tpu.data.synthetic import make_dataset

TINY = dataclasses.replace(
    ConfigSemantic3D, num_points=512, num_classes=5, ignored_label_inds=(0,),
)


class TestAugmentation:
    def test_rotation_preserves_z_and_norms(self, rng):
        xyz = rng.randn(200, 3).astype(np.float32)
        colors = rng.rand(200, 3).astype(np.float32)
        out = augment_block_features(xyz, colors, np.random.RandomState(0),
                                     scale_min=1.0, scale_max=1.0,
                                     symmetries=(False, False, False),
                                     noise_sigma=0.0)
        aug_xyz = out[:, :3]
        # pure vertical rotation: z unchanged, xy norm preserved
        np.testing.assert_allclose(aug_xyz[:, 2], xyz[:, 2], atol=1e-5)
        np.testing.assert_allclose(
            np.linalg.norm(aug_xyz[:, :2], axis=1),
            np.linalg.norm(xyz[:, :2], axis=1), rtol=1e-4,
        )
        np.testing.assert_allclose(out[:, 3:], colors)

    def test_scale_and_symmetry_bounds(self, rng):
        xyz = np.eye(3, dtype=np.float32) * 10
        colors = np.zeros((3, 3), np.float32)
        seen_flip = False
        for seed in range(20):
            out = augment_block_features(
                xyz, colors, np.random.RandomState(seed), noise_sigma=0.0
            )
            norms = np.linalg.norm(out[:, :3], axis=1)
            assert (norms <= 10 * 1.2 * np.sqrt(3) + 1e-3).all()
            assert (norms >= 10 * 0.8 / np.sqrt(3) - 1e-3).all()
        # x-symmetry occasionally flips (augment_symmetries=[True,False,False])


class TestPossibilityTraining:
    def test_batches_and_z_absolute(self, rng):
        train, _ = make_dataset(num_train=2, num_points=3000)
        pipe = PossibilityTrainingPipeline(train, TINY, augment=False)
        b = pipe.sample_batch(2)
        assert b["xyz"].shape == (2, 512, 3)
        # z is NOT recentered (semantic3d_dataset_train.py:182): all synthetic
        # room z values are ≥ ~0
        assert b["xyz"][..., 2].min() > -0.5
        # xy is recentered around the pick
        assert abs(b["xyz"][..., 0].mean()) < 1.0

    def test_class_weighted_possibility(self, rng):
        train, _ = make_dataset(num_train=1, num_points=3000)
        pipe = PossibilityTrainingPipeline(train, TINY, augment=True)
        m0 = min(pipe.min_possibility)
        for _ in range(3):
            pipe.sample_batch(2)
        assert min(pipe.min_possibility) >= m0
        assert pipe.class_weight.sum() > 0.99

    def test_pseudo_gt_attached(self, rng):
        train, _ = make_dataset(num_train=1, num_points=2000)
        n = train[0].num_points
        gt = np.zeros((2, n), np.float32)
        gt[0, :50] = 1
        gt[1, :50] = 2
        pipe = PossibilityTrainingPipeline(
            train, TINY, pseudo_gt={train[0].name: gt}, augment=False
        )
        b = pipe.sample_batch(1)
        act = b["activation"][0] > 0
        if act.any():
            assert (b["pseudo"][0][act] == 2).all()


class TestChunkedInference:
    def test_big_cloud_chunking_matches_octant_semantics(self, rng):
        """Clouds above the chunk size are processed in fixed-size chunks
        covering every point exactly once (the TPU analogue of the
        reference's recursive octant splitting)."""
        train, _ = make_dataset(num_train=1, num_points=5000)
        cloud = train[0]
        pipe = SamplingPipeline([cloud], TINY, chunk_points=512)
        counts = np.zeros(cloud.num_points, np.int64)
        n_chunks = 0
        for batch, idx, valid in pipe.cloud_chunks(cloud):
            counts[idx[:valid]] += 1
            n_chunks += 1
        assert (counts == 1).all()
        assert n_chunks == -(-cloud.num_points // 512)
