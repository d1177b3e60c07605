"""DeviceTrainPool tests: extraction parity vs the host pipeline's block
semantics (sample_block / knn_block_query, s3dis_dataset.py:115-154), payload
alignment, small-cloud upsampling, per-round pseudo updates, pooled train
step, and the memory-budget gate."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ssdr_al_tpu.config import ConfigS3DIS
from ssdr_al_tpu.data.cloud import Cloud
from ssdr_al_tpu.models.randlanet import RandLANet
from ssdr_al_tpu.train.device_pool import DeviceTrainPool, extract_blocks
from ssdr_al_tpu.train.trainer import (
    create_train_state,
    make_pooled_train_step,
)

TINY = dataclasses.replace(
    ConfigS3DIS, num_points=512, d_out=(4, 8, 8, 8, 8), num_classes=3,
)


def make_clouds(rng, n_clouds=3, n=900, c=3):
    clouds = []
    for i in range(n_clouds):
        xyz = (rng.rand(n + i * 37, 3) * 8).astype(np.float32)
        labels = rng.randint(0, c, len(xyz)).astype(np.int32)
        colors = rng.rand(len(xyz), 3).astype(np.float32)
        clouds.append(Cloud(name=f"c{i}", xyz=xyz, colors=colors,
                            labels=labels))
    return clouds


def pseudo_for(clouds, rng):
    return {
        c.name: np.stack([
            (rng.rand(c.num_points) > 0.5).astype(np.float32),
            rng.randint(0, 3, c.num_points).astype(np.float32),
        ])
        for c in clouds
    }


def run_extract(pool, ids, picks, key=None):
    key = key if key is not None else jax.random.PRNGKey(0)
    return extract_blocks(
        *pool.device_args(), jnp.asarray(ids), jnp.asarray(picks),
        key, pool.cfg.num_points, pool.window)


class TestExtraction:
    def test_matches_host_oracle_sets_and_payload(self, rng):
        clouds = make_clouds(rng)
        pg = pseudo_for(clouds, rng)
        pool = DeviceTrainPool(clouds, TINY, pseudo_gt=pg, seed=0)
        assert pool.available
        ids, picks = pool.sample_indices(4)
        xyz, feats, labels, act, pseudo = run_extract(pool, ids, picks)
        expect = pool.extract_host(ids, picks)
        for b in range(4):
            cl = clouds[int(ids[b])]
            gt = pg[cl.name]
            # the selected point SET matches the exact-NN oracle on the
            # dequantized coordinates (order differs: device sorts by
            # distance; ties are resolved identically — stable sort)
            got_lab = np.sort(np.asarray(labels[b]))
            exp_lab = np.sort(cl.labels[expect[b]])
            np.testing.assert_array_equal(got_lab, exp_lab)
            # payload alignment: centered xyz + colors + labels + pseudo-gt
            # all come from the SAME row (check via nearest-match of the
            # first block point)
            np.testing.assert_array_equal(
                np.sort(np.asarray(pseudo[b])),
                np.sort(gt[1][expect[b]].astype(np.int32)))
            np.testing.assert_allclose(
                np.asarray(act[b]).sum(), gt[0][expect[b]].sum(), atol=0)
            # feature layout: [centered xyz, colors]
            np.testing.assert_allclose(
                np.asarray(feats[b][:, :3]), np.asarray(xyz[b]), atol=0)

    def test_rows_are_consistent_tuples(self, rng):
        """Every extracted row's (xyz, color, label) triple exists in the
        source cloud — payload planes are not permuted against each other."""
        clouds = make_clouds(rng, n_clouds=1, n=500)
        pool = DeviceTrainPool(clouds, TINY, seed=0)
        ids, picks = pool.sample_indices(2)
        xyz, feats, labels, act, pseudo = run_extract(pool, ids, picks)
        cl = clouds[0]
        for b in range(2):
            world = np.asarray(xyz[b]) + picks[b][None]
            # match each block point to its source row by coordinates
            d = np.linalg.norm(
                world[:, None, :] - cl.xyz[None, :, :], axis=-1)
            src = d.argmin(axis=1)
            assert d.min(axis=1).max() < 2e-3  # u16 grid error bound
            np.testing.assert_array_equal(np.asarray(labels[b]),
                                          cl.labels[src])

    def test_small_cloud_upsampled_with_valid_duplicates(self, rng):
        clouds = make_clouds(rng, n_clouds=1, n=100)  # < num_points
        pool = DeviceTrainPool(clouds, TINY, seed=0)
        ids, picks = pool.sample_indices(2)
        xyz, feats, labels, act, pseudo = run_extract(pool, ids, picks)
        cl = clouds[0]
        for b in range(2):
            world = np.asarray(xyz[b]) + picks[b][None]
            d = np.linalg.norm(
                world[:, None, :] - cl.xyz[None, :, :], axis=-1)
            # every row (including duplicates) is a real cloud point
            assert d.min(axis=1).max() < 2e-3
            # all valid points appear at least once (first n sorted rows)
            src = np.unique(d.argmin(axis=1))
            assert len(src) == cl.num_points

    def test_update_pseudo_gt_changes_planes_only(self, rng):
        clouds = make_clouds(rng, n_clouds=2)
        pg1 = pseudo_for(clouds, rng)
        pool = DeviceTrainPool(clouds, TINY, pseudo_gt=pg1, seed=0)
        ids, picks = pool.sample_indices(2)
        key = jax.random.PRNGKey(7)
        xyz1, f1, l1, a1, p1 = run_extract(pool, ids, picks, key)
        pg2 = pseudo_for(clouds, rng)
        pool.update_pseudo_gt(pg2)
        xyz2, f2, l2, a2, p2 = run_extract(pool, ids, picks, key)
        np.testing.assert_array_equal(np.asarray(xyz1), np.asarray(xyz2))
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
        for b in range(2):
            cl = clouds[int(ids[b])]
            # recover each extracted row's source point (same recipe as
            # test_label_alignment) and pin BOTH updated planes to pg2
            world = np.asarray(xyz2[b]) + picks[b][None]
            d = np.linalg.norm(
                world[:, None, :] - cl.xyz[None, :, :], axis=-1)
            src = d.argmin(axis=1)
            np.testing.assert_array_equal(np.asarray(p2[b]),
                                          pg2[cl.name][1][src])
            np.testing.assert_array_equal(np.asarray(a2[b]),
                                          pg2[cl.name][0][src])
            # the new pseudo plane is actually visible
            if not np.array_equal(pg1[cl.name][1], pg2[cl.name][1]):
                assert not np.array_equal(np.asarray(p1[b]),
                                          np.asarray(p2[b]))

    def test_budget_gate(self, rng):
        clouds = make_clouds(rng)
        pool = DeviceTrainPool(clouds, TINY, budget_mb=0.001)
        assert not pool.available

    def test_ragged_arena_heterogeneous_sizes(self, rng):
        """Resident bytes are proportional to ACTUAL points: one big cloud
        among many small ones must not multiply the footprint by
        clouds × max size (the uniform-padding layout did, silently
        disabling the pool at heterogeneous scale), and extraction from
        both ends of the arena must stay oracle-exact."""
        clouds = [Cloud(name="big",
                        xyz=(rng.rand(5000, 3) * 8).astype(np.float32),
                        colors=rng.rand(5000, 3).astype(np.float32),
                        labels=rng.randint(0, 3, 5000).astype(np.int32))]
        for i in range(9):
            n = 600 + 37 * i
            clouds.append(Cloud(
                name=f"s{i}", xyz=(rng.rand(n, 3) * 8).astype(np.float32),
                colors=rng.rand(n, 3).astype(np.float32),
                labels=rng.randint(0, 3, n).astype(np.int32)))
        # ragged: (5120 + Σ small pads + slack 5120) * 22 B ≈ 0.37 MB;
        # uniform padding would need 10 * 5120 * 22 ≈ 1.1 MB
        pool = DeviceTrainPool(clouds, TINY, seed=0, budget_mb=0.5)
        assert pool.available
        ids = np.array([0, 9, 5, 0], np.int32)  # big, last, middle, big
        picks = np.stack([clouds[int(i)].xyz[0] for i in ids]).astype(
            np.float32)
        _, _, labels, _, _ = run_extract(pool, ids, picks)
        expect = pool.extract_host(ids, picks)
        for b in range(len(ids)):
            cl = clouds[int(ids[b])]
            np.testing.assert_array_equal(
                np.sort(np.asarray(labels[b])),
                np.sort(cl.labels[expect[b]]))


class TestPooledStep:
    def test_pooled_step_learns_color_rule(self, rng):
        # labels determined by color channel 0 (same toy task as
        # test_trainer.py) — the pooled step must learn it through the
        # quantized slab + on-device extraction
        clouds = []
        for i in range(2):
            n = 700
            xyz = (rng.rand(n, 3) * 4).astype(np.float32)
            labels = rng.randint(0, 3, n).astype(np.int32)
            colors = np.zeros((n, 3), np.float32)
            colors[:, 0] = labels / 2.0
            clouds.append(Cloud(name=f"c{i}", xyz=xyz, colors=colors,
                                labels=labels))
        pool = DeviceTrainPool(clouds, TINY, seed=0)
        model = RandLANet(TINY)
        ids, picks = pool.sample_indices(2)
        xyz_s, feats_s, *_ = run_extract(pool, ids, picks)
        state = create_train_state(
            model, TINY, jax.random.PRNGKey(0),
            {"xyz": np.asarray(xyz_s), "features": np.asarray(feats_s)},
            steps_per_epoch=100,
        )
        step = make_pooled_train_step(
            model, TINY, np.ones(3, np.float32), knn_engine="xla",
            window=pool.window)
        key = jax.random.PRNGKey(1)
        losses = []
        args = pool.device_args()
        for _ in range(12):
            ids, picks = pool.sample_indices(2)
            state, m = step(state, args, jnp.asarray(ids),
                            jnp.asarray(picks), key)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.7, losses
        assert float(m["accuracy"]) > 0.5
