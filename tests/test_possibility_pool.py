"""PossibilityDevicePool tests: the device-resident Semantic3D train2 path
(possibility schedule + class-weighted visitation + augmentation) against
the host pipeline's semantics (data/dataset.py::PossibilityTrainingPipeline,
reference semantic3d_dataset_train.py:135-210)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ssdr_al_tpu.config import ConfigSemantic3D
from ssdr_al_tpu.data.cloud import Cloud
from ssdr_al_tpu.models.randlanet import RandLANet
from ssdr_al_tpu.train.possibility_pool import (
    PossibilityDevicePool,
    possibility_extract,
)
from ssdr_al_tpu.train.trainer import (
    create_train_state,
    make_possibility_pooled_train_step,
)

TINY = dataclasses.replace(
    ConfigSemantic3D, num_points=512, d_out=(4, 8, 8, 8, 8), num_classes=3,
    ignored_label_inds=(), batch_size=2, noise_init=1e-6,
)


def make_clouds(rng, n_clouds=2, n=300):
    clouds = []
    for i in range(n_clouds):
        xyz = (rng.rand(n + 40 * i, 3) * 8).astype(np.float32)
        clouds.append(Cloud(
            name=f"c{i}", xyz=xyz,
            colors=rng.rand(len(xyz), 3).astype(np.float32),
            labels=rng.randint(0, 3, len(xyz)).astype(np.int32)))
    return clouds


def run_extract(pool, poss, key, batch_size=2, augment=False):
    return possibility_extract(
        *pool.device_args(), pool.class_weight, poss, key, batch_size,
        pool.cfg.num_points, pool.cfg.noise_init / 10, pool.window, augment)


class TestPossibilitySchedule:
    def test_matches_host_schedule_small_clouds(self, rng):
        """Clouds smaller than num_points: the block is the whole cloud, so
        the possibility delta is over every valid point — comparable to a
        numpy re-computation on the dequantized coordinates, and the
        cloud/point argmin schedule must follow the updated field."""
        clouds = make_clouds(rng)
        pool = PossibilityDevicePool(clouds, TINY, seed=0, augment=False)
        assert pool.available
        poss0 = np.asarray(pool.init_possibility)
        key = jax.random.PRNGKey(3)
        new_poss, xyz, feats, labels, act, pseudo = run_extract(
            pool, pool.init_possibility, key)
        new_poss = np.asarray(new_poss)

        # numpy oracle over the same quantized coordinates + tiny jitter
        # (noise_init=1e-6 ⇒ picks == centers up to ~1e-7), on the ragged
        # flat field: per-cloud segments live at pool's row offsets
        exp = poss0.copy()
        cw = np.asarray(pool.class_weight)
        offs = pool._offs_np
        for _ in range(2):
            mins = [exp[offs[i]: offs[i] + c.num_points].min()
                    for i, c in enumerate(clouds)]
            ci = int(np.argmin(mins))
            cl = clouds[ci]
            seg = exp[offs[ci]: offs[ci] + cl.num_points]
            pi = int(np.argmin(seg))
            from ssdr_al_tpu.train.device_pool import _quantize_u16

            q, lo, sc = _quantize_u16(cl.xyz)
            deq = lo[None] + q.astype(np.float32) * sc[None]
            pick = deq[pi]
            d2 = np.sum((deq - pick[None]) ** 2, axis=1)
            delta = np.square(1 - d2 / d2.max()) * cw[cl.labels]
            exp[offs[ci]: offs[ci] + cl.num_points] += delta
        # same cells were touched (delta magnitude may differ at 1e-6 level
        # from the pick jitter): compare the update masks and values
        np.testing.assert_allclose(new_poss[np.isfinite(new_poss)],
                                   exp[np.isfinite(exp)], rtol=1e-3,
                                   atol=1e-5)

    def test_two_steps_advance_the_field(self, rng):
        clouds = make_clouds(rng)
        pool = PossibilityDevicePool(clouds, TINY, seed=0)
        p1, *_ = run_extract(pool, pool.init_possibility,
                             jax.random.PRNGKey(0))
        p2, *_ = run_extract(pool, p1, jax.random.PRNGKey(1))
        a = np.asarray(pool.init_possibility)
        b, c = np.asarray(p1), np.asarray(p2)
        fin = np.isfinite(a)
        assert (b[fin] >= a[fin]).all() and (c[fin] >= b[fin]).all()
        assert (c[fin] > a[fin]).any()

    def test_z_stays_absolute_and_augment_differs(self, rng):
        clouds = make_clouds(rng)
        pool = PossibilityDevicePool(clouds, TINY, seed=0)
        key = jax.random.PRNGKey(5)
        _, xyz, feats_plain, *_ = run_extract(
            pool, pool.init_possibility, key, augment=False)
        _, _, feats_aug, *_ = run_extract(
            pool, pool.init_possibility, key, augment=True)
        # z absolute: block z values live in the cloud's world range
        z = np.asarray(xyz[..., 2])
        assert z.min() >= -0.01 and z.max() <= 8.01
        np.testing.assert_allclose(np.asarray(feats_plain[..., :3]),
                                   np.asarray(xyz), atol=0)
        # augmentation actually transforms the feature copy
        assert not np.allclose(np.asarray(feats_aug[..., :3]),
                               np.asarray(xyz), atol=1e-4)
        # colors untouched by augmentation
        np.testing.assert_allclose(np.asarray(feats_aug[..., 3:]),
                                   np.asarray(feats_plain[..., 3:]), atol=0)


class TestPossibilityPooledStep:
    def test_step_learns_color_rule(self, rng):
        clouds = []
        for i in range(2):
            n = 700
            xyz = (rng.rand(n, 3) * 4).astype(np.float32)
            labels = rng.randint(0, 3, n).astype(np.int32)
            colors = np.zeros((n, 3), np.float32)
            colors[:, 0] = labels / 2.0
            clouds.append(Cloud(name=f"c{i}", xyz=xyz, colors=colors,
                                labels=labels))
        pool = PossibilityDevicePool(clouds, TINY, seed=0, augment=False)
        model = RandLANet(TINY)
        poss = pool.init_possibility
        _, xyz_s, feats_s, *_ = run_extract(pool, poss, jax.random.PRNGKey(0))
        state = create_train_state(
            model, TINY, jax.random.PRNGKey(0),
            {"xyz": np.asarray(xyz_s), "features": np.asarray(feats_s)},
            steps_per_epoch=100)
        step = make_possibility_pooled_train_step(
            model, TINY, np.ones(3, np.float32), knn_engine="xla",
            augment=False, window=pool.window)
        key = jax.random.PRNGKey(1)
        args = pool.device_args()
        losses = []
        for _ in range(12):
            state, poss, m = step(state, args, pool.class_weight, poss, key)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.7, losses
        assert float(m["accuracy"]) > 0.5
