"""Trainer tests: learning on a separable toy task, lr schedule, checkpoints."""

import dataclasses
import os

import jax
import numpy as np

from ssdr_al_tpu.config import ConfigS3DIS
from ssdr_al_tpu.models.randlanet import RandLANet
from ssdr_al_tpu.train.trainer import (
    create_train_state,
    make_lr_schedule,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)

TINY = dataclasses.replace(
    ConfigS3DIS, num_points=512, d_out=(4, 8, 8, 8, 8), num_classes=3,
)


def make_batch(rng, b=2, n=512, c=3):
    xyz = (rng.rand(b, n, 3) * 4).astype(np.float32)
    # labels perfectly determined by color channel 0
    labels = rng.randint(0, c, (b, n)).astype(np.int32)
    colors = np.zeros((b, n, 3), np.float32)
    colors[..., 0] = labels / (c - 1)
    feats = np.concatenate([xyz, colors], -1).astype(np.float32)
    return {
        "xyz": xyz, "features": feats, "labels": labels,
        "activation": np.ones((b, n), np.float32), "pseudo": labels,
    }


def test_lr_schedule_decays_per_epoch():
    sched = make_lr_schedule(TINY, steps_per_epoch=10)
    assert float(sched(0)) == TINY.learning_rate
    np.testing.assert_allclose(
        float(sched(10)), TINY.learning_rate * TINY.lr_decay, rtol=1e-6
    )
    np.testing.assert_allclose(
        float(sched(25)), TINY.learning_rate * TINY.lr_decay**2, rtol=1e-6
    )


def test_train_step_learns_color_rule(rng):
    model = RandLANet(TINY)
    weights = np.ones(3, np.float32)
    batch = make_batch(rng)
    state = create_train_state(
        model, TINY, jax.random.PRNGKey(0),
        {"xyz": batch["xyz"], "features": batch["features"]},
        steps_per_epoch=100,
    )
    step = make_train_step(model, TINY, weights, knn_engine="xla")
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(12):
        state, m = step(state, batch, key)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses
    assert float(m["accuracy"]) > 0.5


def test_checkpoint_roundtrip(rng, tmp_path):
    model = RandLANet(TINY)
    batch = make_batch(rng)
    state = create_train_state(
        model, TINY, jax.random.PRNGKey(0),
        {"xyz": batch["xyz"], "features": batch["features"]},
        steps_per_epoch=10,
    )
    path = os.path.join(str(tmp_path), "snapshots", "snap-3")
    save_checkpoint(path, state)
    # mutate, then restore
    mutated = state.replace(
        params=jax.tree_util.tree_map(lambda x: x + 1.0, state.params)
    )
    restored = restore_checkpoint(path, mutated)
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
