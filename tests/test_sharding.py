"""Multi-chip (virtual 8-device CPU mesh) sharding tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssdr_al_tpu.config import ConfigS3DIS
from ssdr_al_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)

TINY = dataclasses.replace(
    ConfigS3DIS, num_points=512, d_out=(4, 8, 8, 8, 8), batch_size=8,
    num_classes=5,
)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_batch_sharded_across_devices(rng):
    mesh = make_mesh()
    batch = {"xyz": rng.rand(8, 64, 3).astype(np.float32)}
    sharded = shard_batch(batch, mesh)
    shards = sharded["xyz"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (1, 64, 3)


def test_data_parallel_train_step_matches_single_device(rng):
    """One dp step over the 8-device mesh must equal the unsharded step."""
    from ssdr_al_tpu.models.randlanet import RandLANet
    from ssdr_al_tpu.train.trainer import create_train_state, make_train_step

    model = RandLANet(TINY)
    weights = np.ones(TINY.num_classes, np.float32)
    b, n = 8, TINY.num_points
    batch = {
        "xyz": (rng.rand(b, n, 3) * 10).astype(np.float32),
        "features": rng.rand(b, n, 6).astype(np.float32),
        "labels": rng.randint(0, TINY.num_classes, (b, n)).astype(np.int32),
        "activation": np.ones((b, n), np.float32),
        "pseudo": rng.randint(0, TINY.num_classes, (b, n)).astype(np.int32),
    }
    state = create_train_state(
        model, TINY, jax.random.PRNGKey(0),
        {"xyz": batch["xyz"], "features": batch["features"]},
        steps_per_epoch=10,
    )
    train_step = make_train_step(model, TINY, weights, knn_engine="xla")
    rng_key = jax.random.PRNGKey(1)

    # single-device (fully replicated batch placement)
    _, metrics_single = train_step(state, batch, rng_key)

    # dp over the mesh
    mesh = make_mesh()
    state_repl = jax.device_put(state, replicated_sharding(mesh))
    batch_sharded = shard_batch(batch, mesh)
    new_state, metrics_dp = train_step(state_repl, batch_sharded, rng_key)

    np.testing.assert_allclose(
        float(metrics_single["loss"]), float(metrics_dp["loss"]), rtol=1e-4
    )
    # params updated and finite
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_graft_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_trainer_with_mesh(rng, tmp_path):
    """Trainer.train_round over the 8-device mesh: loss finite, snapshot saved."""
    from ssdr_al_tpu.data.synthetic import make_dataset
    from ssdr_al_tpu.data.dataset import TrainingPipeline
    from ssdr_al_tpu.train.trainer import Trainer

    cfg = dataclasses.replace(TINY, batch_size=8, train_steps=2, max_epoch=1)
    train, _ = make_dataset(num_train=2, num_points=2000)
    pipe = TrainingPipeline(train, cfg)
    trainer = Trainer(
        cfg, "S3DIS", save_dir=str(tmp_path / "snap"),
        knn_engine="xla", mesh=make_mesh(), log_fn=lambda *_: None,
    )
    trainer.weights = np.ones(cfg.num_classes, np.float32)
    from ssdr_al_tpu.train.trainer import make_train_step

    trainer.train_step = make_train_step(trainer.model, cfg, trainer.weights, "xla")
    trainer.init_state(pipe.sample_batch(cfg.batch_size))
    miou, oa = trainer.train_round(
        1, lambda e: pipe.batches(cfg.train_steps, cfg.batch_size)
    )
    import os

    assert os.path.exists(str(tmp_path / "snap" / "snap-1"))
