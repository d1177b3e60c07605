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


def test_data_parallel_quantized_step_matches_single_device(rng):
    """shrink_train_batch's quantized keys (u16 grids + [B,1,3] lo/sc)
    shard over the mesh like any other leaf: dp loss == single-device loss
    on the SAME quantized batch."""
    from ssdr_al_tpu.models.randlanet import RandLANet
    from ssdr_al_tpu.train.trainer import (
        create_train_state,
        make_train_step,
        shrink_train_batch,
    )

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
    narrow = shrink_train_batch(batch, TINY, quantize=True)
    assert narrow["xyz"].dtype == np.uint16

    _, metrics_single = train_step(state, narrow, rng_key)

    mesh = make_mesh()
    state_repl = jax.device_put(state, replicated_sharding(mesh))
    batch_sharded = shard_batch(narrow, mesh)
    _, metrics_dp = train_step(state_repl, batch_sharded, rng_key)

    np.testing.assert_allclose(
        float(metrics_single["loss"]), float(metrics_dp["loss"]), rtol=1e-4
    )


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


def test_selection_inference_dp_matches_single_device(rng):
    """InferenceRunner over the 8-device mesh == single-device output
    (the AL selection round's forward pass, sharded chunk axis)."""
    from ssdr_al_tpu.active.samplers import InferenceRunner
    from ssdr_al_tpu.data.cloud import Cloud
    from ssdr_al_tpu.models.randlanet import RandLANet
    from ssdr_al_tpu.train.trainer import create_train_state, make_eval_step

    cfg = TINY
    model = RandLANet(cfg)
    n = 512 * 5  # 5 chunks: exercises the mesh-multiple group padding
    cloud = Cloud(
        name="c",
        xyz=(rng.rand(n, 3) * 6).astype(np.float32),
        colors=rng.rand(n, 3).astype(np.float32),
        labels=rng.randint(0, cfg.num_classes, n).astype(np.int32),
    )
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(0),
        {"xyz": rng.rand(1, cfg.num_points, 3).astype(np.float32),
         "features": rng.rand(1, cfg.num_points, 6).astype(np.float32)},
        steps_per_epoch=10,
    )
    eval_step = make_eval_step(model, cfg, "xla")

    single = InferenceRunner(cfg, [cloud], eval_step, state, "sb",
                             seed=7).run(cloud)
    mesh = make_mesh()
    state_repl = jax.device_put(state, replicated_sharding(mesh))
    dp = InferenceRunner(cfg, [cloud], eval_step, state_repl, "sb",
                         seed=7, mesh=mesh).run(cloud)

    np.testing.assert_array_equal(dp.prob_class, single.prob_class)
    np.testing.assert_allclose(dp.uncertainty, single.uncertainty, atol=1e-5)
    np.testing.assert_allclose(
        dp.penult.astype(np.float32), single.penult.astype(np.float32),
        atol=1e-2,
    )


def test_inference_runner_group_size_is_mesh_multiple(rng):
    """The adaptive chunk group size must shard evenly (VERDICT weak #5)."""
    from ssdr_al_tpu.active.samplers import InferenceRunner
    from ssdr_al_tpu.data.cloud import Cloud
    from ssdr_al_tpu.models.randlanet import RandLANet
    from ssdr_al_tpu.train.trainer import create_train_state, make_eval_step

    cfg = TINY
    model = RandLANet(cfg)
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(0),
        {"xyz": rng.rand(1, cfg.num_points, 3).astype(np.float32),
         "features": rng.rand(1, cfg.num_points, 6).astype(np.float32)},
        steps_per_epoch=10,
    )
    eval_step = make_eval_step(model, cfg, "xla")
    mesh = make_mesh()
    state_repl = jax.device_put(state, replicated_sharding(mesh))
    # awkward chunk counts: 1, 3, 5 chunks — all must run without divisibility
    # errors on an 8-device mesh
    for n_chunks in (1, 3, 5):
        n = 512 * n_chunks
        cloud = Cloud(
            name="c",
            xyz=(rng.rand(n, 3) * 6).astype(np.float32),
            colors=rng.rand(n, 3).astype(np.float32),
            labels=rng.randint(0, cfg.num_classes, n).astype(np.int32),
        )
        out = InferenceRunner(cfg, [cloud], eval_step, state_repl, "sb",
                              seed=1, mesh=mesh).run(cloud)
        assert out.prob_class.shape == (n,)
        assert np.isfinite(out.uncertainty).all()


def test_evaluator_dp_matches_single_device(rng):
    """Evaluator over the mesh == single-device (val_batch_size already a mesh
    multiple, so the possibility schedule is identical)."""
    from ssdr_al_tpu.data.cloud import Cloud
    from ssdr_al_tpu.models.randlanet import RandLANet
    from ssdr_al_tpu.train.evaluator import Evaluator
    from ssdr_al_tpu.train.trainer import create_train_state, make_eval_step

    cfg = dataclasses.replace(TINY, val_batch_size=8, val_steps=4)
    model = RandLANet(cfg)
    n = 1400
    cloud = Cloud(
        name="c",
        xyz=(rng.rand(n, 3) * 6).astype(np.float32),
        colors=rng.rand(n, 3).astype(np.float32),
        labels=rng.randint(0, cfg.num_classes, n).astype(np.int32),
    )
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(0),
        {"xyz": rng.rand(1, cfg.num_points, 3).astype(np.float32),
         "features": rng.rand(1, cfg.num_points, 6).astype(np.float32)},
        steps_per_epoch=10,
    )
    eval_step = make_eval_step(model, cfg, "xla")

    miou_s, oa_s = Evaluator(cfg, [cloud], seed=3, max_epochs=2)(
        eval_step, state
    )
    mesh = make_mesh()
    state_repl = jax.device_put(state, replicated_sharding(mesh))
    miou_dp, oa_dp = Evaluator(cfg, [cloud], seed=3, max_epochs=2,
                               mesh=mesh)(eval_step, state_repl)
    np.testing.assert_allclose(miou_dp, miou_s, atol=1e-5)
    np.testing.assert_allclose(oa_dp, oa_s, atol=1e-5)


# ---------------------------------------------------------------------------
# Distributed diversity phase (VERDICT r3 next #3): the FULL selection round
# — prediction, device-resident penult region means, sharded chamfer chunks,
# FPS-GCN, oracle — over the 8-device mesh must be byte-identical to the
# single-device round.
# ---------------------------------------------------------------------------


def _selection_workload(workdir, *, seed_div=10):
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    return bench._build_selection_workload(
        workdir, 3, 2048, fast_partition=True, target_sp=48,
        seed_div=seed_div)


def _selection_model(cfg):
    from ssdr_al_tpu.models.randlanet import RandLANet
    from ssdr_al_tpu.train.trainer import create_train_state, make_eval_step

    rng = np.random.RandomState(0)
    model = RandLANet(cfg)
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(0),
        {"xyz": (rng.rand(1, cfg.num_points, 3) * 6).astype(np.float32),
         "features": rng.rand(1, cfg.num_points, 6).astype(np.float32)},
        steps_per_epoch=10,
    )
    return make_eval_step(model, cfg, "xla", sorted_outputs=True), state


def _run_selection(workdir, mesh, budget=40):
    from ssdr_al_tpu.active.samplers import TSampler, TSamplerArgs
    from ssdr_al_tpu.active.state import RoundStats
    from ssdr_al_tpu.data.synthetic import NUM_SYNTH_CLASSES

    cfg = dataclasses.replace(
        TINY, num_points=512, num_classes=NUM_SYNTH_CLASSES)
    train, state, total = _selection_workload(workdir)
    eval_step, mstate = _selection_model(cfg)
    if mesh is not None:
        mstate = jax.device_put(mstate, replicated_sharding(mesh))
    sampler = TSampler(
        state, train, cfg,
        TSamplerArgs(diversity="gcn_fps", oracle_mode="NAIL",
                     class_balance="clsbal"),
        total["sp_num"], seed=11, mesh=mesh,
    )
    stats = RoundStats()
    sampler.sampling(eval_step, mstate, budget, 1, stats)
    # collect every selection artifact: registry + per-cloud pseudo-gt
    import pickle

    round_dir = state.round_dir(2)
    with open(f"{round_dir}/total.pkl", "rb") as f:
        registry = pickle.load(f)
    gts = {c.name: state.load_pseudo_gt(round_dir, c.name) for c in train}
    return stats, registry, gts


def test_full_selection_round_dp_matches_single_device(tmp_path):
    """TSampler gcn_fps round over the mesh == single device, byte-identical
    artifacts (distributed diversity: sharded chamfer chunks + mesh-
    compatible device-resident region feature means)."""
    stats_s, reg_s, gts_s = _run_selection(str(tmp_path / "single"), None)
    mesh = make_mesh()
    stats_d, reg_d, gts_d = _run_selection(str(tmp_path / "dp"), mesh)

    assert stats_s.extra == stats_d.extra
    assert sorted(reg_s["unlabeled"].keys()) == sorted(reg_d["unlabeled"].keys())
    for k in reg_s["unlabeled"]:
        np.testing.assert_array_equal(
            np.sort(np.asarray(list(reg_s["unlabeled"][k]))),
            np.sort(np.asarray(list(reg_d["unlabeled"][k]))))
    assert reg_s["selected_class_list"] == reg_d["selected_class_list"]
    for name in gts_s:
        np.testing.assert_array_equal(gts_s[name], gts_d[name])


def test_chamfer_blocks_gathered_dp_matches_single(rng):
    """Sharded gathered chamfer == single-device over the same slab."""
    from ssdr_al_tpu.ops.chamfer import (
        chamfer_pairwise_blocks_gathered,
        chamfer_pairwise_blocks_gathered_dp,
    )

    r, p, c, s = 40, 16, 8, 6
    pts = rng.randn(r, p, 3).astype(np.float32)
    msk = rng.rand(r, p) > 0.2
    msk[:, 0] = True
    pts[-1] = 0.0
    msk[-1] = False  # trash row
    idx = rng.randint(0, r - 1, (c, s)).astype(np.int32)
    idx[0, -2:] = r - 1  # padding slots
    single = np.asarray(
        chamfer_pairwise_blocks_gathered(jnp.asarray(pts), jnp.asarray(msk),
                                         jnp.asarray(idx), 4))
    mesh = make_mesh()
    dp = np.asarray(
        chamfer_pairwise_blocks_gathered_dp(
            jnp.asarray(pts), jnp.asarray(msk), jnp.asarray(idx), mesh, 4))
    np.testing.assert_allclose(dp, single, rtol=1e-6, atol=1e-6)


def test_pooled_train_step_dp_matches_single_device(rng):
    """Device-pool extraction + train step over the mesh == single device
    (slab replicated, ids/picks sharded — the dp real-loop training path)."""
    from ssdr_al_tpu.data.cloud import Cloud
    from ssdr_al_tpu.models.randlanet import RandLANet
    from ssdr_al_tpu.train.device_pool import DeviceTrainPool
    from ssdr_al_tpu.train.trainer import (
        create_train_state,
        make_pooled_train_step,
    )

    cfg = TINY
    clouds = [
        Cloud(name=f"c{i}",
              xyz=(rng.rand(900, 3) * 6).astype(np.float32),
              colors=rng.rand(900, 3).astype(np.float32),
              labels=rng.randint(0, cfg.num_classes, 900).astype(np.int32))
        for i in range(3)
    ]
    pool = DeviceTrainPool(clouds, cfg, seed=0)
    assert pool.available
    model = RandLANet(cfg)
    ids, picks = pool.sample_indices(8)
    from ssdr_al_tpu.train.device_pool import extract_blocks

    xyz_s, feats_s, *_ = extract_blocks(
        *pool.device_args(), jnp.asarray(ids), jnp.asarray(picks),
        jax.random.PRNGKey(0), cfg.num_points, pool.window)
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(0),
        {"xyz": np.asarray(xyz_s), "features": np.asarray(feats_s)},
        steps_per_epoch=10)
    step = make_pooled_train_step(model, cfg, np.ones(cfg.num_classes,
                                                      np.float32), "xla",
                                  window=pool.window)
    key = jax.random.PRNGKey(1)
    args = pool.device_args()
    _, m_single = step(state, args, jnp.asarray(ids), jnp.asarray(picks), key)

    mesh = make_mesh()
    state_r = jax.device_put(state, replicated_sharding(mesh))
    args_r = jax.device_put(args, replicated_sharding(mesh))
    sh = batch_sharding(mesh)
    _, m_dp = step(state_r, args_r, jax.device_put(ids, sh),
                   jax.device_put(picks, sh), key)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_single["loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(float(m_dp["accuracy"]),
                               float(m_single["accuracy"]), atol=1e-6)
