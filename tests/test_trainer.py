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


def test_quantized_batch_roundtrip_and_step(rng):
    """shrink_train_batch(quantize=True) dequantizes to within the u16/u8
    grid on device, and a train_step on the quantized batch matches the
    full-width step's loss/accuracy to quantization tolerance."""
    import jax.numpy as jnp

    from ssdr_al_tpu.train.trainer import shrink_train_batch, widen_train_batch

    model = RandLANet(TINY)
    weights = np.ones(3, np.float32)
    batch = make_batch(rng)
    narrow = shrink_train_batch(batch, TINY, quantize=True)
    assert narrow["xyz"].dtype == np.uint16
    assert narrow["colors"].dtype == np.uint8
    assert "features" not in narrow
    # per-point payload: u16 xyz (6) + u16 feat_xyz (6) + u8 colors (3)
    # + 3×u8 labels/pseudo/activation — = 18 B/pt vs 48 full-width
    xyz, feats = widen_train_batch(
        {k: jnp.asarray(v) for k, v in narrow.items()})
    span = batch["xyz"].max((0, 1)) - batch["xyz"].min((0, 1))
    np.testing.assert_allclose(
        np.asarray(xyz), batch["xyz"], atol=float(span.max()) / 65535 + 1e-7)
    np.testing.assert_allclose(
        np.asarray(feats)[..., 3:], batch["features"][..., 3:],
        atol=1.0 / 255 + 1e-7)

    state = create_train_state(
        model, TINY, jax.random.PRNGKey(0),
        {"xyz": batch["xyz"], "features": batch["features"]},
        steps_per_epoch=100,
    )
    step = make_train_step(model, TINY, weights, knn_engine="xla")
    key = jax.random.PRNGKey(1)
    _, m_full = step(state, batch, key)
    _, m_q = step(state, narrow, key)
    np.testing.assert_allclose(
        float(m_q["loss"]), float(m_full["loss"]), rtol=2e-2)
    np.testing.assert_allclose(
        float(m_q["accuracy"]), float(m_full["accuracy"]), atol=0.05)


def test_shrink_eval_batch_quantized_inference(rng):
    """shrink_eval_batch on a bfloat16 config: features vanish (the u16 xyz
    grid doubles as feature-xyz), and eval_step on the quantized batch
    matches the full-width batch's probs to quantization tolerance.
    float32 configs pass through untouched (CPU oracles see exact inputs)."""
    import dataclasses as dc

    import jax.numpy as jnp

    from ssdr_al_tpu.train.trainer import make_eval_step, shrink_eval_batch

    batch = make_batch(rng)
    eval_in = {"xyz": batch["xyz"],
               "features": np.concatenate(
                   [batch["xyz"], batch["features"][..., 3:]], -1)}
    assert shrink_eval_batch(eval_in, TINY) is eval_in  # f32: no-op

    bf16 = dc.replace(TINY, compute_dtype="bfloat16")
    narrow = shrink_eval_batch(eval_in, bf16)
    assert narrow["xyz"].dtype == np.uint16
    assert "features" not in narrow and "feat_xyz" not in narrow

    model = RandLANet(bf16)
    state = create_train_state(
        model, bf16, jax.random.PRNGKey(0),
        {"xyz": eval_in["xyz"], "features": eval_in["features"]},
        steps_per_epoch=10,
    )
    step = make_eval_step(model, bf16, knn_engine="xla")
    probs_full, _ = step(state, eval_in)
    probs_q, _ = step(state, {k: jnp.asarray(v) for k, v in narrow.items()})
    agree = (np.asarray(probs_full).argmax(-1)
             == np.asarray(probs_q).argmax(-1)).mean()
    assert agree > 0.99, agree


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
