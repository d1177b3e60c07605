"""RandLA-Net model tests: shapes, pyramid semantics, loss parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssdr_al_tpu.config import ConfigS3DIS
from ssdr_al_tpu.models import (
    RandLANet,
    build_pyramid,
    label_reduce_table,
    masked_weighted_ce,
)

TINY = dataclasses.replace(
    ConfigS3DIS, num_points=512, d_out=(4, 8, 16, 16, 16)
)


@pytest.fixture(scope="module")
def tiny_setup():
    rng = np.random.RandomState(0)
    xyz = rng.randn(2, 512, 3).astype(np.float32)
    feats = rng.randn(2, 512, 6).astype(np.float32)
    model = RandLANet(TINY)
    pyramid = build_pyramid(jnp.asarray(xyz), TINY)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(feats), pyramid, False
    )
    return model, variables, xyz, feats, pyramid


class TestPyramid:
    def test_layer_shapes(self, tiny_setup):
        _, _, xyz, _, pyr = tiny_setup
        n = 512
        for i, r in enumerate(TINY.sub_sampling_ratio):
            assert pyr.xyz[i].shape == (2, n, 3)
            assert pyr.neigh_idx[i].shape == (2, n, TINY.k_n)
            assert pyr.sub_idx[i].shape == (2, n // r, TINY.k_n)
            assert pyr.interp_idx[i].shape == (2, n, 1)
            assert int(pyr.interp_idx[i].max()) < n // r
            n //= r

    def test_prefix_subsample_matches_reference(self, tiny_setup):
        # sub_points = batch_xyz[:, :N//r] (s3dis_dataset.py:166)
        _, _, xyz, _, pyr = tiny_setup
        np.testing.assert_array_equal(
            np.asarray(pyr.xyz[1]), xyz[:, : 512 // 4, :]
        )


class TestForward:
    def test_output_shapes(self, tiny_setup):
        model, variables, _, feats, pyr = tiny_setup
        logits, penult = model.apply(variables, jnp.asarray(feats), pyr, False)
        assert logits.shape == (2, 512, TINY.num_classes)
        assert penult.shape == (2, 512, 32)
        assert np.isfinite(np.asarray(logits)).all()

    def test_train_mode_mutates_bn(self, tiny_setup):
        model, variables, _, feats, pyr = tiny_setup
        (logits, _), new_state = model.apply(
            variables, jnp.asarray(feats), pyr, True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        assert "batch_stats" in new_state
        old = jax.tree_util.tree_leaves(variables["batch_stats"])
        new = jax.tree_util.tree_leaves(new_state["batch_stats"])
        assert any(
            not np.allclose(a, b) for a, b in zip(old, new)
        ), "batch stats should update in train mode"

    def test_param_count_scales_with_d_out(self):
        model = RandLANet(TINY)
        xyz = jnp.zeros((1, 512, 3))
        feats = jnp.zeros((1, 512, 6))
        pyr = build_pyramid(xyz, TINY)
        variables = model.init({"params": jax.random.PRNGKey(0)}, feats, pyr, False)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
        assert n_params > 1000


class TestLoss:
    def test_masked_ce_matches_numpy(self, rng):
        b, n, c = 2, 50, 5
        logits = rng.randn(b, n, c).astype(np.float32)
        pseudo = rng.randint(0, c, (b, n))
        labels = rng.randint(0, c, (b, n))
        act = rng.randint(0, 2, (b, n)).astype(np.float32)
        w = rng.rand(c).astype(np.float32) + 0.5

        loss, acc = masked_weighted_ce(
            jnp.asarray(logits), jnp.asarray(pseudo), jnp.asarray(act),
            jnp.asarray(labels), w,
        )

        # numpy oracle of RandLANet.py:486-503
        lg = logits.reshape(-1, c).astype(np.float64)
        p = np.exp(lg - lg.max(1, keepdims=True))
        p /= p.sum(1, keepdims=True)
        ce = -np.log(p[np.arange(b * n), pseudo.ravel()])
        weighted = ce * w[pseudo.ravel()] * act.ravel()
        np.testing.assert_allclose(float(loss), weighted.mean(), rtol=1e-5)

        pred = lg.argmax(1)
        np.testing.assert_allclose(
            float(acc), (pred == labels.ravel()).mean(), rtol=1e-6
        )

    def test_ignored_labels_excluded(self, rng):
        b, n, c = 1, 40, 4
        logits = rng.randn(b, n, c).astype(np.float32)
        labels = rng.randint(0, c, (b, n))
        pseudo = labels.copy()
        act = np.ones((b, n), np.float32)
        w = np.ones(c, np.float32)
        table = label_reduce_table(c, (0,))

        loss_all, _ = masked_weighted_ce(
            jnp.asarray(logits), jnp.asarray(pseudo), jnp.asarray(act),
            jnp.asarray(labels), w,
        )
        loss_ign, _ = masked_weighted_ce(
            jnp.asarray(logits), jnp.asarray(pseudo), jnp.asarray(act),
            jnp.asarray(labels), w, ignored_label_inds=(0,), reduce_table=table,
        )
        assert not np.isclose(float(loss_all), float(loss_ign))

    def test_reduce_table(self):
        table = label_reduce_table(8, (0,))
        np.testing.assert_array_equal(table, [0, 0, 1, 2, 3, 4, 5, 6, 7])

    def test_zero_activation_zero_loss(self, rng):
        logits = rng.randn(1, 20, 3).astype(np.float32)
        labels = rng.randint(0, 3, (1, 20))
        act = np.zeros((1, 20), np.float32)
        loss, _ = masked_weighted_ce(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(act),
            jnp.asarray(labels), np.ones(3, np.float32),
        )
        assert float(loss) == 0.0


class TestGradients:
    def test_loss_differentiable(self, tiny_setup):
        model, variables, _, feats, pyr = tiny_setup
        labels = jnp.zeros((2, 512), jnp.int32)
        act = jnp.ones((2, 512), jnp.float32)
        w = np.ones(TINY.num_classes, np.float32)

        def loss_fn(params):
            logits, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                jnp.asarray(feats), pyr, False,
            )
            loss, _ = masked_weighted_ce(logits, labels, act, labels, w)
            return loss

        grads = jax.grad(loss_fn)(variables["params"])
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        assert any(np.abs(np.asarray(g)).max() > 0 for g in flat)


class TestOtherConfigs:
    def test_semantickitti_4_layer_model(self, rng):
        """The 4-layer SemanticKITTI config must flow through the same model
        (the reference declares it but never wires it; here it is first-class)."""
        import dataclasses as dc

        from ssdr_al_tpu.config import ConfigSemanticKITTI

        cfg = dc.replace(ConfigSemanticKITTI, num_points=512,
                         d_out=(4, 8, 8, 8))
        model = RandLANet(cfg)
        xyz = jnp.asarray(rng.rand(1, 512, 3).astype(np.float32))
        feats = jnp.asarray(rng.rand(1, 512, 6).astype(np.float32))
        pyr = build_pyramid(xyz, cfg, engine="xla")
        assert len(pyr.xyz) == 4
        v = model.init({"params": jax.random.PRNGKey(0)}, feats, pyr, False)
        logits, penult = model.apply(v, feats, pyr, False)
        assert logits.shape == (1, 512, cfg.num_classes)

    def test_semantic3d_ignored_label_loss(self, rng):
        import dataclasses as dc

        from ssdr_al_tpu.config import ConfigSemantic3D

        cfg = dc.replace(ConfigSemantic3D, num_points=256)
        table = label_reduce_table(cfg.num_classes, cfg.ignored_label_inds)
        logits = jnp.asarray(rng.randn(1, 256, cfg.num_classes).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, cfg.num_classes + 1, (1, 256)))
        act = jnp.ones((1, 256), jnp.float32)
        w = np.ones(cfg.num_classes, np.float32)
        loss, acc = masked_weighted_ce(
            logits, labels, act, labels, w,
            ignored_label_inds=cfg.ignored_label_inds, reduce_table=table,
        )
        assert np.isfinite(float(loss))
