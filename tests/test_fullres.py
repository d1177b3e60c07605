"""Full-resolution reprojection: _proj.pkl loading, Evaluator wiring, and the
evaluate-CLI export path.

The reference computes its headline OA/mIoU on the FULL-resolution points by
reprojecting sub-cloud votes through the prep-time 1-NN projection
(RandLANet.py:375-419, data_prepare_s3dis.py:68-72). These tests construct
cases where sub- and full-resolution metrics provably differ and assert the
reported numbers come from the reprojected confusion.
"""

import dataclasses
import os

import numpy as np

from ssdr_al_tpu.config import get_config
from ssdr_al_tpu.data.cloud import Cloud, load_clouds
from ssdr_al_tpu.data.prepare import write_cloud_artifacts
from ssdr_al_tpu.train.evaluator import Evaluator


def _proj_cloud(rng, n_sub=12, fanout=4, num_classes=3):
    """Sub cloud + projection where 25% of full labels disagree with the sub
    label they project to."""
    xyz = rng.rand(n_sub, 3).astype(np.float32)
    colors = rng.rand(n_sub, 3).astype(np.float32)
    labels = rng.randint(0, num_classes, n_sub).astype(np.int32)
    proj = np.repeat(np.arange(n_sub), fanout)
    full_labels = labels[proj].copy()
    flip = np.arange(0, len(full_labels), 4)  # every 4th full point disagrees
    full_labels[flip] = (full_labels[flip] + 1) % num_classes
    return Cloud(name="c", xyz=xyz, colors=colors, labels=labels,
                 proj_idx=proj, full_labels=full_labels)


class TestProjLoading:
    def test_load_clouds_picks_up_proj(self, rng, tmp_path):
        xyz = (rng.rand(1500, 3) * 4).astype(np.float32)
        colors = (rng.rand(1500, 3) * 255).astype(np.uint8)
        labels = rng.randint(0, 4, 1500).astype(np.uint8)
        write_cloud_artifacts(str(tmp_path), "roomA", xyz, colors, labels, 0.3)
        clouds = load_clouds(str(tmp_path / "input_0.300"))
        assert len(clouds) == 1
        c = clouds[0]
        assert c.proj_idx is not None and len(c.proj_idx) == 1500
        assert c.proj_idx.max() < c.num_points
        np.testing.assert_array_equal(c.full_labels, labels)

    def test_load_without_proj(self, rng, tmp_path):
        from ssdr_al_tpu.data.ply import write_ply

        write_ply(str(tmp_path / "a.ply"),
                  [rng.rand(50, 3).astype(np.float32),
                   rng.rand(50, 3).astype(np.float32),
                   rng.randint(0, 3, 50).astype(np.int32)],
                  ["x", "y", "z", "red", "green", "blue", "class"])
        c = load_clouds(str(tmp_path))[0]
        assert c.proj_idx is None and c.full_labels is None


class TestEvaluatorReprojection:
    def test_finalize_reports_fullres_metrics(self, rng):
        cfg = dataclasses.replace(get_config("S3DIS"), num_classes=3)
        cloud = _proj_cloud(rng, num_classes=3)
        # votes perfectly predict the SUB labels → sub OA would be 1.0,
        # full-res OA must be 0.75 (every 4th full label flipped)
        probs = np.eye(3, dtype=np.float32)[cloud.labels]

        ev = Evaluator(cfg, [cloud])  # proj auto-picked from the cloud
        assert ev.val_proj is not None
        miou, oa = ev._finalize([probs])
        np.testing.assert_allclose(oa, 0.75, atol=1e-6)
        assert miou < 1.0

        # strip the projection → sub-resolution metrics (OA 1.0)
        bare = dataclasses.replace(cloud, proj_idx=None, full_labels=None)
        ev2 = Evaluator(cfg, [bare])
        assert ev2.val_proj is None
        miou2, oa2 = ev2._finalize([probs])
        np.testing.assert_allclose(oa2, 1.0, atol=1e-6)
        np.testing.assert_allclose(miou2, 1.0, atol=1e-6)

    def test_noproj_rescale_is_identity_on_full_coverage(self, rng):
        """With every sub point voted exactly once, the val_proportions row
        rescale (RandLANet.py:365) must not change the confusion."""
        cfg = dataclasses.replace(get_config("S3DIS"), num_classes=4)
        n = 200
        cloud = Cloud(name="c", xyz=rng.rand(n, 3).astype(np.float32),
                      colors=rng.rand(n, 3).astype(np.float32),
                      labels=rng.randint(0, 4, n).astype(np.int32))
        probs = rng.rand(n, 4).astype(np.float32)
        ev = Evaluator(cfg, [cloud])
        miou, oa = ev._finalize([probs])
        # direct unrescaled computation
        from ssdr_al_tpu.train.metrics import (
            confusion_matrix,
            iou_from_confusion,
        )

        preds = probs.argmax(1)
        c = confusion_matrix(cloud.labels, preds, 4).astype(np.float64)
        np.testing.assert_allclose(miou, np.mean(iou_from_confusion(c)),
                                   atol=1e-6)
        np.testing.assert_allclose(oa, (preds == cloud.labels).mean(),
                                   atol=1e-6)

    def test_make_evaluator_picks_up_proj(self, rng, tmp_path):
        from ssdr_al_tpu.cli.common import make_evaluator

        cloud = _proj_cloud(rng)

        class _Exp:
            cfg = dataclasses.replace(get_config("S3DIS"), num_classes=3)
            val_clouds = [cloud]

        ev = make_evaluator(_Exp())
        assert ev.val_proj is not None and ev.mesh is None


class TestEvaluateCliReprojection:
    def test_labels_export_uses_projection(self, rng, tmp_path):
        """export_semantic3d_labels with real proj indices: full-res length,
        values follow the projected argmax."""
        from ssdr_al_tpu.utils.visualize import export_semantic3d_labels

        cloud = _proj_cloud(rng, n_sub=10, fanout=3)
        probs = rng.rand(10, 3).astype(np.float32)
        path = str(tmp_path / "c.labels")
        preds = export_semantic3d_labels(path, probs, cloud.proj_idx,
                                         label_values=np.arange(1, 4))
        assert len(preds) == 30  # full resolution, not sub
        np.testing.assert_array_equal(
            preds, probs[cloud.proj_idx].argmax(1) + 1
        )
