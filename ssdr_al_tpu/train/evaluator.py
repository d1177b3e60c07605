"""Vote-smoothed evaluation with possibility scheduling + full-res reprojection.

Parity port of Network.evaluate_test_s3dis (RandLANet.py:290-424):
  - per-cloud probability accumulators, vote smoothing 0.95·old + 0.05·new
  - possibility-driven block sampling until every point has been visited
    (min possibility > 0.5)
  - sub-cloud confusion rescaled by true class proportions, then probabilities
    reprojected to the full-resolution points via precomputed 1-NN projection
    indices (`val_proj`, created at prep time — data_prepare_s3dis.py:68-72)
  - OA + mIoU (DataProcessing.IoU_from_confusions) on the full clouds
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ssdr_al_tpu.config import Config
from ssdr_al_tpu.data.cloud import Cloud
from ssdr_al_tpu.data.dataset import PossibilityEvalPipeline
from ssdr_al_tpu.train.metrics import confusion_matrix, iou_from_confusion
from ssdr_al_tpu.train.trainer import shrink_eval_batch


@jax.jit
def _probs_f16(p):
    return p.astype(jnp.float16)


def simple_evaluate(eval_step, state, batches, num_classes,
                    ignored_label_inds=()):
    """Plain batched validation without vote smoothing (Network.evaluate,
    RandLANet.py:426-484): accumulate a confusion matrix over fixed batches,
    dropping ignored-label points (labels shifted down by 1 when dropped, as
    the reference does at RandLANet.py:446-449)."""
    conf = np.zeros((num_classes, num_classes), np.int64)
    correct = seen = 0
    pending = []
    for batch in batches:
        res = eval_step(state, batch)
        pending.append((batch, res[0], res[2] if len(res) == 3 else None))
    for batch, probs, order in pending:
        pred = np.asarray(probs).argmax(-1).ravel()
        labels = np.asarray(batch["labels"])
        if order is not None:
            # sorted outputs: row r is input row order[r] — permute labels
            labels = np.take_along_axis(labels, np.asarray(order), axis=1)
        labels = labels.ravel()
        if ignored_label_inds:
            keep = ~np.isin(labels, ignored_label_inds)
            pred = pred[keep]
            labels = labels[keep] - len(ignored_label_inds)
        correct += int((pred == labels).sum())
        seen += len(labels)
        conf += confusion_matrix(labels, pred, num_classes)
    tp = np.diag(conf)
    union = conf.sum(0) + conf.sum(1) - tp
    iou = tp / np.maximum(union, 1)
    return float(iou.mean()), correct / max(seen, 1)


class Evaluator:
    def __init__(self, cfg: Config, clouds: List[Cloud], *,
                 val_proj: Optional[List[np.ndarray]] = None,
                 val_labels: Optional[List[np.ndarray]] = None,
                 seed: int = 0, max_epochs: int = 100, mesh=None):
        self.cfg = cfg
        self.clouds = clouds
        if val_proj is None and all(c.proj_idx is not None for c in clouds):
            # projection artifacts loaded with the clouds (_proj.pkl)
            val_proj = [c.proj_idx for c in clouds]
            val_labels = [c.full_labels for c in clouds]
        self.val_proj = val_proj
        self.val_labels = val_labels
        self.seed = seed
        self.max_epochs = max_epochs
        self.mesh = mesh  # optional Mesh: shard the eval batch axis over chips

    def __call__(self, eval_step, state):
        """Returns (mIoU, OA). eval_step(state, batch) → (probs, penult)."""
        cfg = self.cfg
        pipe = PossibilityEvalPipeline(self.clouds, cfg, seed=self.seed)
        test_probs = [
            np.zeros((c.num_points, cfg.num_classes), np.float32)
            for c in self.clouds
        ]
        test_smooth = 0.95
        last_min = -0.5

        bs = cfg.val_batch_size
        if self.mesh is not None:
            # round the batch up to a mesh multiple: every row is a real
            # possibility-scheduled block (extra rows just advance coverage),
            # so no padding/masking is needed
            m = self.mesh.devices.size
            bs = -(-bs // m) * m

        for _ in range(self.max_epochs):
            # enqueue device work for the whole epoch, then fold results —
            # block sampling is possibility-driven on the host and does not
            # depend on the probabilities, so dispatches pipeline freely
            pending = []
            for _ in range(cfg.val_steps):
                batch = pipe.get_batch(bs)
                # quantized upload on bfloat16 configs (u16 xyz grid reused
                # as the feature-xyz, u8 colors): 36 → 9 B/point
                dev_batch = shrink_eval_batch(batch, cfg)
                if self.mesh is not None:
                    from ssdr_al_tpu.parallel.mesh import shard_batch

                    dev_batch = shard_batch(dev_batch, self.mesh)
                res = eval_step(state, dev_batch)
                # f16 transfer: probs are post-softmax ∈ [0,1] and the vote
                # accumulators stay float32 on the host; halving the
                # dominant device→host payload matters at ~35 MB/s tunnel
                # bandwidth
                pending.append(
                    (batch, _probs_f16(res[0]),
                     res[2] if len(res) == 3 else None))
                if pipe.global_min > last_min + 1:
                    break
            for batch, probs, order in pending:
                probs = np.asarray(probs)  # [B, N, C]
                order = None if order is None else np.asarray(order)
                for j in range(probs.shape[0]):
                    ci = int(batch["cloud_idx"][j])
                    p_idx = batch["point_idx"][j]
                    if order is not None:
                        # sorted outputs: row r is input row order[r]
                        p_idx = p_idx[order[j]]
                    test_probs[ci][p_idx] = (
                        test_smooth * test_probs[ci][p_idx]
                        + (1 - test_smooth) * probs[j]
                    )
            new_min = pipe.global_min
            if last_min + 1 < new_min:
                return self._finalize(test_probs)
        return self._finalize(test_probs)

    def _finalize(self, test_probs):
        cfg = self.cfg
        if self.val_proj is not None:
            # reproject to full resolution (RandLANet.py:375-419)
            confs = []
            correct, seen = 0, 0
            for ci, cloud in enumerate(self.clouds):
                proj = self.val_proj[ci]
                labels = self.val_labels[ci]
                preds = test_probs[ci][proj].argmax(axis=1)
                correct += int((preds == labels).sum())
                seen += len(labels)
                confs.append(confusion_matrix(labels, preds, cfg.num_classes))
            c = np.sum(confs, axis=0)
            oa = correct / max(seen, 1)
        else:
            # sub-cloud confusion only (synthetic / no-projection datasets),
            # rows rescaled to the true per-class point proportions as the
            # reference does for its sub-cloud vote (RandLANet.py:298-302,365)
            confs = []
            correct, seen = 0, 0
            proportions = np.zeros(cfg.num_classes, np.float64)
            for ci, cloud in enumerate(self.clouds):
                preds = test_probs[ci].argmax(axis=1)
                labels = cloud.labels
                correct += int((preds == labels).sum())
                seen += len(labels)
                confs.append(confusion_matrix(labels, preds, cfg.num_classes))
                proportions += np.bincount(
                    labels, minlength=cfg.num_classes
                ).astype(np.float64)
            c = np.sum(confs, axis=0).astype(np.float64)
            c *= (proportions / (c.sum(axis=1) + 1e-6))[:, None]
            oa = correct / max(seen, 1)
        ious = iou_from_confusion(np.asarray(c, np.float64))
        return float(np.mean(ious)), float(oa)
