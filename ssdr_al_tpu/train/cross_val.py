"""Offline 6-fold cross-validation scoring for S3DIS.

Parity with utils/6_fold_cv.py: recompute OA / per-class IoU / mIoU from saved
prediction PLYs (one per room, fields 'pred' and 'class')."""

from __future__ import annotations

import glob
from os.path import join
import numpy as np

from ssdr_al_tpu.data.ply import read_ply
from ssdr_al_tpu.train.metrics import confusion_matrix, iou_from_confusion


def score_prediction_plys(pred_dir: str, num_classes: int = 13):
    """pred_dir: directory of <room>.ply files with 'pred' and 'class' fields.

    Returns dict(oa=…, miou=…, iou=[per-class])."""
    files = sorted(glob.glob(join(pred_dir, "*.ply")))
    if not files:
        raise FileNotFoundError(f"no prediction PLYs under {pred_dir}")
    conf = np.zeros((num_classes, num_classes), np.int64)
    correct = seen = 0
    for path in files:
        data = read_ply(path)
        pred = np.asarray(data["pred"]).astype(np.int64)
        gt = np.asarray(data["class"]).astype(np.int64)
        conf += confusion_matrix(gt, pred, num_classes)
        correct += int((pred == gt).sum())
        seen += len(gt)
    iou = iou_from_confusion(conf.astype(np.float64))
    return {
        "oa": correct / max(seen, 1),
        "miou": float(np.mean(iou)),
        "iou": [float(x) for x in iou],
    }


def six_fold_cv(base_dir: str, num_classes: int = 13, log=print):
    """Aggregate over Area_1..Area_6 prediction dirs (6-fold protocol)."""
    conf = np.zeros((num_classes, num_classes), np.int64)
    correct = seen = 0
    for area in range(1, 7):
        for path in sorted(glob.glob(join(base_dir, f"Area_{area}", "*.ply"))):
            data = read_ply(path)
            pred = np.asarray(data["pred"]).astype(np.int64)
            gt = np.asarray(data["class"]).astype(np.int64)
            conf += confusion_matrix(gt, pred, num_classes)
            correct += int((pred == gt).sum())
            seen += len(gt)
    iou = iou_from_confusion(conf.astype(np.float64))
    result = {
        "oa": correct / max(seen, 1),
        "miou": float(np.mean(iou)),
        "iou": [float(x) for x in iou],
    }
    log(f"6-fold: OA={result['oa']:.4f} mIoU={result['miou']:.4f}")
    return result
