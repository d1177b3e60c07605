"""Visualization exporters: colored PLYs for predictions / GT / superpoints.

Replaces the reference's open3d-based `Plot` (helper_tool.py:287-353) and the
SPG `partition/visualize.py` exporter with dependency-free colored-PLY
writers (viewable in any point-cloud tool).
"""

from __future__ import annotations

import colorsys
import random

import numpy as np

from ssdr_al_tpu.data.ply import write_ply


def random_colors(n, bright=True, seed=0):
    """HSV-spread random palette (helper_tool.py:289-295)."""
    brightness = 1.0 if bright else 0.7
    hsv = [(0.15 + i / float(n), 1, brightness) for i in range(n)]
    colors = [colorsys.hsv_to_rgb(*c) for c in hsv]
    random.Random(seed).shuffle(colors)
    return np.asarray(colors, np.float32)


def write_label_ply(path, xyz, labels, num_classes=None, palette=None):
    """Points colored by label id."""
    labels = np.asarray(labels).astype(np.int64)
    num_classes = num_classes or int(labels.max()) + 1
    if palette is None:
        palette = random_colors(num_classes)
    rgb = (palette[labels % len(palette)] * 255).astype(np.uint8)
    write_ply(path, [np.asarray(xyz, np.float32), rgb, labels.astype(np.int32)],
              ["x", "y", "z", "red", "green", "blue", "class"])


def write_superpoint_ply(path, xyz, in_component, seed=0):
    """Points colored by superpoint id (partition/visualize.py role)."""
    in_component = np.asarray(in_component).astype(np.int64)
    n_sp = int(in_component.max()) + 1
    palette = random_colors(min(n_sp, 1024), seed=seed)
    rgb = (palette[in_component % len(palette)] * 255).astype(np.uint8)
    write_ply(path, [np.asarray(xyz, np.float32), rgb,
                     in_component.astype(np.int32)],
              ["x", "y", "z", "red", "green", "blue", "superpoint"])


def write_prediction_ply(path, xyz, pred, gt):
    """Prediction + GT in one PLY (input to train.cross_val scoring)."""
    write_ply(path, [np.asarray(xyz, np.float32),
                     np.asarray(pred, np.int32), np.asarray(gt, np.int32)],
              ["x", "y", "z", "pred", "class"])


def export_semantic3d_labels(path, sub_probs, proj_idx, label_values=None):
    """Upsample sub-cloud probabilities to the full cloud and write the ascii
    .labels submission file (reference partition/write_Semantic3d.py:1-68).

    label_values maps class index → submission label id (Semantic3D's ids are
    1..8 when class 0 'unlabeled' was dropped at prep)."""
    preds = np.argmax(np.asarray(sub_probs)[np.asarray(proj_idx)], axis=1)
    if label_values is not None:
        preds = np.asarray(label_values)[preds]
    np.savetxt(path, preds.astype(np.int32), fmt="%d")
    return preds
