"""Experiment configuration.

Replaces the reference's static config classes (SSDR_AL_s3dis/helper_tool.py:18-117)
with frozen dataclasses. Numeric values (k_n, num_points, d_out, sub_sampling_ratio,
lr schedule, budgets) are behavior-compatible with the reference so that
mIoU-per-labeling-budget curves are comparable.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class Config:
    """Shared schema for all datasets."""

    name: str = "S3DIS"
    # --- model / neighborhood ---
    k_n: int = 16                      # KNN neighborhood size
    num_layers: int = 5                # encoder depth
    num_points: int = 40960            # points per training block
    num_classes: int = 13
    sub_grid_size: float = 0.04        # preprocessing voxel size
    sub_sampling_ratio: Tuple[int, ...] = (4, 4, 4, 4, 2)
    d_out: Tuple[int, ...] = (16, 64, 128, 256, 512)
    ignored_label_inds: Tuple[int, ...] = ()

    # --- training ---
    batch_size: int = 6
    val_batch_size: int = 20
    train_steps: int = 500             # steps per epoch
    val_steps: int = 100
    max_epoch: int = 30
    learning_rate: float = 1e-2
    lr_decay: float = 0.84             # per-epoch multiplicative decay
    noise_init: float = 3.5            # center-pick noise scale (σ = noise_init/10)
    eval_start_frac: float = 0.4       # evaluate after this fraction of epochs

    # --- numerics ---
    compute_dtype: str = "float32"     # activations dtype inside the network
    # Morton search window for big (>16384-pt) pyramid layers, BEFORE the
    # gather-tile merge derate (models/randlanet.py). Mid layers use half.
    # Speed/recall knob: the search+gather cost of the two big layers scales
    # ~linearly with it. Default 2048 (model window 1792): engine recall at
    # the production shapes is 0.90 uniform / 0.956 scene (40960) and
    # 0.895/0.961 (65536), and the MODEL is insensitive — per-dataset
    # trained-model evidence (scripts/bench_window_quality.py, sw=2048 vs
    # sw=4096, same seed):
    #   S3DIS      (40960-pt blocks): agreement vs exact-KNN pyramid 0.996;
    #              600-step training matches-or-beats sw=4096; forward 19%
    #              faster (78.3 -> 65.7 ms at B=6 bf16).
    #   Semantic3D (65536-pt blocks): agreement 0.9967 (sw=4096: 0.9963);
    #              180-step mIoU 0.228 vs 0.224 — 2048 matches-or-beats
    #              (bench_window_quality.py --dataset Semantic3D, r4).
    # sw=4096 recovers the old 0.93-recall configuration; 3072 is
    # K-misaligned and SLOWER than either. Must be a multiple of 512.
    search_window: int = 2048
    # Space-filling curve the window engine sorts along: "morton" (z-order)
    # or "hilbert". Measured A/B (scripts/bench_curve.py): hilbert is
    # slightly WORSE on clustered scene data at equal cost — morton stays
    # the default; the knob exists for A/B runs on new data distributions.
    curve: str = "morton"

    # --- AL loop ---
    sp_batch_size: int = 10000         # superpoint clicks per round
    al_rounds: Tuple[int, int] = (2, 33)

    @property
    def num_sub_points(self) -> Tuple[int, ...]:
        out = []
        n = self.num_points
        for r in self.sub_sampling_ratio:
            n = n // r
            out.append(n)
        return tuple(out)


# Reference: SSDR_AL_s3dis/helper_tool.py:46-75
ConfigS3DIS = Config(
    name="S3DIS",
    k_n=16,
    num_layers=5,
    num_points=40960,
    num_classes=13,
    sub_grid_size=0.04,
    sub_sampling_ratio=(4, 4, 4, 4, 2),
    d_out=(16, 64, 128, 256, 512),
    ignored_label_inds=(),
    batch_size=6,
    val_batch_size=20,
    train_steps=500,
    val_steps=100,
    max_epoch=30,
    learning_rate=1e-2,
    lr_decay=0.84,
    eval_start_frac=0.4,
    sp_batch_size=10000,
)

# Reference: SSDR_AL_s3dis/helper_tool.py:77-117
ConfigSemantic3D = Config(
    name="Semantic3D",
    k_n=16,
    num_layers=5,
    num_points=65536,
    num_classes=8,
    sub_grid_size=0.06,
    sub_sampling_ratio=(4, 4, 4, 4, 2),
    d_out=(16, 64, 128, 256, 512),
    ignored_label_inds=(0,),
    batch_size=4,
    val_batch_size=16,
    train_steps=500,
    val_steps=100,
    max_epoch=50,
    learning_rate=1e-2,
    lr_decay=0.9,
    eval_start_frac=0.6,
    sp_batch_size=3000,
)

# Reference: SSDR_AL_s3dis/helper_tool.py:18-44
ConfigSemanticKITTI = Config(
    name="SemanticKITTI",
    k_n=16,
    num_layers=4,
    num_points=4096 * 11,
    num_classes=19,
    sub_grid_size=0.06,
    sub_sampling_ratio=(4, 4, 4, 4),
    d_out=(16, 64, 128, 256),
    ignored_label_inds=(0,),
    batch_size=6,
    val_batch_size=20,
    train_steps=500,
    val_steps=100,
    max_epoch=100,
    learning_rate=1e-2,
    lr_decay=0.95,
    eval_start_frac=0.4,
    sp_batch_size=10000,
)

_CONFIGS = {
    "S3DIS": ConfigS3DIS,
    "Semantic3D": ConfigSemantic3D,
    "semantic3d": ConfigSemantic3D,
    "SemanticKITTI": ConfigSemanticKITTI,
}


def get_config(name: str) -> Config:
    try:
        return _CONFIGS[name]
    except KeyError:
        raise KeyError(f"unknown dataset {name!r}; options: {sorted(set(_CONFIGS))}")


# Per-class point counts used for inverse-frequency CE weights.
# Reference: SSDR_AL_s3dis/helper_tool.py:264-284 (DataProcessing.get_class_weights).
CLASS_COUNTS = {
    "S3DIS": (
        3370714, 2856755, 4919229, 318158, 375640, 478001, 974733,
        650464, 791496, 88727, 1284130, 229758, 2272837,
    ),
    "Semantic3D": (
        5181602, 5012952, 6830086, 1311528, 10476365, 946982, 334860, 269353,
    ),
    "SemanticKITTI": (
        55437630, 320797, 541736, 2578735, 3274484, 552662, 184064, 78858,
        240942562, 17294618, 170599734, 6369672, 230413074, 101130274,
        476491114, 9833174, 129609852, 4506626, 1168181,
    ),
}


def class_weights(name: str):
    """ce_label_weight = 1 / (class_frequency + 0.02); helper_tool.py:282-284."""
    import numpy as np

    counts = np.asarray(CLASS_COUNTS[name], dtype=np.float64)
    freq = counts / counts.sum()
    return (1.0 / (freq + 0.02)).astype(np.float32)


# S3DIS label names; reference s3dis_dataset.py:32-44.
S3DIS_LABELS = (
    "ceiling", "floor", "wall", "beam", "column", "window", "door",
    "table", "chair", "sofa", "bookcase", "board", "clutter",
)
