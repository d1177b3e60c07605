"""SSDR-AL/TPU — a TPU-native framework for active learning on point-cloud
semantic segmentation via spatial-structural diversity reasoning.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
SSDR-AL codebase (shaofeifei11/SSDR-AL): RandLA-Net segmentation, superpoint
partitioning, uncertainty scoring, diversity reasoning (FPS-GCN / trainable
coreGCN / kCenterGreedy), simulated-oracle labeling (dominant / NAIL), and the
closed-loop active-learning driver — with every hot compute path running
on-device as a single compiled program instead of the reference's
TF1 + PyTorch + numpy + C++/CUDA mix.

Layer map (mirrors SURVEY.md §1):
  ops/        device kernels: KNN, grid subsample, chamfer, geof, FPS, k-center
  models/     RandLA-Net (flax) with in-graph neighborhood computation
  data/       PLY IO, dataset prep, padded block pipeline, AL state store
  partition/  superpoint pipeline (geof graphs + native C++ cut-pursuit)
  active/     uncertainty, oracle, samplers, FPS-GCN, coreGCN
  train/      trainer, vote-smoothed evaluator, metrics, checkpointing
  parallel/   device-mesh / sharding helpers (dp over ICI)
  cli/        experiment drivers (seed, baseline, max-dominant, al-loop)
"""

__version__ = "0.1.0"

from ssdr_al_tpu.config import (  # noqa: F401
    ConfigS3DIS,
    ConfigSemantic3D,
    ConfigSemanticKITTI,
    get_config,
)
