"""In-memory cloud store and spatial block queries.

Replaces the reference's per-cloud KDTree pickles + torch DataLoader
(s3dis_dataset.py:87-154). The reference answers "40960 nearest points to a
random center" with a pickled sklearn KDTree per cloud; for k that large a
KD-tree traversal is slower than a flat argpartition over squared distances,
so the host sampler here keeps clouds as flat arrays and uses O(N) selection —
no tree artifacts needed. The device then recomputes all per-layer neighbor
indices in-graph (models.randlanet.build_pyramid), which removes the
reference's hot CPU tf_map loop entirely.
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import Dict, List, Optional

import numpy as np

from ssdr_al_tpu.data.ply import read_ply


@dataclasses.dataclass
class Cloud:
    """One subsampled training/eval cloud (contents of input_<grid>/<name>.ply).

    proj_idx/full_labels carry the full-resolution reprojection artifact
    (`<name>_proj.pkl`, written at prep time — the reference's val_proj /
    val_labels pair, data_prepare_s3dis.py:68-72): proj_idx[i] is the index of
    the sub point nearest to full-res point i, full_labels[i] its true label.
    """

    name: str
    xyz: np.ndarray        # [N, 3] float32
    colors: np.ndarray     # [N, 3] float32 (0..1)
    labels: np.ndarray     # [N] int32
    proj_idx: Optional[np.ndarray] = None    # [N_full] int32, sub index per full point
    full_labels: Optional[np.ndarray] = None  # [N_full] int32

    @property
    def num_points(self) -> int:
        return len(self.xyz)


def load_cloud(ply_path: str) -> Cloud:
    data = read_ply(ply_path)
    xyz = np.vstack((data["x"], data["y"], data["z"])).T.astype(np.float32)
    colors = np.vstack((data["red"], data["green"], data["blue"])).T.astype(np.float32)
    labels = np.asarray(data["class"]).astype(np.int32)
    name = os.path.basename(ply_path)[:-4]
    proj_idx = full_labels = None
    proj_path = ply_path[:-4] + "_proj.pkl"
    if os.path.exists(proj_path):
        import pickle

        with open(proj_path, "rb") as f:
            proj_idx, full_labels = pickle.load(f)
        proj_idx = np.asarray(proj_idx).astype(np.int64)
        full_labels = np.asarray(full_labels).astype(np.int32)
    return Cloud(name=name, xyz=np.ascontiguousarray(xyz),
                 colors=np.ascontiguousarray(colors), labels=labels,
                 proj_idx=proj_idx, full_labels=full_labels)


def load_clouds(input_dir: str, *, include=None, exclude=None) -> List[Cloud]:
    """Load every cloud in an input_<grid>/ directory.

    include/exclude: substring filters on the cloud name (the reference splits
    train/val by 'Area_5' substring, s3dis_dataset.py:67-70).
    """
    out = []
    for path in sorted(glob.glob(os.path.join(input_dir, "*.ply"))):
        name = os.path.basename(path)[:-4]
        if include is not None and include not in name:
            continue
        if exclude is not None and exclude in name:
            continue
        out.append(load_cloud(path))
    return out


def knn_block_query(xyz: np.ndarray, center: np.ndarray, k: int) -> np.ndarray:
    """Indices of the k nearest points to `center` (unordered), O(N).

    Replaces input_tree.query(pick_point, k=num_points) at
    s3dis_dataset.py:131-134. Order within the block is irrelevant because the
    sampler shuffles it immediately after (DP.shuffle_idx, s3dis_dataset.py:137).
    """
    d2 = np.sum((xyz - center[None, :]) ** 2, axis=1)
    if k >= len(xyz):
        return np.arange(len(xyz))
    idx = np.argpartition(d2, k)[:k]
    return idx


@dataclasses.dataclass
class Block:
    """One fixed-size network input block (the analogue of one tf_map row,
    minus the neighbor indices which are now computed on device)."""

    xyz: np.ndarray          # [N, 3] centered on the pick point
    features: np.ndarray     # [N, 6] = [xyz, rgb]
    labels: np.ndarray       # [N] int32
    activation: np.ndarray   # [N] float32
    pseudo: np.ndarray       # [N] int32
    point_idx: np.ndarray    # [N] int32 indices into the source cloud
    cloud_idx: int


def sample_block(
    cloud: Cloud,
    num_points: int,
    rng: np.random.RandomState,
    *,
    activation: Optional[np.ndarray] = None,
    pseudo: Optional[np.ndarray] = None,
    center_idx: Optional[int] = None,
    noise_sigma: float = 0.35,
    whole_cloud: bool = False,
) -> Block:
    """Spatially-regular block sampling (s3dis_dataset.py:115-154).

    - pick a random center point (or `center_idx`), jitter it with N(0, σ)
    - query num_points nearest (or the whole cloud in sampling mode)
    - shuffle, recenter xyz on the pick point
    - clouds smaller than num_points are upsampled with replacement
      (DP.data_aug, helper_tool.py:185-199)
    """
    pts = cloud.xyz
    if center_idx is None:
        center_idx = rng.randint(0, len(pts))
    center = pts[center_idx]
    pick = center + rng.normal(scale=noise_sigma, size=3).astype(np.float32)

    if whole_cloud or len(pts) < num_points:
        idx = np.arange(len(pts))
    else:
        idx = knn_block_query(pts, pick, num_points)

    rng.shuffle(idx)
    if activation is None:
        activation = np.ones(len(pts), np.float32)
    if pseudo is None:
        pseudo = cloud.labels.astype(np.float32)

    target = len(idx) if whole_cloud else num_points
    if len(idx) < target:
        dup = rng.choice(len(idx), target - len(idx))
        idx = np.concatenate([idx, idx[dup]])

    xyz = pts[idx] - pick[None, :]
    feats = np.concatenate([xyz, cloud.colors[idx]], axis=1).astype(np.float32)
    return Block(
        xyz=xyz.astype(np.float32),
        features=feats,
        labels=cloud.labels[idx].astype(np.int32),
        activation=np.asarray(activation)[idx].astype(np.float32),
        pseudo=np.asarray(pseudo)[idx].astype(np.int32),
        point_idx=idx.astype(np.int32),
        cloud_idx=-1,
    )


def stack_blocks(blocks: List[Block]) -> Dict[str, np.ndarray]:
    """Collate blocks into one batch dict of [B, N, ...] arrays."""
    return {
        "xyz": np.stack([b.xyz for b in blocks]),
        "features": np.stack([b.features for b in blocks]),
        "labels": np.stack([b.labels for b in blocks]),
        "activation": np.stack([b.activation for b in blocks]),
        "pseudo": np.stack([b.pseudo for b in blocks]),
        "point_idx": np.stack([b.point_idx for b in blocks]),
        "cloud_idx": np.asarray([b.cloud_idx for b in blocks], np.int32),
    }
