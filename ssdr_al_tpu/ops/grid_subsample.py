"""Voxel-grid subsampling: barycenter of points/features, majority label.

Replacement for the reference's C++ extension (N2 in SURVEY.md:
utils/cpp_wrappers/cpp_subsampling/grid_subsampling/grid_subsampling.cpp:4-106,
wrapped by DataProcessing.grid_sub_sampling, helper_tool.py:216-235).

Semantics preserved exactly:
  - voxel index = floor((p − origin)/dl) with origin = floor(min/dl)·dl
  - output point   = mean of points in the voxel (barycenter)
  - output feature = mean of features in the voxel
  - output label   = majority vote in the voxel (ties → smallest label id)
  - output voxel order is unspecified in the reference (unordered_map); here
    it is sorted by (iz, iy, ix) flat key — deterministic.

This is offline preprocessing (data_prepare_*.py scripts), so the primary
implementation is vectorized numpy on the host; `grid_subsample_jax` provides
a jit-able padded variant for on-device pipelines. A C++ host path also
exists in native/ for parity with the reference's build (same semantics).
"""

from __future__ import annotations

import numpy as np


def _voxel_keys(points: np.ndarray, grid_size: float):
    min_corner = points.min(axis=0)
    origin = np.floor(min_corner / grid_size) * grid_size
    ij = np.floor((points - origin) / grid_size).astype(np.int64)
    max_corner = points.max(axis=0)
    nx = int(np.floor((max_corner[0] - origin[0]) / grid_size)) + 1
    ny = int(np.floor((max_corner[1] - origin[1]) / grid_size)) + 1
    return ij[:, 0] + nx * ij[:, 1] + nx * ny * ij[:, 2]


def grid_subsample_np(points, features=None, labels=None, grid_size=0.1):
    """points [N,3] float32; features [N,F] optional; labels [N] int optional.

    Returns the same tuple structure as the reference wrapper
    (helper_tool.py:227-235): points / (points, features) / (points, labels) /
    (points, features, labels).
    """
    points = np.asarray(points, np.float32)
    keys = _voxel_keys(points, float(grid_size))
    uniq, inv, counts = np.unique(keys, return_inverse=True, return_counts=True)
    s = len(uniq)

    sub_points = np.zeros((s, 3), np.float64)
    np.add.at(sub_points, inv, points.astype(np.float64))
    sub_points = (sub_points / counts[:, None]).astype(np.float32)

    out = [sub_points]
    if features is not None:
        features = np.asarray(features)
        sub_feat = np.zeros((s, features.shape[1]), np.float64)
        np.add.at(sub_feat, inv, features.astype(np.float64))
        out.append((sub_feat / counts[:, None]).astype(np.float32))
    if labels is not None:
        labels = np.asarray(labels).astype(np.int64).ravel()
        num_classes = int(labels.max()) + 1
        hist = np.zeros((s, num_classes), np.int64)
        np.add.at(hist, (inv, labels), 1)
        sub_labels = hist.argmax(axis=1).astype(np.int32)
        out.append(sub_labels)
    return out[0] if len(out) == 1 else tuple(out)


def grid_subsample_jax(points, grid_size, max_voxels, features=None, labels=None,
                       num_classes=None):
    """Jit-able padded variant. Returns (sub_points [V,3], sub_feat, sub_labels,
    valid_mask [V]) with V = max_voxels; invalid rows zeroed.

    Voxel ids are computed on the host-free path with a 2-pass sort-based
    unique (static shapes). Output order: ascending flat voxel key.
    """
    import jax
    import jax.numpy as jnp

    points = jnp.asarray(points, jnp.float32)
    n = points.shape[0]
    origin = jnp.floor(jnp.min(points, axis=0) / grid_size) * grid_size
    ij = jnp.floor((points - origin) / grid_size).astype(jnp.int64)
    span = jnp.floor((jnp.max(points, axis=0) - origin) / grid_size).astype(jnp.int64) + 1
    keys = ij[:, 0] + span[0] * ij[:, 1] + span[0] * span[1] * ij[:, 2]

    sorted_keys = jnp.sort(keys)
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]]
    )
    # rank of each unique key among uniques
    uniq_rank = jnp.cumsum(is_new) - 1
    # map each point's key to its unique slot via searchsorted on the sorted keys
    pos = jnp.searchsorted(sorted_keys, keys)
    seg = uniq_rank[pos].astype(jnp.int32)
    num_uniq = uniq_rank[-1] + 1
    valid = jnp.arange(max_voxels) < num_uniq

    ones = jnp.ones((n,), jnp.float32)
    cnt = jax.ops.segment_sum(ones, seg, num_segments=max_voxels)
    cnt_safe = jnp.maximum(cnt, 1.0)
    sub_points = jax.ops.segment_sum(points, seg, num_segments=max_voxels) / cnt_safe[:, None]

    sub_feat = None
    if features is not None:
        features = jnp.asarray(features, jnp.float32)
        sub_feat = (
            jax.ops.segment_sum(features, seg, num_segments=max_voxels)
            / cnt_safe[:, None]
        )
    sub_labels = None
    if labels is not None:
        one_hot = jax.nn.one_hot(labels, num_classes, dtype=jnp.int32)
        hist = jax.ops.segment_sum(one_hot, seg, num_segments=max_voxels)
        sub_labels = jnp.argmax(hist, axis=1).astype(jnp.int32)
    return sub_points, sub_feat, sub_labels, valid
