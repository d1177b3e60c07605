"""Synthetic room-like point clouds for tests, benchmarks and CI.

The real datasets (S3DIS/Semantic3D) are not shipped; the end-to-end AL loop
is exercised on generated scenes with the same artifact layout. Scenes are
simple rooms (floor/ceiling/walls + box 'furniture'), geometrically separable
so a few training epochs reach useful mIoU.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ssdr_al_tpu.data.cloud import Cloud

# class ids: 0 floor, 1 ceiling, 2 wall, 3 box, 4 clutter
NUM_SYNTH_CLASSES = 5


def _plane(rng, n, extent, z, cls, jitter=0.02):
    xy = rng.rand(n, 2) * extent
    zz = np.full((n, 1), z) + rng.randn(n, 1) * jitter
    pts = np.hstack([xy, zz])
    return pts, np.full(n, cls)


def _wall(rng, n, extent, height, axis, offset, cls, jitter=0.02):
    t = rng.rand(n) * extent
    z = rng.rand(n) * height
    w = np.full(n, offset) + rng.randn(n) * jitter
    pts = np.stack([t, w, z], axis=1) if axis == 1 else np.stack([w, t, z], axis=1)
    return pts, np.full(n, cls)


def _box(rng, n, center, size, cls):
    face = rng.randint(0, 6, n)
    u = rng.rand(n) - 0.5
    v = rng.rand(n) - 0.5
    pts = np.zeros((n, 3))
    for f in range(6):
        m = face == f
        ax = f // 2
        sign = 1.0 if f % 2 == 0 else -1.0
        others = [a for a in range(3) if a != ax]
        pts[m, ax] = sign * 0.5
        pts[m, others[0]] = u[m]
        pts[m, others[1]] = v[m]
    pts = pts * np.asarray(size)[None, :] + np.asarray(center)[None, :]
    return pts, np.full(n, cls)


def make_room(rng: np.random.RandomState, name: str, *, num_points=20000,
              extent=6.0, height=3.0, num_boxes=3) -> Cloud:
    parts = []
    n_plane = num_points // 4
    parts.append(_plane(rng, n_plane, extent, 0.0, 0))
    parts.append(_plane(rng, n_plane, extent, height, 1))
    n_wall = num_points // 8
    parts.append(_wall(rng, n_wall, extent, height, 1, 0.0, 2))
    parts.append(_wall(rng, n_wall, extent, height, 1, extent, 2))
    n_box = max(1, (num_points - 2 * n_plane - 2 * n_wall) // max(num_boxes, 1))
    for _ in range(num_boxes):
        center = [rng.rand() * extent, rng.rand() * extent, rng.rand() * 1.0 + 0.4]
        size = rng.rand(3) * 0.8 + 0.4
        parts.append(_box(rng, n_box, center, size, 3))
    xyz = np.vstack([p for p, _ in parts]).astype(np.float32)
    labels = np.concatenate([l for _, l in parts]).astype(np.int32)
    # colors correlate with class (so RGB is informative, like real scenes);
    # the palette is FIXED across rooms so color generalizes train → val
    palette = np.random.RandomState(1234).rand(NUM_SYNTH_CLASSES, 3) * 0.8 + 0.1
    colors = palette[labels] + rng.randn(len(labels), 3) * 0.05
    colors = np.clip(colors, 0, 1).astype(np.float32)
    perm = rng.permutation(len(xyz))
    return Cloud(name=name, xyz=xyz[perm], colors=colors[perm],
                 labels=labels[perm])


def make_dataset(num_train=4, num_val=1, num_points=20000, seed=0
                 ) -> tuple[List[Cloud], List[Cloud]]:
    rng = np.random.RandomState(seed)
    train = [
        make_room(rng, f"Room_train_{i}", num_points=num_points)
        for i in range(num_train)
    ]
    val = [
        make_room(rng, f"Room_val_{i}", num_points=num_points)
        for i in range(num_val)
    ]
    return train, val


def synth_class_weights() -> np.ndarray:
    """Flat inverse-frequency weights for the synthetic label space."""
    return np.ones(NUM_SYNTH_CLASSES, np.float32)
