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

# hard mode (sampler-ablation benchmark): adds geometrically-confusable and
# rare classes — 5 chair (small box, same shape family as 3), 6 pillar
# (vertical box, wall-like), 7 board (thin wall-mounted box, co-located with
# walls) — plus near-identical colors for confusable pairs and boundary
# label noise. Random selection saturates much later here, exposing the
# value of uncertainty/diversity reasoning.
NUM_SYNTH_CLASSES_HARD = 8


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


def _blob(rng, n, center, scale, cls):
    pts = rng.randn(n, 3) * np.asarray(scale)[None, :] + np.asarray(center)[None, :]
    return pts, np.full(n, cls)


def make_room_hard(rng: np.random.RandomState, name: str, *,
                   num_points=20000, extent=6.0, height=3.0,
                   label_noise=0.03) -> Cloud:
    """Harder scene for the sampler ablation: 8 classes with overlapping
    geometry (chair vs furniture-box, pillar vs wall, board ON wall),
    imbalanced rare classes, confusable colors, and boundary label noise."""
    parts = []
    n_plane = num_points // 5
    parts.append(_plane(rng, n_plane, extent, 0.0, 0))
    parts.append(_plane(rng, n_plane, extent, height, 1))
    n_wall = num_points // 10
    parts.append(_wall(rng, n_wall, extent, height, 1, 0.0, 2))
    parts.append(_wall(rng, n_wall, extent, height, 1, extent, 2))
    parts.append(_wall(rng, n_wall, extent, height, 0, 0.0, 2))

    remaining = num_points - 2 * n_plane - 3 * n_wall
    # furniture boxes (3) vs chairs (5): same shape family, different size
    n_box = remaining // 4
    for _ in range(3):
        c = [rng.rand() * extent, rng.rand() * extent, rng.rand() * 0.8 + 0.5]
        parts.append(_box(rng, n_box // 3, c, rng.rand(3) * 0.8 + 0.6, 3))
    n_chair = remaining // 6
    for _ in range(4):
        c = [rng.rand() * extent, rng.rand() * extent, rng.rand() * 0.3 + 0.25]
        parts.append(_box(rng, n_chair // 4, c, rng.rand(3) * 0.3 + 0.25, 5))
    # clutter blobs intersecting furniture (4)
    n_clut = remaining // 6
    for _ in range(5):
        c = [rng.rand() * extent, rng.rand() * extent, rng.rand() * 0.6 + 0.2]
        parts.append(_blob(rng, n_clut // 5, c, [0.25, 0.25, 0.15], 4))
    # pillars (6): tall thin boxes — wall-like verticals
    n_pil = remaining // 8
    for _ in range(2):
        c = [rng.rand() * extent, rng.rand() * extent, height / 2]
        parts.append(_box(rng, n_pil // 2, c, [0.3, 0.3, height], 6))
    # boards (7): thin boxes ON the walls (rare class, co-located with 2)
    n_board = max(20, remaining // 16)
    for _ in range(2):
        c = [rng.rand() * extent, 0.04, rng.rand() * 1.0 + 1.0]
        parts.append(_box(rng, n_board // 2, c, [1.0, 0.06, 0.7], 7))

    xyz = np.vstack([p for p, _ in parts]).astype(np.float32)
    labels = np.concatenate([l for _, l in parts]).astype(np.int32)

    # palette: confusable pairs get near-identical colors (3≈5, 2≈6≈7)
    base = np.random.RandomState(1234).rand(NUM_SYNTH_CLASSES_HARD, 3) * 0.8 + 0.1
    base[5] = base[3] + 0.04
    base[6] = base[2] + 0.03
    base[7] = base[2] - 0.03
    colors = base[labels] + rng.randn(len(labels), 3) * 0.12
    colors = np.clip(colors, 0, 1).astype(np.float32)

    # boundary label noise: flip a fraction of labels to a NEIGHBOR's class
    # (annotation noise concentrates at class boundaries in real data)
    if label_noise > 0:
        n_noise = int(len(labels) * label_noise)
        pick = rng.choice(len(labels), n_noise, replace=False)
        d2 = np.sum((xyz[pick, None, :] -
                     xyz[None, rng.choice(len(xyz), 256), :]) ** 2, axis=-1)
        donor = rng.choice(len(xyz), 256)
        labels[pick] = labels[donor[np.argmin(d2, axis=1)]]

    perm = rng.permutation(len(xyz))
    return Cloud(name=name, xyz=xyz[perm], colors=colors[perm],
                 labels=labels[perm])


def make_dataset(num_train=4, num_val=1, num_points=20000, seed=0,
                 hard=False) -> tuple[List[Cloud], List[Cloud]]:
    rng = np.random.RandomState(seed)
    room = make_room_hard if hard else make_room
    train = [
        room(rng, f"Room_train_{i}", num_points=num_points)
        for i in range(num_train)
    ]
    val = [
        room(rng, f"Room_val_{i}", num_points=num_points)
        for i in range(num_val)
    ]
    return train, val


def synth_class_weights() -> np.ndarray:
    """Flat inverse-frequency weights for the synthetic label space."""
    return np.ones(NUM_SYNTH_CLASSES, np.float32)


def grid_superpoints(xyz, target_sp: int = 256):
    """O(N) voxel partition: superpoints = occupied voxels of a grid sized
    (by bisection on the voxel edge) to land near `target_sp` regions.

    NOT a replacement for cut-pursuit (partition/superpoint.py): selection-
    phase cost is independent of how regions were produced, so cloud-count-
    scale selection benchmarks (200+ clouds, reference S3DIS cloud-count
    parity — sampler2.py:589-598 covers every training cloud) use this to
    keep partition setup out of the measurement.

    Returns (components, in_component) with components ascending per region
    (same contract as partition/cp.py:84-87)."""
    xyz = np.asarray(xyz)
    lo = xyz.min(axis=0)
    span = float(np.maximum(xyz.max(axis=0) - lo, 1e-6).max())

    def part(v):
        q = np.floor((xyz - lo) / v).astype(np.int64)
        dims = q.max(axis=0) + 1
        key = (q[:, 0] * dims[1] + q[:, 1]) * dims[2] + q[:, 2]
        uniq, inv = np.unique(key, return_inverse=True)
        return len(uniq), inv

    v_lo, v_hi = span / (4 * max(target_sp, 1)), span
    s, inv = part((v_lo * v_hi) ** 0.5)
    for _ in range(16):
        if 0.8 * target_sp <= s <= 1.25 * target_sp:
            break
        if s > target_sp:
            v_lo = (v_lo * v_hi) ** 0.5   # too many voxels → coarser grid
        else:
            v_hi = (v_lo * v_hi) ** 0.5
        s, inv = part((v_lo * v_hi) ** 0.5)
    in_component = inv.astype(np.int32)
    order = np.argsort(in_component, kind="stable")
    bounds = np.searchsorted(in_component[order], np.arange(s + 1))
    components = [order[bounds[i]: bounds[i + 1]] for i in range(s)]
    return components, in_component
