"""Host-side input pipelines: training blocks, whole-cloud sampling blocks,
and the possibility-driven evaluation sampler.

Replaces the reference's torch Dataset/DataLoader stack (P7 in SURVEY.md:
s3dis_dataset.py, s3dis_dataset_test.py). Differences by design:
  - No per-batch CPU KNN (`tf_map`) — neighbor indices are computed on device
    inside the jitted step (models.randlanet.build_pyramid).
  - No KDTree pickles — block queries are O(N) argpartition (data/cloud.py).
  - A background prefetch thread overlaps host sampling with device compute
    (the reference used 6 DataLoader worker processes for the same purpose,
    RandLANet.py:226).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from ssdr_al_tpu.config import Config
from ssdr_al_tpu.data.cloud import Block, Cloud, sample_block, stack_blocks


class TrainingPipeline:
    """Random spatially-regular blocks from labeled clouds.

    Mirrors S3DIS_Dataset(mode="training") + DataLoader(batch, shuffle)
    (s3dis_dataset.py:17-193): every batch draws `batch_size` clouds from a
    reshuffled cycle, samples one block per cloud around a random center, and
    attaches the current round's pseudo-gt (activation + pseudo labels).
    """

    def __init__(self, clouds: List[Cloud], cfg: Config, *,
                 pseudo_gt: Optional[Dict[str, np.ndarray]] = None,
                 seed: int = 0):
        self.clouds = clouds
        self.cfg = cfg
        self.pseudo_gt = pseudo_gt  # {cloud_name: float32 [2, N]}
        self.rng = np.random.RandomState(seed)
        self._order = np.arange(len(clouds))
        self._pos = len(clouds)  # force reshuffle on first use

    def _next_cloud(self) -> Cloud:
        if self._pos >= len(self._order):
            self.rng.shuffle(self._order)
            self._pos = 0
        c = self.clouds[self._order[self._pos]]
        self._pos += 1
        return c

    def sample_batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        blocks = []
        for _ in range(batch_size):
            cloud = self._next_cloud()
            act, pseudo = None, None
            if self.pseudo_gt is not None:
                gt = self.pseudo_gt[cloud.name]
                act, pseudo = gt[0], gt[1]
            b = sample_block(
                cloud, self.cfg.num_points, self.rng,
                activation=act, pseudo=pseudo,
                noise_sigma=self.cfg.noise_init / 10,
            )
            b.cloud_idx = self.clouds.index(cloud)
            blocks.append(b)
        return stack_blocks(blocks)

    def batches(self, num_batches: int, batch_size: int,
                prefetch: int = 2,
                transform=None) -> Iterator[Dict[str, np.ndarray]]:
        """Generator with background-thread prefetch.

        transform(batch) runs ON THE WORKER THREAD — pass narrowing +
        jax.device_put here so the host→device upload overlaps the previous
        step's device compute instead of serializing into the training loop
        (device_put is thread-safe and mostly releases the GIL)."""
        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        stop = object()

        def worker():
            for _ in range(num_batches):
                b = self.sample_batch(batch_size)
                q.put(transform(b) if transform is not None else b)
            q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        t.join()


def augment_block_features(xyz, colors, rng, *, scale_min=0.8, scale_max=1.2,
                           anisotropic=True, symmetries=(True, False, False),
                           noise_sigma=0.001):
    """Rotation/scale/symmetry/noise augmentation applied to the FEATURE copy
    of xyz only (the KNN pyramid sees the unaugmented coordinates) — parity
    with tf_augment_input, semantic3d_dataset_train.py:237-276."""
    theta = rng.uniform(0, 2 * np.pi)
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    out = xyz @ rot
    if anisotropic:
        scale = rng.uniform(scale_min, scale_max, size=(1, 3))
    else:
        scale = rng.uniform(scale_min, scale_max, size=(1, 1))
    sym = np.array([
        (np.round(rng.uniform()) * 2 - 1) if flip else 1.0
        for flip in symmetries
    ])[None, :]
    out = out * (scale * sym).astype(np.float32)
    out = out + rng.normal(scale=noise_sigma, size=out.shape).astype(np.float32)
    return np.concatenate([out, colors], axis=-1).astype(np.float32)


class PossibilityTrainingPipeline:
    """Possibility-scheduled training blocks with class-balanced visitation and
    input augmentation — the Semantic3D training path.

    Parity with Semantic3D_Dataset_Train.get_batch
    (semantic3d_dataset_train.py:135-210):
      - block centered on the least-visited point of the least-visited cloud
      - possibility delta (1 − d/d_max)² · class_frequency(point)
      - xyz recentered in x,y ONLY (z stays absolute)
      - features = augmented xyz + rgb; pyramid xyz unaugmented
    """

    def __init__(self, clouds: List[Cloud], cfg: Config, *,
                 pseudo_gt: Optional[Dict[str, np.ndarray]] = None,
                 seed: int = 0, augment: bool = True):
        self.clouds = clouds
        self.cfg = cfg
        self.pseudo_gt = pseudo_gt
        self.rng = np.random.RandomState(seed)
        self.augment = augment
        self.possibility = [self.rng.rand(c.num_points) * 1e-3 for c in clouds]
        self.min_possibility = [float(p.min()) for p in self.possibility]
        all_labels = np.hstack([c.labels for c in clouds])
        counts = np.bincount(all_labels, minlength=cfg.num_classes).astype(np.float64)
        self.class_weight = counts / counts.sum()

    def sample_batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        blocks = []
        for _ in range(batch_size):
            ci = int(np.argmin(self.min_possibility))
            cloud = self.clouds[ci]
            pts = cloud.xyz
            point_ind = int(np.argmin(self.possibility[ci]))
            pick = pts[point_ind] + self.rng.normal(
                scale=cfg.noise_init / 10, size=3
            ).astype(np.float32)
            if len(pts) < cfg.num_points:
                idx = np.arange(len(pts))
            else:
                d2all = np.sum((pts - pick[None]) ** 2, axis=1)
                idx = np.argpartition(d2all, cfg.num_points - 1)[: cfg.num_points]
            self.rng.shuffle(idx)

            w = self.class_weight[cloud.labels[idx]]
            dists = np.sum((pts[idx] - pick[None]) ** 2, axis=1)
            delta = np.square(1 - dists / dists.max()) * w
            self.possibility[ci][idx] += delta
            self.min_possibility[ci] = float(self.possibility[ci].min())

            if len(idx) < cfg.num_points:
                dup = self.rng.choice(len(idx), cfg.num_points - len(idx))
                idx = np.concatenate([idx, idx[dup]])

            xyz = pts[idx].copy()
            xyz[:, 0:2] -= pick[None, 0:2]  # z stays absolute (train.py:182)
            colors = cloud.colors[idx]
            if self.augment:
                feats = augment_block_features(xyz, colors, self.rng)
            else:
                feats = np.concatenate([xyz, colors], -1).astype(np.float32)

            if self.pseudo_gt is not None:
                gt = self.pseudo_gt[cloud.name]
                act, pseudo = gt[0][idx], gt[1][idx]
            else:
                act = np.ones(len(idx), np.float32)
                pseudo = cloud.labels[idx].astype(np.float32)

            blocks.append(Block(
                xyz=xyz.astype(np.float32),
                features=feats,
                labels=cloud.labels[idx].astype(np.int32),
                activation=act.astype(np.float32),
                pseudo=pseudo.astype(np.int32),
                point_idx=idx.astype(np.int32),
                cloud_idx=ci,
            ))
        return stack_blocks(blocks)

    def batches(self, num_batches: int, batch_size: int,
                prefetch: int = 2) -> Iterator[Dict[str, np.ndarray]]:
        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        stop = object()

        def worker():
            for _ in range(num_batches):
                q.put(self.sample_batch(batch_size))
            q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        t.join()


class SamplingPipeline:
    """Whole-cloud inference blocks for AL selection.

    Mirrors S3DIS_Dataset(mode="sampling") (s3dis_dataset.py:129-131): the
    query covers ALL points of the cloud. Clouds larger than `chunk_points`
    are cut into fixed-size chunks (the TPU analogue of the reference's
    recursive octant splitting for Semantic3D,
    semantic3d_dataset_sampling.py:198-236) — every chunk is a padded
    fixed-shape block, so a single compiled program serves every cloud.
    """

    def __init__(self, clouds: List[Cloud], cfg: Config, *,
                 chunk_points: Optional[int] = None, seed: int = 0):
        self.clouds = clouds
        self.cfg = cfg
        self.chunk_points = chunk_points or cfg.num_points
        self.rng = np.random.RandomState(seed)

    def cloud_chunks(self, cloud: Cloud):
        """Yield (chunk_batch, point_idx, valid_count) covering the cloud.

        Points are assigned to chunks by a shuffled partition; each chunk is
        padded to chunk_points by repeating its own points, so scatter-back
        with np.argsort-free indexing just overwrites duplicates.
        """
        n = cloud.num_points
        cp = self.chunk_points
        perm = self.rng.permutation(n)
        num_chunks = max(1, -(-n // cp))
        for ci in range(num_chunks):
            idx = perm[ci * cp : (ci + 1) * cp]
            valid = len(idx)
            if valid < cp:
                pad = self.rng.choice(idx, cp - valid) if valid else np.zeros(cp, np.int64)
                idx = np.concatenate([idx, pad])
            center = cloud.xyz[idx].mean(axis=0)
            xyz = cloud.xyz[idx] - center[None, :]
            feats = np.concatenate([xyz, cloud.colors[idx]], axis=1)
            batch = {
                "xyz": xyz[None].astype(np.float32),
                "features": feats[None].astype(np.float32),
            }
            yield batch, idx, valid


class PossibilityEvalPipeline:
    """Low-coverage-first evaluation sampler with possibility scheduling.

    Mirrors S3DIS_Dataset_Test (s3dis_dataset_test.py:85-151): maintain a
    per-point 'possibility'; each block is centered on the least-visited point
    of the least-visited cloud; visited points gain (1 − d/d_max)².
    """

    def __init__(self, clouds: List[Cloud], cfg: Config, seed: int = 0):
        self.clouds = clouds
        self.cfg = cfg
        self.rng = np.random.RandomState(seed)
        self.init_possibility()

    def init_possibility(self):
        self.possibility = [
            self.rng.rand(c.num_points) * 1e-3 for c in self.clouds
        ]
        self.min_possibility = [float(p.min()) for p in self.possibility]

    @property
    def global_min(self) -> float:
        return min(self.min_possibility)

    def get_batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        blocks = []
        for _ in range(batch_size):
            ci = int(np.argmin(self.min_possibility))
            cloud = self.clouds[ci]
            pts = cloud.xyz
            point_ind = int(np.argmin(self.possibility[ci]))
            center = pts[point_ind]
            pick = center + self.rng.normal(
                scale=cfg.noise_init / 10, size=3
            ).astype(np.float32)

            if len(pts) < cfg.num_points:
                idx = np.arange(len(pts))
            else:
                d2all = np.sum((pts - pick[None]) ** 2, axis=1)
                idx = np.argpartition(d2all, cfg.num_points - 1)[: cfg.num_points]
            self.rng.shuffle(idx)

            # possibility update (s3dis_dataset_test.py:131-135)
            dists = np.sum((pts[idx] - pick[None]) ** 2, axis=1)
            delta = np.square(1 - dists / dists.max())
            self.possibility[ci][idx] += delta
            self.min_possibility[ci] = float(self.possibility[ci].min())

            if len(idx) < cfg.num_points:
                dup = self.rng.choice(len(idx), cfg.num_points - len(idx))
                idx = np.concatenate([idx, idx[dup]])

            xyz = (pts[idx] - pick[None]).astype(np.float32)
            feats = np.concatenate([xyz, cloud.colors[idx]], axis=1)
            blocks.append(
                Block(
                    xyz=xyz,
                    features=feats.astype(np.float32),
                    labels=cloud.labels[idx].astype(np.int32),
                    activation=np.zeros(len(idx), np.float32),
                    pseudo=np.zeros(len(idx), np.int32),
                    point_idx=idx.astype(np.int32),
                    cloud_idx=ci,
                )
            )
        return stack_blocks(blocks)
