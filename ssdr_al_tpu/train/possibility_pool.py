"""Device-resident possibility-scheduled training pool (Semantic3D path).

The Semantic3D trainer feeds possibility-scheduled, augmented blocks
(PossibilityTrainingPipeline — the reference's train2 generator,
semantic3d_dataset_train.py:135-210): each block centers on the least-
visited point of the least-visited cloud, and visited points gain
(1 − d²/d²max)² · class_frequency. That schedule is a sequential feedback
loop — block b+1's center depends on block b's distances — so the host
pipeline cannot be trivially batched, and at 65536-pt blocks it moves
18+ B/point over a link that serializes with device compute.

This pool keeps the WHOLE loop on device: clouds live in HBM (same u8
payload slab as train/device_pool.py), the per-sample argmin → block →
possibility-update chain runs as a lax.scan over the batch inside the
train-step jit, and the possibility field is carried as explicit state.
Per-step host traffic: one PRNG key in, metrics out.

Semantics parity with PossibilityTrainingPipeline (distribution, not
RNG-stream): N(0, noise_init/10) pick jitter; exact num_points nearest by
squared distance; xyz recentered in x,y ONLY (z absolute,
semantic3d_dataset_train.py:182); possibility delta (1 − d²/d²max)² · w
over the selected block; features = augmented xyz (z-rotation,
anisotropic scale 0.8-1.2, x-symmetry flip, σ=0.001 noise —
tf_augment_input, semantic3d_dataset_train.py:237-276) + colors.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssdr_al_tpu.config import Config
from ssdr_al_tpu.data.cloud import Cloud
from ssdr_al_tpu.train.device_pool import DeviceTrainPool


class PossibilityDevicePool(DeviceTrainPool):
    """DeviceTrainPool + device-resident possibility field + class weights.

    Use sample_and_update()/the possibility-pooled train step instead of
    sample_indices(); the possibility array is functional state (callers
    thread it through steps)."""

    def __init__(self, clouds: List[Cloud], cfg: Config, *,
                 pseudo_gt: Optional[Dict[str, np.ndarray]] = None,
                 seed: int = 0, budget_mb: Optional[float] = None,
                 augment: bool = True):
        super().__init__(clouds, cfg, pseudo_gt=pseudo_gt, seed=seed,
                         budget_mb=budget_mb)
        if not self.available:
            return
        self.augment = augment
        # class frequency weights over ALL training clouds
        # (semantic3d_dataset_train.py:52-56)
        all_labels = np.hstack([cl.labels for cl in clouds])
        counts = np.bincount(all_labels,
                             minlength=cfg.num_classes).astype(np.float64)
        self.class_weight = jax.device_put(
            (counts / counts.sum()).astype(np.float32))
        # ragged segment-id map for the per-cloud possibility min (slack /
        # padding slots carry +inf possibility so their segment assignment
        # never matters; use segment 0)
        t = self._static.shape[0]
        seg = np.zeros(t, np.int32)
        for i, pad in enumerate(self._pads):
            o = self._offs_np[i]
            seg[o:o + self.clouds[i].num_points] = i
        self.poss_seg = jax.device_put(seg)
        self._poss_state = None
        self.reset_possibility(seed)

    def device_args(self):
        # possibility_extract takes the base tuple + the segment-id map
        return super().device_args() + (self.poss_seg,)

    def reset_possibility(self, seed: int):
        """Fresh U[0, 1e-3) possibility field (the host pipeline constructs
        a new PossibilityTrainingPipeline — and thus a fresh field — per AL
        round). Ragged flat [T] f32, +inf on padding/slack slots so they
        never win an argmin (semantic3d_dataset_train.py:141)."""
        rng = np.random.RandomState(seed)
        poss = np.full(self._static.shape[0], np.inf, np.float32)
        for i, cl in enumerate(self.clouds):
            o = self._offs_np[i]
            poss[o:o + cl.num_points] = rng.rand(cl.num_points) * 1e-3
        self.init_possibility = jax.device_put(poss)
        self._poss_state = None


def possibility_extract(payload, offsets, xyz_lo, xyz_sc, col_lo, col_sc, n,
                        poss_seg, class_weight, poss, key, batch_size: int,
                        num_points: int, noise_sigma: float,
                        window: int, augment: bool = True):
    """Jit-inlineable batch assembly + possibility update.

    Returns (new_poss, xyz [B,K,3], features [B,K,6], labels, activation,
    pseudo) — mirrors device_pool.extract_blocks plus the sequential
    possibility schedule. The lax.scan body does one sample's
    argmin-cloud → argmin-point → KNN-block → scatter-add chain; the
    payload row gather for all B blocks happens once, batched, after the
    scan (only labels are gathered inside it, for the class-weighted
    delta). Ragged layout: payload [T, 12] + offsets [C] (device_pool
    module docstring), poss [T] f32 with +inf on pad/slack slots,
    poss_seg [T] i32 cloud ids for the per-cloud min, window = static max
    padded cloud size (each scan step reads one [window, 12] slice)."""
    c = n.shape[0]
    iota = jnp.arange(window, dtype=jnp.int32)

    def body(carry, k_):
        poss_c = carry
        # least-visited point of the least-visited cloud (pad/slack slots
        # are +inf in the field and never win the segment min)
        per_cloud_min = jax.ops.segment_min(
            poss_c, poss_seg, num_segments=c)                  # [C]
        ci = jnp.argmin(per_cloud_min).astype(jnp.int32)
        o = offsets[ci]
        row_poss = jax.lax.dynamic_slice(poss_c, (o,), (window,))
        # a short cloud's [window] slice overruns its padded segment into
        # the NEXT cloud's finite values — mask beyond n[ci] so the argmin
        # stays in-cloud even if cloud choice ever becomes stochastic
        # (today ci is the exact global argmin, so overrun values can't be
        # smaller, but don't rely on the tie-break)
        row_poss = jnp.where(iota < n[ci], row_poss, jnp.inf)
        pi = jnp.argmin(row_poss).astype(jnp.int32)
        pay_c = jax.lax.dynamic_slice(
            payload, (o, 0), (window, 12))                     # [P, 12]
        b16 = pay_c[:, 0:6].astype(jnp.int32)
        q = b16[:, 0::2] + 256 * b16[:, 1::2]
        xyz_c = xyz_lo[ci][None] + q.astype(jnp.float32) * xyz_sc[ci][None]
        center = xyz_c[pi]
        pick = center + noise_sigma * jax.random.normal(
            jax.random.fold_in(k_, 0), (3,))
        d = xyz_c - pick[None]
        d2 = jnp.sum(d * d, axis=-1)
        d2v = jnp.where(iota < n[ci], d2, jnp.inf)
        _, order = jax.lax.sort((d2v, iota), dimension=-1, num_keys=1)
        idx = order[:num_points]
        pos = jnp.arange(num_points, dtype=jnp.int32)
        dup = jax.random.randint(
            jax.random.fold_in(k_, 1), idx.shape, 0, jnp.maximum(n[ci], 1))
        idx = jnp.where(pos < n[ci], idx, jnp.take(order, dup))
        in_block = pos < jnp.minimum(n[ci], num_points)
        # possibility delta over the TRUE block points (duplicates excluded
        # — the host pipeline indexes each point once): (1 − d²/d²max)² · w
        d2_blk = jnp.take(d2v, idx)
        d2_blk = jnp.where(in_block, d2_blk, 0.0)
        dmax = jnp.maximum(jnp.max(d2_blk), 1e-12)
        lab_blk = jnp.take(pay_c[:, 9].astype(jnp.int32), idx)
        delta = jnp.square(1.0 - d2_blk / dmax) * class_weight[lab_blk]
        delta = jnp.where(in_block, delta, 0.0)
        poss_c = poss_c.at[o + idx].add(delta)
        return poss_c, (ci, idx, pick)

    keys = jax.random.split(jax.random.fold_in(key, 0), batch_size)
    new_poss, (cis, idxs, picks) = jax.lax.scan(body, poss, keys)

    # batched payload gather for all B blocks: within-cloud indices become
    # global arena rows — B·K rows, not B·window (cheaper than the padded
    # layout's full-cloud gather)
    rows = payload[offsets[cis][:, None] + idxs]               # [B, K, 12]
    rb16 = rows[..., 0:6].astype(jnp.int32)
    rq = rb16[..., 0::2] + 256 * rb16[..., 1::2]
    world = (xyz_lo[cis][:, None]
             + rq.astype(jnp.float32) * xyz_sc[cis][:, None])
    # recenter x,y ONLY; z stays absolute (semantic3d_dataset_train.py:182)
    xyz = world - jnp.concatenate(
        [picks[:, :2], jnp.zeros((batch_size, 1))], axis=1)[:, None, :]
    colors = (col_lo[cis][:, None]
              + rows[..., 6:9].astype(jnp.float32) * col_sc[cis][:, None])
    labels = rows[..., 9].astype(jnp.int32)
    act = rows[..., 10].astype(jnp.float32)
    pseudo = rows[..., 11].astype(jnp.int32)

    if augment:
        # tf_augment_input distribution (semantic3d_dataset_train.py:237-276):
        # z-rotation, anisotropic scale U[0.8, 1.2]^3, x-flip, σ=0.001 noise
        ak = jax.random.fold_in(key, 1)
        theta = jax.random.uniform(
            jax.random.fold_in(ak, 0), (batch_size,), maxval=2 * jnp.pi)
        cth, sth = jnp.cos(theta), jnp.sin(theta)
        zeros = jnp.zeros_like(cth)
        ones = jnp.ones_like(cth)
        rot = jnp.stack([
            jnp.stack([cth, -sth, zeros], -1),
            jnp.stack([sth, cth, zeros], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ], axis=1)                                             # [B, 3, 3]
        out = jnp.einsum("bkj,bji->bki", xyz, rot)
        scale = jax.random.uniform(
            jax.random.fold_in(ak, 1), (batch_size, 1, 3),
            minval=0.8, maxval=1.2)
        flip = jnp.where(
            jax.random.uniform(jax.random.fold_in(ak, 2),
                               (batch_size, 1, 1)) < 0.5, -1.0, 1.0)
        sym = jnp.concatenate(
            [flip, jnp.ones((batch_size, 1, 2))], axis=-1)
        out = out * scale * sym
        out = out + 0.001 * jax.random.normal(
            jax.random.fold_in(ak, 3), out.shape)
        feats = jnp.concatenate([out, colors], axis=-1)
    else:
        feats = jnp.concatenate([xyz, colors], axis=-1)
    return new_poss, xyz, feats, labels, act, pseudo
