"""Device-resident training-cloud pool: on-device block sampling.

The REAL training loop was host/transfer-bound (round-3 finding): even a
quantized fresh batch moves 18 B/point over a ~25-35 MB/s host link that
SERIALIZES with device compute on this platform, putting a 205-310 ms floor
under a 151 ms device step. Training clouds are static for a whole AL run
(only the pseudo-gt planes change between rounds), so this pool uploads
every cloud ONCE — quantized exactly like trainer.shrink_train_batch
(u16 per-cloud xyz grid, u8 colors/labels/pseudo/activation) — and derives
each step's blocks ON DEVICE. Per-step host→device payload drops to
B·(cloud id + pick point) ≈ 100 bytes, and the host does no per-step work
beyond drawing B random numbers (this machine has ONE core — the host
KDTree/argpartition query was itself a meaningful cost).

Block semantics match the host pipeline (data/cloud.py::sample_block —
the reference's spatially_regular_gen, s3dis_dataset.py:115-154):
random center point + N(0, σ) jitter, exact num_points nearest by squared
distance, recenter on the pick, features = [centered xyz, colors]; clouds
smaller than num_points are upsampled with random duplicates. The block's
internal order is sorted-by-distance instead of shuffled — order is
irrelevant downstream (the model re-sorts by morton code and the loss
averages over points; the reference shuffles only because its random
downsampling reads array order, RandLANet.py:537-548).

On-device layout: one RAGGED u8 payload arena [T, 12] (xyz as u16
little-endian byte pairs 0:6, colors u8 6:9, label 9, activation 10,
pseudo 11) where T = Σ per-cloud 128-padded sizes + one max-cloud slack
window, with per-cloud row offsets — so resident bytes are proportional
to ACTUAL points, not clouds × the largest cloud (uniform [C, n_pad, 12]
padding inflated 200 heterogeneous rooms to clouds×max size and tripped
the budget gate at exactly the scale the pool targets). Extraction reads
a cloud's rows through an offset+iota index matrix — the same
width-independent row gather (12 ns/row on this platform) as the padded
layout. The activation/pseudo planes are re-uploaded per AL round and
the arena re-concatenated on device (update_pseudo_gt).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssdr_al_tpu.config import Config
from ssdr_al_tpu.data.cloud import Cloud


def _quantize_u16(x: np.ndarray):
    """Per-channel affine u16 quantization of one cloud's [N, 3] columns
    (same codec as trainer._quantize_cols; ≤0.1 mm error on a 10 m block —
    finer than the 0.04 m subsample grid and the model's bf16 cast)."""
    lo = x.min(axis=0)
    sc = np.maximum((x.max(axis=0) - lo) / 65535.0, 1e-12)
    q = np.clip(np.rint((x - lo[None]) / sc[None]), 0, 65535).astype(np.uint16)
    return q, lo.astype(np.float32), sc.astype(np.float32)


def _quantize_u8(x: np.ndarray):
    lo = x.min(axis=0)
    sc = np.maximum((x.max(axis=0) - lo) / 255.0, 1e-12)
    q = np.clip(np.rint((x - lo[None]) / sc[None]), 0, 255).astype(np.uint8)
    return q, lo.astype(np.float32), sc.astype(np.float32)


def extract_blocks(payload, offsets, xyz_lo, xyz_sc, col_lo, col_sc, n,
                   cloud_ids, picks, key, num_points: int, window: int):
    """Jit-inlineable block extraction from the ragged device arena.

    payload: [T, 12] u8 ragged arena (layout in the module docstring);
    offsets: [C] int32 per-cloud first row; xyz_lo/xyz_sc/col_lo/col_sc:
    [C, 3] f32 per-cloud dequant params; n: [C] int32 valid counts;
    cloud_ids: [B] int32; picks: [B, 3] f32 jittered centers; key: PRNG
    key for small-cloud duplicate upsampling; window: static max padded
    cloud size (pool.window) — the read width per sample. Rows past a
    cloud's n (its own padding, or the next cloud's rows when the window
    overruns a short segment — the arena ends with a full slack window so
    the index matrix never leaves [0, T)) are masked inf in the distance
    field and can never be selected.

    Returns (xyz [B, K, 3] f32 centered on pick, features [B, K, 6] f32,
    labels [B, K] i32, activation [B, K] f32, pseudo [B, K] i32).
    """
    p = window
    rows_ix = (offsets[cloud_ids][:, None]
               + jnp.arange(p, dtype=jnp.int32)[None])     # [B, P]
    pay = payload[rows_ix]                                  # [B, P, 12]
    # dequantize xyz for the distance field (broadcast-subtraction form is
    # exact f32 on the VPU — no distance matmul, CLAUDE.md precision note)
    b16 = pay[..., 0:6].astype(jnp.int32)
    q = b16[..., 0::2] + 256 * b16[..., 1::2]               # [B, P, 3]
    lo = xyz_lo[cloud_ids][:, None]
    sc = xyz_sc[cloud_ids][:, None]
    xyz_all = lo + q.astype(jnp.float32) * sc
    d = xyz_all - picks[:, None, :]
    d2 = jnp.sum(d * d, axis=-1)                            # [B, P]
    iota = jnp.broadcast_to(
        jnp.arange(p, dtype=jnp.int32)[None], d2.shape)
    valid = n[cloud_ids]                                    # [B]
    d2 = jnp.where(iota < valid[:, None], d2, jnp.inf)
    # XLA's TPU sort is cheap; carry the index payload THROUGH the sort
    # instead of gather-after-argsort (CLAUDE.md sort note)
    _, order = jax.lax.sort((d2, iota), dimension=-1, num_keys=1)
    idx = order[:, :num_points]                             # [B, K]
    # clouds smaller than num_points: positions ≥ n hold inf-distance
    # padding — replace with random valid duplicates (sample_block's
    # rng.choice upsampling; distribution parity, not stream parity)
    pos = jnp.arange(num_points, dtype=jnp.int32)
    dup = jax.random.randint(
        key, idx.shape, 0, jnp.maximum(valid, 1)[:, None])
    dup_idx = jnp.take_along_axis(order, dup, axis=1)
    idx = jnp.where(pos[None, :] < valid[:, None], idx, dup_idx)
    # ONE row gather for the whole per-point payload (12 ns/row regardless
    # of width — packing all planes into one u8 slab keeps it one gather)
    rows = jnp.take_along_axis(pay, idx[..., None], axis=1)  # [B, K, 12]
    rb16 = rows[..., 0:6].astype(jnp.int32)
    rq = rb16[..., 0::2] + 256 * rb16[..., 1::2]
    bxyz = lo + rq.astype(jnp.float32) * sc - picks[:, None, :]
    colors = (col_lo[cloud_ids][:, None]
              + rows[..., 6:9].astype(jnp.float32) * col_sc[cloud_ids][:, None])
    labels = rows[..., 9].astype(jnp.int32)
    act = rows[..., 10].astype(jnp.float32)
    pseudo = rows[..., 11].astype(jnp.int32)
    feats = jnp.concatenate([bxyz, colors], axis=-1)
    return bxyz, feats, labels, act, pseudo


class DeviceTrainPool:
    """Holds every training cloud on device; samples step indices on host.

    Cloud-cycle / center / jitter draws mirror TrainingPipeline exactly
    (reshuffled cloud cycle, uniform random center point, N(0, noise_init/10)
    pick jitter — s3dis_dataset.py:115-134). Memory is gated by
    SSDR_TRAIN_POOL_MB (default 384): pools that would exceed it set
    .available = False and callers keep the host pipeline (the platform's
    TPU worker dies on >500 MB single live buffers — don't raise the budget
    near that line)."""

    def __init__(self, clouds: List[Cloud], cfg: Config, *,
                 pseudo_gt: Optional[Dict[str, np.ndarray]] = None,
                 seed: int = 0, budget_mb: Optional[float] = None):
        self.cfg = cfg
        self.clouds = clouds
        self.rng = np.random.RandomState(seed)
        self._order = np.arange(len(clouds))
        self._pos = len(clouds)  # force reshuffle on first use
        if cfg.num_classes > 255:
            raise ValueError("DeviceTrainPool stores labels as u8")
        budget_mb = budget_mb if budget_mb is not None else float(
            os.environ.get("SSDR_TRAIN_POOL_MB", "384"))
        c = len(clouds)
        # slab width ≥ num_points so order[:, :num_points] is a full slice
        # even when every cloud is smaller than a block
        n_raw = max(max(cl.num_points for cl in clouds), cfg.num_points)
        window = -(-n_raw // 128) * 128          # static per-sample read width
        pads = [-(-max(cl.num_points, 1) // 128) * 128 for cl in clouds]
        t = sum(pads) + window                   # trailing slack window: the
        #                                          [offset, offset+window)
        #                                          read never leaves the arena
        # resident bytes: payload12 + static10 kept for per-round re-concat
        # — proportional to ACTUAL points (ragged arena), not c * max size
        if t * 22 > budget_mb * 1e6:
            self.available = False
            return
        # single-buffer hard gates, independent of the user-raisable budget
        # (this platform's TPU worker dies on >500 MB live buffers):
        # the concatenated [T, 12] payload, and the per-step [B, window, 12]
        # extraction gather + ~12 B/pt dequant temporaries
        if t * 12 > 450e6 or cfg.batch_size * window * 12 > 400e6:
            self.available = False
            return
        self.available = True
        self.window = window
        self.n_pad = window  # back-compat alias (possibility field width)
        offs = np.zeros(c, np.int32)
        offs[1:] = np.cumsum(pads[:-1])
        static = np.zeros((t, 10), np.uint8)
        xyz_lo = np.zeros((c, 3), np.float32)
        xyz_sc = np.ones((c, 3), np.float32)
        col_lo = np.zeros((c, 3), np.float32)
        col_sc = np.ones((c, 3), np.float32)
        ns = np.zeros(c, np.int32)
        for i, cl in enumerate(clouds):
            nn = cl.num_points
            ns[i] = nn
            o = offs[i]
            q, xyz_lo[i], xyz_sc[i] = _quantize_u16(
                np.asarray(cl.xyz, np.float32))
            static[o:o + nn, 0:6:2] = (q & 255).astype(np.uint8)
            static[o:o + nn, 1:6:2] = (q >> 8).astype(np.uint8)
            qc, col_lo[i], col_sc[i] = _quantize_u8(
                np.asarray(cl.colors, np.float32))
            static[o:o + nn, 6:9] = qc
            static[o:o + nn, 9] = cl.labels.astype(np.uint8)
        self._pads = pads
        self.offsets = jax.device_put(offs)
        self._offs_np = offs
        self._static = jax.device_put(static)
        self.xyz_lo = jax.device_put(xyz_lo)
        self.xyz_sc = jax.device_put(xyz_sc)
        self.col_lo = jax.device_put(col_lo)
        self.col_sc = jax.device_put(col_sc)
        self.n = jax.device_put(ns)
        self.payload = None
        self.update_pseudo_gt(pseudo_gt)

    # --------------------------------------------------------- per round ---
    def update_pseudo_gt(self, pseudo_gt: Optional[Dict[str, np.ndarray]]):
        """Upload the round's activation/pseudo planes (2 B/point) and
        re-concatenate the 12-wide payload slab on device. pseudo_gt=None
        means fully-supervised (activation 1, pseudo = labels)."""
        t = self._static.shape[0]
        # bump the slab version: replicated_args re-broadcasts only when
        # the payload actually changed
        self._version = getattr(self, "_version", 0) + 1
        dyn = np.zeros((t, 2), np.uint8)
        for i, cl in enumerate(self.clouds):
            nn = cl.num_points
            o = self._offs_np[i]
            if pseudo_gt is None:
                dyn[o:o + nn, 0] = 1
                dyn[o:o + nn, 1] = cl.labels.astype(np.uint8)
            else:
                gt = pseudo_gt[cl.name]
                dyn[o:o + nn, 0] = gt[0].astype(np.uint8)
                dyn[o:o + nn, 1] = gt[1].astype(np.uint8)
        self.payload = _concat_payload(self._static, jax.device_put(dyn))

    # ------------------------------------------------------------- steps ---
    def reseed(self, seed: int):
        """Reset the host sampling stream (per-AL-round parity with
        constructing a fresh TrainingPipeline per round)."""
        self.rng = np.random.RandomState(seed)
        self._order = np.arange(len(self.clouds))
        self._pos = len(self.clouds)

    def _next_cloud_idx(self) -> int:
        if self._pos >= len(self._order):
            self.rng.shuffle(self._order)
            self._pos = 0
        i = int(self._order[self._pos])
        self._pos += 1
        return i

    def sample_indices(self, batch_size: int):
        """Host-side per-step draw: (cloud_ids [B] i32, picks [B, 3] f32)."""
        ids = np.empty(batch_size, np.int32)
        picks = np.empty((batch_size, 3), np.float32)
        sigma = self.cfg.noise_init / 10
        for b in range(batch_size):
            ci = self._next_cloud_idx()
            ids[b] = ci
            cl = self.clouds[ci]
            center = cl.xyz[self.rng.randint(0, cl.num_points)]
            picks[b] = center + self.rng.normal(scale=sigma, size=3)
        return ids, picks

    def device_args(self):
        return (self.payload, self.offsets, self.xyz_lo, self.xyz_sc,
                self.col_lo, self.col_sc, self.n)

    def replicated_args(self, mesh):
        """device_args replicated over a dp mesh, cached: the slab is
        static across a round (update_pseudo_gt invalidates), so the
        broadcast must happen once per slab version — not per epoch (the
        slab is budget-sized, ~hundreds of MB)."""
        key = (id(mesh), self._version)
        if getattr(self, "_repl_cache_key", None) != key:
            from ssdr_al_tpu.parallel.mesh import replicated_sharding

            self._repl_cache = jax.device_put(
                self.device_args(), replicated_sharding(mesh))
            self._repl_cache_key = key
        return self._repl_cache

    # ------------------------------------------------------------ oracle ---
    def extract_host(self, cloud_ids, picks):
        """Numpy oracle of extract_blocks (minus the random small-cloud
        duplicates): returns per-sample sorted index arrays computed from
        the DEQUANTIZED coordinates, for parity tests."""
        out = []
        k = self.cfg.num_points
        for ci, pick in zip(cloud_ids, picks):
            cl = self.clouds[int(ci)]
            q, lo, sc = _quantize_u16(np.asarray(cl.xyz, np.float32))
            xyz = lo[None] + q.astype(np.float32) * sc[None]
            d2 = np.sum((xyz - pick[None]) ** 2, axis=1)
            order = np.argsort(d2, kind="stable")
            out.append(order[:k])
        return out


@jax.jit
def _concat_payload(static, dyn):
    return jnp.concatenate([static, dyn], axis=-1)
