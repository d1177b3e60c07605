"""AL samplers: Seed / Random / All / T (uncertainty + diversity reasoning).

Orchestrator parity with sampler2.py:344-810, re-built around the TPU
pipeline: one chunked on-device inference pass per round produces per-point
predicted classes, uncertainties and penultimate features for ALL training
clouds; per-superpoint statistics are segment reductions; the diversity stage
(FPS-GCN / coreGCN / edcd-FPS) runs on padded per-cloud region blocks; only
the sequential click-budget bookkeeping stays in host Python.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssdr_al_tpu.active.fps_gcn import gcn_fps_sampling
from ssdr_al_tpu.active.gcn import gcn_sampling
from ssdr_al_tpu.active.oracle import (
    dominant_point_ids_flat,
    gt_dominant_all,
    oracle_labeling,
    seed_labeling,
)
from ssdr_al_tpu.active.region_graph import (
    RegionTable,
    build_region_graph,
    pad_regions_vectorized,
)
from ssdr_al_tpu.active.state import ALState, RoundStats
from ssdr_al_tpu.active.uncertainty import (
    add_classbal,
    add_clsbal,
    point_uncertainty,
    region_uncertainty,
)
from ssdr_al_tpu.config import Config
from ssdr_al_tpu.data.cloud import Cloud
from ssdr_al_tpu.data.dataset import SamplingPipeline
from ssdr_al_tpu.ops.chamfer import chamfer_pairwise
from ssdr_al_tpu.ops.fps import farthest_superpoint_sample
from ssdr_al_tpu.ops.segment import segment_majority
from ssdr_al_tpu.active.region_graph import bbox_center


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _score_regions_device(unc, cls, seg, num_segments, num_classes, mode):
    """Fused per-superpoint scoring: region uncertainty + dominant predicted
    class, one device call per cloud (replaces the reference's per-superpoint
    numpy loop, sampler2.py:612-631). Operands arrive in the narrow transfer
    dtypes (f16 uncertainty, u8 classes — the tunnel is ~35 MB/s) and are
    widened here."""
    unc = unc.astype(jnp.float32)
    cls = cls.astype(jnp.int32)
    runc = region_uncertainty(unc, cls, seg, num_segments, num_classes, mode)
    dom, _ = segment_majority(cls, seg, num_segments, num_classes)
    return runc, dom


# --------------------------------------------------------------------------
# shared helpers
# --------------------------------------------------------------------------


def spread_budget_over_clouds(rng, total_num, number, cloud_names):
    """Multinomial spread of `number` picks over clouds by index-mod hashing;
    parity with SeedSampler._iteration (sampler2.py:354-366)."""
    rand_inds = rng.choice(range(total_num), int(number), replace=False)
    each = np.zeros(len(cloud_names), np.int64)
    for ind in rand_inds:
        each[ind % len(cloud_names)] += 1
    return each


# geometric ladder for the region-slot cap (~1.5× steps): few, round-stable
# compiled shapes as candidate+anchor counts drift
_SLOT_LADDER = [512, 1024, 2048, 3072, 4096, 6144, 8192, 12288, 16384,
                24576, 32768, 49152, 65536, 98304, 131072]


@functools.partial(jax.jit, static_argnums=(2,))
def _region_means_device(groups, slot, slot_cap):
    """Mean penultimate feature per region slot over the retained device
    buffers. groups: tuple of [cb, N, 32] arrays (already saturating-f16 —
    InferenceRunner._reduce_nofeat rounds at retention; CLAUDE.md bf16→f16
    lesson); slot: [Σ cb·N] int32 in [0, slot_cap] (slot_cap = trash for
    padding/non-region rows). Sums accumulate per group — concatenating the
    groups first materialized a [total_points, 32] f32 slab (~1 GB at the
    Semantic3D 8M-point scale; div_feats 12.1 → measured much cheaper
    per-group, and no >500 MB single live buffer)."""
    sums = jnp.zeros((slot_cap + 1, groups[0].shape[-1]), jnp.float32)
    cnt = jnp.zeros((slot_cap + 1,), jnp.float32)
    off = 0
    for g in groups:
        rows = g.shape[0] * g.shape[1]
        v = g.reshape(-1, g.shape[-1])
        v = jnp.clip(v.astype(jnp.float32), -6.5e4, 6.5e4).astype(
            jnp.float16).astype(jnp.float32)
        s = jax.lax.dynamic_slice_in_dim(slot, off, rows)
        sums = sums + jax.ops.segment_sum(v, s, num_segments=slot_cap + 1)
        cnt = cnt + jax.ops.segment_sum(
            jnp.ones((rows,), jnp.float32), s, num_segments=slot_cap + 1)
        off += rows
    return sums[:slot_cap] / jnp.maximum(cnt[:slot_cap], 1.0)[:, None]


def _scatter_map(order, j, idx, valid):
    """Host scatter map for one chunk row: (source output rows, target point
    ids). order=None (original-order eval outputs): rows [0, valid) map to
    idx[:valid]. With sorted outputs (make_eval_step(sorted_outputs=True))
    output row r holds input row order[r], so rows with order[r] < valid
    scatter to idx[order[r]] — a 4096-element host fancy-index replaces two
    [B, N]-row device unsort gathers."""
    if order is None:
        return slice(0, int(valid)), idx[:valid]
    oj = order[j]
    src = np.flatnonzero(oj < valid)
    return src, idx[oj[src]]


@functools.lru_cache(maxsize=8)
def _eval_reduced_fn(eval_step, point_unc_mode: str):
    """Forward + transfer-diet reduction in ONE program (one dispatch per
    chunk group instead of two, and the [B, N, C] probs never round-trip
    HBM between programs). Cached on the eval_step OBJECT: runners are
    rebuilt every AL round, and a per-runner jit wrapper would re-trace
    the whole forward each round (measured: prediction 1.5 → 17.7 s at
    200-cloud scale — the trace + compile-cache lookup of the fused
    program costs seconds even when the persistent cache has the binary).

    The tunnel moves ~30-40 MB/s in BOTH directions (measured), so every
    transferred byte is wall-clock: classes travel as uint8
    (num_classes ≤ 255), uncertainty as float16 (values in [0, log C];
    5e-4 relative is far below the bf16 activation noise), features as
    saturating-clipped float16 (bfloat16 activations from an early-round
    model can exceed float16 max — an unclipped cast makes inf penultimate
    features, which poison region-feature means and collapse the FPS
    distance field). On the keep-penult path the f16 output is RETAINED
    on device (half the HBM of the raw activations, identical to the
    value the host path would see after its f16 transfer)."""

    @jax.jit
    def _eval_reduced(state, batch):
        res = eval_step(state, batch)
        probs, feats = res[0], res[1]
        unc = point_uncertainty(probs, point_unc_mode).astype(jnp.float16)
        cls = jnp.argmax(probs, axis=-1).astype(jnp.uint8)
        f16 = jnp.clip(feats.astype(jnp.float32), -6.5e4, 6.5e4).astype(
            jnp.float16)
        if len(res) == 3:
            return cls, unc, f16, res[2]
        return cls, unc, f16

    return _eval_reduced


@dataclasses.dataclass
class CloudInference:
    """Per-cloud outputs of the selection-time forward pass."""

    prob_class: np.ndarray     # [N] int32 argmax class
    uncertainty: np.ndarray    # [N] float32
    penult: np.ndarray         # [N, 32] float16 penultimate features


class InferenceRunner:
    """Chunked whole-cloud inference (the reference's mode='sampling' pass,
    sampler2.py:580-642 + compute_features:313-342 — fused into ONE pass here,
    since both consume the same deterministic eval-mode forward).

    Chunks are stacked `chunk_batch` at a time into one device call (fewer
    dispatches; with a mesh, the stacked chunk axis is the data-parallel
    axis — the TPU analogue of the reference's octant-chunked big-cloud
    inference, SURVEY §5)."""

    def __init__(self, cfg: Config, clouds: List[Cloud], eval_step, state,
                 point_unc_mode: str, seed: int = 0, chunk_batch: int = 0,
                 mesh=None, keep_penult_on_device: bool = False):
        self.cfg = cfg
        self.clouds = {c.name: c for c in clouds}
        self.eval_step = eval_step
        self.state = state
        self.mode = point_unc_mode
        # keep_penult_on_device: don't transfer the [N, 32] penultimate
        # features at all (64 B/point — the prediction phase's largest
        # device→host payload at ~35 MB/s tunnel bandwidth). The per-group
        # device buffers are retained and region-feature means are computed
        # ON DEVICE later via region_feature_means() with an uploaded
        # row→slot map (4 B/point up, [R, 32] f32 down). Single-runner
        # lifetime: buffers free when the runner is dropped. Mesh-
        # compatible: retained buffers keep their batch sharding and the
        # flat segment-mean runs as per-shard partial sums + XLA's
        # sharding-derived reduction (round-3 disabled this under dp;
        # dp selection now keeps the transfer-diet path too).
        self.keep_penult = keep_penult_on_device
        self._penult_groups: List[jax.Array] = []
        self._row_map: Dict[str, np.ndarray] = {}
        # default group size adapts to the chunk size under a ~330k-point
        # per-call budget (capped at 32): small 4096-pt selection chunks
        # group 32-wide (200-cloud prediction 5.38 -> 4.71 s, measured by
        # scripts/bench_chunk_batch.py), while 40960-pt flagship chunks
        # keep the proven cb=8 — larger live buffers risk the platform's
        # >500 MB worker crash (CLAUDE.md)
        self.chunk_batch = chunk_batch or min(
            32, max(8, 327_680 // cfg.num_points))
        self.mesh = mesh
        self.pipe = SamplingPipeline(clouds, cfg, seed=seed)

        self._eval_reduced = _eval_reduced_fn(eval_step, point_unc_mode)

    def _shrink_batch(self, batch):
        """Quantized inference upload — see trainer.shrink_eval_batch
        (36 B/point full-width → 9 on bfloat16 configs)."""
        from ssdr_al_tpu.train.trainer import shrink_eval_batch

        return shrink_eval_batch(batch, self.cfg)

    def run_many(self, clouds: List[Cloud]) -> Dict[str, CloudInference]:
        """Whole-dataset inference with chunk groups spanning CLOUD
        boundaries: at 200-cloud scale (reference S3DIS cloud-count,
        sampler2.py:589-598) per-cloud dispatch costs ~30 ms of host↔device
        round-trip each on this platform — grouping across clouds divides
        the dispatch count by the group size. ALL groups are enqueued
        before any result is converted (eval is per-sample independent:
        running-average BN, per-element pyramid), so the device runs ahead
        of the host conversion loop."""
        m = 1 if self.mesh is None else int(self.mesh.devices.size)
        cb = max((max(self.chunk_batch, m) // m) * m, m)
        flat = []                     # (cloud_name or None, chunk)
        for cloud in clouds:
            for chunk in self.pipe.cloud_chunks(cloud):
                flat.append((cloud.name, chunk))
        groups = [flat[i: i + cb] for i in range(0, len(flat), cb)]
        if groups and len(groups[-1]) < cb:
            pad = groups[-1][-1][1]   # repeat a chunk; results discarded
            groups[-1] = groups[-1] + [(None, pad)] * (cb - len(groups[-1]))
        pending = []
        for g in groups:
            batch = {
                k: np.concatenate([c[0][k] for _, c in g], axis=0)
                for k in g[0][1][0]
            }
            batch = self._shrink_batch(batch)
            if self.mesh is not None:
                from ssdr_al_tpu.parallel.mesh import shard_batch

                batch = shard_batch(batch, self.mesh)
            res = self._eval_reduced(self.state, batch)
            cls, u, f16 = res[0], res[1], res[2]
            order = res[3] if len(res) == 4 else None
            if self.keep_penult:
                self._penult_groups.append(f16)
                f16 = None
            pending.append((g, cls, u, f16, order))
        out = {
            c.name: CloudInference(
                np.zeros(c.num_points, np.int32),
                np.zeros(c.num_points, np.float32),
                None if self.keep_penult
                else np.zeros((c.num_points, 32), np.float16),
            )
            for c in clouds
        }
        if self.keep_penult:
            self._row_map = {
                c.name: np.full(c.num_points, -1, np.int64) for c in clouds
            }
        n = self.cfg.num_points
        for gi, (g, cls, u, feats, order) in enumerate(pending):
            cls, u = np.asarray(cls), np.asarray(u)
            feats = None if feats is None else np.asarray(feats)
            order = None if order is None else np.asarray(order)
            for j, (name, (_, idx, valid)) in enumerate(g):
                if name is None:
                    continue
                o = out[name]
                src, tgt = _scatter_map(order, j, idx, valid)
                o.prob_class[tgt] = cls[j][src]
                o.uncertainty[tgt] = u[j][src]
                if feats is not None:
                    o.penult[tgt] = feats[j][src]
                if self.keep_penult:
                    # flat sorted-row index of each point (LAST assignment
                    # wins, exactly like the scatters above)
                    rows = np.arange(valid) if order is None else src
                    self._row_map[name][tgt] = (gi * cb + j) * n + rows
        return out

    def region_feature_means(self, slot_of_point: Dict[str, np.ndarray],
                             num_slots: int) -> np.ndarray:
        """[num_slots, 32] float32 mean penultimate feature per region slot,
        computed ON DEVICE over the buffers retained by
        keep_penult_on_device (compute_features parity,
        sampler2.py:313-342). slot_of_point: per-cloud int arrays
        [num_points], slot id per point or -1. Transfers one int32 per
        retained row up and [num_slots, 32] f32 down instead of 64 B/point
        down — the decisive trade at ~35 MB/s tunnel bandwidth."""
        if not self._penult_groups:
            raise RuntimeError("run_many(keep_penult_on_device) not run")
        rows = sum(int(g.shape[0]) * int(g.shape[1])
                   for g in self._penult_groups)
        # bucket the slot cap on the geometric ladder so drifting region
        # counts reuse the compiled program (trash slot = slot_cap): 2048s
        # still crossed a boundary as the anchor cap grows per round — one
        # fresh ~11 s segment-sum compile per crossing on this platform
        from ssdr_al_tpu.active.region_graph import _ladder

        slot_cap = _ladder(max(num_slots, 1), _SLOT_LADDER)
        slot = np.full(rows, slot_cap, np.int32)
        for name, sp in slot_of_point.items():
            rm = self._row_map[name]
            pts = np.flatnonzero((sp >= 0) & (rm >= 0))
            slot[rm[pts]] = sp[pts]
        means = _region_means_device(
            tuple(self._penult_groups), jnp.asarray(slot), slot_cap)
        return np.asarray(means)[:num_slots]

    def run(self, cloud: Cloud) -> CloudInference:
        n = cloud.num_points
        prob_class = np.zeros(n, np.int32)
        unc = np.zeros(n, np.float32)
        penult = np.zeros((n, 32), np.float16)
        # stack chunks into fixed-size batches; enqueue ALL device work
        # before converting (per-chunk host syncs would serialize this
        # platform's ~30 ms dispatch round-trip into the loop)
        chunks = list(self.pipe.cloud_chunks(cloud))
        # adaptive group size: largest cb ≤ chunk_batch whose padding waste
        # stays under 20% (a 5-chunk cloud at cb=4 would pad to 8 forwards).
        # With a mesh, cb must also be a multiple of the mesh size so the
        # stacked chunk axis shards evenly over the data axis.
        m = 1 if self.mesh is None else int(self.mesh.devices.size)
        max_cb = (max(self.chunk_batch, m) // m) * m
        cb = m
        for cand in range(max_cb, m - 1, -m):
            if cand > -(-len(chunks) // m) * m:
                continue  # group larger than the whole (mesh-rounded) cloud
            waste = -len(chunks) % cand
            if waste <= max(1, len(chunks)) * 0.2:
                cb = cand
                break
        pending = []
        for s in range(0, len(chunks), cb):
            group = chunks[s : s + cb]
            while len(group) < cb:  # pad with a repeat; results discarded
                group.append(group[-1])
            batch = {
                k: np.concatenate([g[0][k] for g in group], axis=0)
                for k in group[0][0]
            }
            batch = self._shrink_batch(batch)
            if self.mesh is not None:
                from ssdr_al_tpu.parallel.mesh import shard_batch

                batch = shard_batch(batch, self.mesh)
            res = self._eval_reduced(self.state, batch)
            cls, u, f16 = res[0], res[1], res[2]
            order = res[3] if len(res) == 4 else None
            pending.append((chunks[s : s + cb], cls, u, f16, order))
        for group, cls, u, feats, order in pending:
            cls, u, feats = np.asarray(cls), np.asarray(u), np.asarray(feats)
            order = None if order is None else np.asarray(order)
            for j, (_, idx, valid) in enumerate(group):
                src, tgt = _scatter_map(order, j, idx, valid)
                prob_class[tgt] = cls[j][src]
                unc[tgt] = u[j][src]
                penult[tgt] = feats[j][src]
        return CloudInference(prob_class, unc, penult)


# --------------------------------------------------------------------------
# SeedSampler — random precise labeling (sampler2.py:344-408)
# --------------------------------------------------------------------------


class SeedSampler:
    def __init__(self, state: ALState, clouds: List[Cloud], total_num: int,
                 seed: int = 0):
        self.state = state
        self.clouds = {c.name: c for c in clouds}
        self.total_num = total_num
        self.rng = np.random.RandomState(seed)

    def sampling(self, batch_size: int, last_round: int, stats: RoundStats):
        round_dir = self.state.begin_round(last_round, seed_from_superpoint=True)
        total_obj = self.state.load_registry(round_dir)
        self._iteration(round_dir, total_obj, batch_size, stats)

    def _iteration(self, round_dir, total_obj, number, stats):
        remain = 0
        cloud_names = list(total_obj["unlabeled"])
        each = spread_budget_over_clouds(self.rng, self.total_num, number, cloud_names)
        for i, name in enumerate(cloud_names):
            if each[i] == 0:
                continue
            unl = total_obj["unlabeled"][name]
            if len(unl) >= each[i]:
                sp_inds = self.rng.choice(list(unl), int(each[i]), replace=False)
            else:
                sp_inds = list(unl)
                remain += each[i] - len(sp_inds)
            sp = self.state.load_superpoints(name)
            pseudo_gt = self.state.load_pseudo_gt(round_dir, name)
            input_gt = self.clouds[name].labels
            seed_labeling(sp_inds, sp.components, input_gt, pseudo_gt, stats)
            self.state.write_pseudo_gt(round_dir, name, pseudo_gt)
            self.state.mark_labeled(total_obj, name, sp_inds)
        if remain == 0 or not total_obj["unlabeled"]:
            self.state.write_registry(total_obj, round_dir)
        else:
            self._iteration(round_dir, total_obj, remain, stats)


# --------------------------------------------------------------------------
# AllSampler — label everything (baseline / max-dominant, sampler2.py:410-453)
# --------------------------------------------------------------------------


class AllSampler:
    def __init__(self, state: ALState, clouds: List[Cloud], total_num: int,
                 oracle_mode: str = "dominant"):
        self.state = state
        self.clouds = {c.name: c for c in clouds}
        self.total_num = total_num
        self.oracle_mode = oracle_mode

    def sampling(self, batch_size: int, last_round: int, stats: RoundStats,
                 threshold: float = 0.9):
        budget = {"click": batch_size}
        round_dir = self.state.begin_round(
            last_round, seed_from_superpoint=(last_round == 1)
        )
        total_obj = self.state.load_registry(round_dir)
        for name in list(total_obj["unlabeled"]):
            sp = self.state.load_superpoints(name)
            pseudo_gt = self.state.load_pseudo_gt(round_dir, name)
            input_gt = self.clouds[name].labels
            sp_inds = list(total_obj["unlabeled"][name])
            pseudo_gt, used = oracle_labeling(
                sp_inds, sp.components, input_gt, pseudo_gt, stats,
                self.oracle_mode, None, threshold, budget, 1,
                total_obj["selected_class_list"],
            )
            self.state.write_pseudo_gt(round_dir, name, pseudo_gt)
            self.state.mark_labeled(total_obj, name, used)
        self.state.write_registry(total_obj, round_dir)


# --------------------------------------------------------------------------
# RandomSampler (sampler2.py:455-520)
# --------------------------------------------------------------------------


class RandomSampler:
    def __init__(self, state: ALState, clouds: List[Cloud], total_num: int,
                 min_size: int, oracle_mode: str = "dominant", seed: int = 0):
        self.state = state
        self.clouds = {c.name: c for c in clouds}
        self.total_num = total_num
        self.min_size = min_size
        self.oracle_mode = oracle_mode
        self.rng = np.random.RandomState(seed)

    def sampling(self, batch_size: int, last_round: int, stats: RoundStats,
                 threshold: float = 0.9):
        budget = {"click": batch_size}
        round_dir = self.state.begin_round(last_round, from_seed_round=True)
        total_obj = self.state.load_registry(round_dir)
        self._iteration(round_dir, total_obj, stats, threshold, budget)

    def _iteration(self, round_dir, total_obj, stats, threshold, budget):
        cloud_names = list(total_obj["unlabeled"])
        each = spread_budget_over_clouds(
            self.rng, self.total_num, budget["click"], cloud_names
        )
        for i, name in enumerate(cloud_names):
            if each[i] == 0:
                continue
            unl = list(total_obj["unlabeled"][name])
            if len(unl) >= each[i]:
                sp_inds = self.rng.choice(unl, int(each[i]), replace=False)
            else:
                sp_inds = unl
            sp = self.state.load_superpoints(name)
            pseudo_gt = self.state.load_pseudo_gt(round_dir, name)
            input_gt = self.clouds[name].labels
            pseudo_gt, used = oracle_labeling(
                sp_inds, sp.components, input_gt, pseudo_gt, stats,
                self.oracle_mode, None, threshold, budget, self.min_size,
                total_obj["selected_class_list"],
            )
            self.state.write_pseudo_gt(round_dir, name, pseudo_gt)
            self.state.mark_labeled(total_obj, name, used)
        if budget["click"] == 0 or not total_obj["unlabeled"]:
            self.state.write_registry(total_obj, round_dir)
        else:
            self._iteration(round_dir, total_obj, stats, threshold, budget)


# --------------------------------------------------------------------------
# TSampler — uncertainty + diversity reasoning (sampler2.py:522-810)
# --------------------------------------------------------------------------


@dataclasses.dataclass
class TSamplerArgs:
    point_uncertainty_mode: str = "sb"       # lc | entropy | sb
    uncertainty_mode: str = "WetSU"          # mean | sum_weight | WetSU
    oracle_mode: str = "NAIL"                # dominant | NAIL
    class_balance: str = "clsbal"            # "" | classbal | clsbal
    diversity: str = "gcn_fps"               # "" | edcd | gcn | gcn_fps
    threshold: float = 0.9
    min_size: int = 1
    gcn_number: int = 1
    gcn_top: int = 0
    # cap on padded superpoint size for the pairwise chamfer (region_graph);
    # 0 = exact parity (no subsampling, memory grows with max-sp-size²)
    chamfer_cap: int = 512
    # MXU (bf16x3 cross-term) distance build for the chamfer — picks/graph
    # neighbors identical to exact f32 (scripts/bench_chamfer_mxu.py);
    # None = platform default (region_graph.mxu_default / SSDR_CHAMFER_MXU)
    chamfer_mxu: Optional[bool] = None


class TSampler:
    def __init__(self, state: ALState, clouds: List[Cloud], cfg: Config,
                 args: TSamplerArgs, total_num: int, seed: int = 0,
                 mesh=None):
        self.state = state
        self.clouds = clouds
        self.cloud_by_name = {c.name: c for c in clouds}
        self.cfg = cfg
        self.args = args
        self.total_num = total_num
        self.rng = np.random.RandomState(seed)
        self.mesh = mesh  # optional Mesh: selection inference is data-parallel
        self._gt_dom_cache: Dict[str, tuple] = {}
        self._runner = None  # round-lifetime InferenceRunner (device buffers)
        # run-lifetime device-resident superpoint blocks for the diversity
        # chamfer (region_graph.SuperpointBlockCache): superpoint point sets
        # never change within a run, so pad+upload once and gather by index
        # each round instead of re-streaming ~100 MB of padded blocks
        self._block_cache = None
        self.phase_times: Dict[str, float] = {}

    # -------------------------------------------------------- prediction ---
    def prediction(self, eval_step, model_state, total_obj, round_num,
                   stats: RoundStats):
        """One inference pass over all training clouds → scored unlabeled
        regions + labeled-region registry (sampler2.py:580-642)."""
        a = self.args
        runner = InferenceRunner(
            self.cfg, self.clouds, eval_step, model_state,
            a.point_uncertainty_mode, seed=self.rng.randint(1 << 31),
            mesh=self.mesh,
            # penult stays on device for the graph-diversity feature means
            # (skips the 64 B/point transfer); dp selection keeps host penult
            keep_penult_on_device=(a.diversity in ("gcn", "gcn_fps")),
        )
        self._runner = runner
        unc_parts: List[np.ndarray] = []
        cls_parts: List[np.ndarray] = []
        labeled_by_cloud: Dict[str, np.ndarray] = {}

        inference = runner.run_many(list(self.clouds))

        # flat device scoring: ONE call for all clouds (per-cloud segment
        # ids get a running offset) — at 200-cloud scale per-cloud dispatch
        # overhead (~30 ms each on this platform) dominates otherwise
        seg_in, unc_in, cls_in, per_cloud = [], [], [], []
        s_off = 0
        for cloud in self.clouds:
            sp = self.state.load_superpoints(cloud.name)
            s = sp.num_superpoints
            inf = inference[cloud.name]
            seg_in.append(sp.in_component.astype(np.int64) + s_off)
            unc_in.append(inf.uncertainty)
            cls_in.append(inf.prob_class)
            per_cloud.append((cloud.name, sp, s, s_off))
            s_off += s
        runc_all, dom_all = self._score_flat(
            np.concatenate(unc_in), np.concatenate(cls_in),
            np.concatenate(seg_in), s_off, a.uncertainty_mode,
        )

        # flat region table over ALL unlabeled kept regions: cloud ids,
        # sp ids and ONE dominant-point-id arena, no per-region Python
        # objects (the old RegionRef list was O(regions) heap churn per
        # round — it scales with cloud count, VERDICT r3 weak #5)
        cloud_names: List[str] = []
        t_cloud, t_sp, t_arena, t_counts = [], [], [], []
        for name, sp, s, off in per_cloud:
            ci = len(cloud_names)
            cloud_names.append(name)
            inf = inference[name]
            runc = runc_all[off: off + s]
            dom = dom_all[off: off + s]
            # one O(N) pass builds every region's dominant-pred ids —
            # the per-superpoint bincount loop this replaces was the
            # reference's selection hot loop (sampler2.py:612-631)
            ids_flat, counts = dominant_point_ids_flat(
                sp.in_component, s, inf.prob_class, dom
            )
            keep = sp.sizes >= a.min_size
            unl_mask = np.zeros(s, bool)
            unl_list = np.asarray(
                list(total_obj["unlabeled"].get(name, [])), np.int64
            )
            if unl_list.size:
                unl_mask[unl_list] = True
            unl_keep = np.flatnonzero(keep & unl_mask)
            lab_keep = np.flatnonzero(keep & ~unl_mask)
            unc_parts.append(runc[unl_keep])
            cls_parts.append(dom[unl_keep])
            # arena subset for the kept unlabeled regions: one mask pass
            keep_mask = np.zeros(s, bool)
            keep_mask[unl_keep] = True
            seg_of_id = np.repeat(np.arange(s, dtype=np.int64), counts)
            t_arena.append(ids_flat[keep_mask[seg_of_id]])
            t_counts.append(counts[unl_keep])
            t_cloud.append(np.full(len(unl_keep), ci, np.int32))
            t_sp.append(unl_keep.astype(np.int64))
            if lab_keep.size:
                labeled_by_cloud[name] = lab_keep.astype(np.int64)

        def cat(parts, dtype):
            return (np.concatenate(parts) if parts
                    else np.zeros(0, dtype))

        counts_all = cat(t_counts, np.int64)
        offsets = np.zeros(len(counts_all) + 1, np.int64)
        np.cumsum(counts_all, out=offsets[1:])
        table = RegionTable(
            cloud_names, cat(t_cloud, np.int32), cat(t_sp, np.int64),
            np.zeros(len(counts_all), bool), cat(t_arena, np.int64), offsets,
        )

        region_unc = (np.concatenate(unc_parts)
                      if unc_parts else np.zeros(0, np.float32))
        region_class = (np.concatenate(cls_parts).astype(np.int64)
                        if cls_parts else np.zeros(0, np.int64))
        if a.class_balance == "classbal":
            region_unc = add_classbal(self.cfg.num_classes, region_class, region_unc)
        elif a.class_balance == "clsbal":
            region_unc = add_clsbal(
                self.cfg.num_classes, region_class, region_unc,
                total_obj["selected_class_list"],
            )
        sorted_inds = np.argsort(-region_unc)
        return table, sorted_inds, inference, labeled_by_cloud

    def _score_flat(self, unc_in, cls_in, seg_in, total_s: int, mode: str):
        """Device scoring for the whole cloud set in one call, shape-
        bucketed (points to 131072s, segments to 2048s with a reserved
        padding segment) so ragged cloud/superpoint totals reuse a handful
        of compiled programs across rounds."""
        n = seg_in.shape[0]
        n_pad = -(-n // 131072) * 131072
        s_pad = -(-(total_s + 1) // 2048) * 2048  # last id reserved for pad
        unc = np.zeros(n_pad, np.float16)
        unc[:n] = unc_in
        cls = np.zeros(n_pad, np.uint8)
        cls[:n] = cls_in
        seg = np.full(n_pad, s_pad - 1, np.int32)
        seg[:n] = seg_in
        runc, dom = _score_regions_device(
            jnp.asarray(unc), jnp.asarray(cls), jnp.asarray(seg),
            s_pad, self.cfg.num_classes, mode,
        )
        return np.asarray(runc)[:total_s], np.asarray(dom)[:total_s]

    # ------------------------------------------------------------ anchors ---
    def _gt_dominant(self, name):
        """Per-cloud GT dominant labels + flat dominant-id arena, vectorized
        and cached across rounds (GT never changes — the reference recomputes
        them per round per superpoint, sampler2.py:283-297). Returns
        (dom [S], ids [M], offsets [S+1])."""
        hit = self._gt_dom_cache.get(name)
        if hit is None:
            sp = self.state.load_superpoints(name)
            labels = self.cloud_by_name[name].labels
            s = sp.num_superpoints
            dom = gt_dominant_all(
                sp.in_component, s, labels, self.cfg.num_classes
            )
            ids, counts = dominant_point_ids_flat(
                sp.in_component, s, labels, dom
            )
            offsets = np.zeros(s + 1, np.int64)
            np.cumsum(counts, out=offsets[1:])
            hit = (dom, ids, offsets)
            self._gt_dom_cache[name] = hit
        return hit

    def select_labeled_anchors(self, labeled_by_cloud, round_num) -> RegionTable:
        """Class-weighted random anchor sample of labeled superpoints,
        capped at (round_num−1)·1000 (sampler2.py:268-311). Flat table out —
        the anchor count grows with the round cap ((r−1)·1000 reaches 32k by
        round 33), so no per-anchor Python objects here either."""
        names = list(labeled_by_cloud)
        c_parts, s_parts, d_parts = [], [], []
        for ci, name in enumerate(names):
            dom, _, _ = self._gt_dominant(name)
            arr = np.asarray(labeled_by_cloud[name], np.int64)
            d_parts.append(dom[arr])
            s_parts.append(arr)
            c_parts.append(np.full(len(arr), ci, np.int32))
        if not s_parts or sum(len(x) for x in s_parts) == 0:
            return RegionTable.empty()
        from ssdr_al_tpu.active.uncertainty import _class_frequency_weights

        dominant_labels = np.concatenate(d_parts)
        w = _class_frequency_weights(dominant_labels, self.cfg.num_classes)
        p = w / w.sum()
        total = len(dominant_labels)
        batch = min((round_num - 1) * 1000, total)
        sel = self.rng.choice(total, batch, replace=False, p=p)
        cloud_ids = np.concatenate(c_parts)[sel]
        sp_sel = np.concatenate(s_parts)[sel]
        # dominant-id arena for the selected anchors, sliced from the
        # per-cloud GT caches. Vectorized ragged gather (O(clouds) Python,
        # not O(anchors) — the cap reaches 32k rows by round 33): per-cloud
        # scatter of [start, end) slice bounds into row order, then one
        # flat fancy-index into the concatenated per-cloud id arenas.
        # Row order (= arena order) is exactly the sel order, byte-matching
        # the per-row loop this replaces.
        id_parts, base, pos = [], {}, 0
        for ci, name in enumerate(names):
            _, ids_c, _ = self._gt_dominant(name)
            id_parts.append(ids_c)
            base[ci] = pos
            pos += len(ids_c)
        global_ids = (np.concatenate(id_parts) if id_parts
                      else np.zeros(0, np.int64))
        starts = np.zeros(batch, np.int64)
        ends = np.zeros(batch, np.int64)
        for ci, name in enumerate(names):
            m = cloud_ids == ci
            if not m.any():
                continue
            _, _, offs_c = self._gt_dominant(name)
            sps = sp_sel[m]
            starts[m] = offs_c[sps] + base[ci]
            ends[m] = offs_c[sps + 1] + base[ci]
        counts = ends - starts
        offsets = np.zeros(batch + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        total_ids = int(offsets[-1])
        rep = np.repeat(np.arange(batch), counts)
        within = np.arange(total_ids) - np.repeat(offsets[:-1], counts)
        arena = global_ids[starts[rep] + within]
        return RegionTable(names, cloud_ids, sp_sel,
                           np.ones(batch, bool), arena, offsets)

    # ----------------------------------------------------------- sampling ---
    def sampling(self, eval_step, model_state, batch_size, last_round,
                 stats: RoundStats):
        import time

        a = self.args
        budget = {"click": batch_size}
        round_dir = self.state.begin_round(last_round, from_seed_round=True)
        total_obj = self.state.load_registry(round_dir)
        round_num = last_round + 1

        t0 = time.perf_counter()
        table, sorted_inds, inference, labeled_by_cloud = self.prediction(
            eval_step, model_state, total_obj, round_num, stats
        )
        # per-phase wall-clock, for costTime-style logs and the selection
        # profile (the reference logs per-phase times, sampler2.py:677-681)
        self.phase_times = {"prediction_s": time.perf_counter() - t0}
        # the candidate-list size is capped by the number of scored regions,
        # but the click budget keeps its original value (sampler2.py:645-646
        # creates budget BEFORE the cap at :671-672)
        batch_size = min(batch_size, len(table))

        t0 = time.perf_counter()
        if a.diversity == "edcd":
            file_list = self._edcd_selection(table, sorted_inds, batch_size, stats)
        elif a.diversity in ("gcn", "gcn_fps"):
            file_list = self._graph_selection(
                table, sorted_inds, labeled_by_cloud, inference,
                batch_size, round_num, stats,
            )
        else:
            file_list = {}
            for i in sorted_inds[:batch_size]:
                file_list.setdefault(table.cloud_name(i), []).append(
                    int(table.sp_idx[i]))
        self.phase_times["diversity_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        self._record_selection_stats(file_list, total_obj, stats)
        for name, sp_inds in file_list.items():
            sp = self.state.load_superpoints(name)
            pseudo_gt = self.state.load_pseudo_gt(round_dir, name)
            input_gt = self.cloud_by_name[name].labels
            pseudo_gt, used = oracle_labeling(
                sp_inds, sp.components, input_gt, pseudo_gt, stats,
                a.oracle_mode, inference[name].prob_class, a.threshold,
                budget, a.min_size, total_obj["selected_class_list"],
            )
            self.state.write_pseudo_gt(round_dir, name, pseudo_gt)
            self.state.mark_labeled(total_obj, name, used)
        self.state.write_registry(total_obj, round_dir)
        self.phase_times["oracle_s"] = time.perf_counter() - t0
        self._runner = None  # free the retained device penult buffers

    # ------------------------------------------------------------ branches ---
    def _top_candidates(self, table: RegionTable, sorted_inds, batch_size):
        """file_list_top (B best) and per-cloud 2·B candidate pools
        (sampler2.py:533-552 + 697-705), vectorized over table rows.

        Returns (top_counts {name: count}, candidates {name: rank-ordered
        table-row array}). Dict insertion order = first appearance in the
        ranked list (matches the reference's setdefault loop — the order
        keys downstream oracle iteration, which keys budget consumption)."""
        c = len(table.cloud_names)
        top_rows = sorted_inds[:batch_size]
        tc = np.bincount(table.cloud_ids[top_rows], minlength=c)
        # one stable sort groups the ranked list by cloud, preserving rank
        # order within each group (replaces the O(regions) setdefault loop)
        cloud_of_sorted = table.cloud_ids[sorted_inds]
        order = np.argsort(cloud_of_sorted, kind="stable")
        grouped = sorted_inds[order]
        counts_all = np.bincount(cloud_of_sorted, minlength=c)
        starts = np.zeros(c + 1, np.int64)
        np.cumsum(counts_all, out=starts[1:])
        cids, first = np.unique(table.cloud_ids[top_rows], return_index=True)
        top_counts: Dict[str, int] = {}
        candidates: Dict[str, np.ndarray] = {}
        for ci in cids[np.argsort(first)]:
            name = table.cloud_names[ci]
            top_counts[name] = int(tc[ci])
            lim = min(2 * int(tc[ci]), int(counts_all[ci]))
            candidates[name] = grouped[starts[ci]: starts[ci] + lim]
        return top_counts, candidates

    def _edcd_selection(self, table, sorted_inds, batch_size, stats):
        """Per-cloud FPS over ED²+chamfer (sampler2.py:670-685, 554-578)."""
        top_counts, candidates = self._top_candidates(
            table, sorted_inds, batch_size
        )
        stats.extra["before_gcn_file_num"] = len(top_counts)
        file_list: Dict[str, List[int]] = {}
        for name, rows in candidates.items():
            sp_ids = table.sp_idx[rows]
            xyz = self.cloud_by_name[name].xyz
            sp = self.state.load_superpoints(name)
            # cap padded superpoint size (see region_graph.build_region_graph)
            cents, pts, msk = pad_regions_vectorized(
                xyz, [sp.components[s] for s in sp_ids],
                self.args.chamfer_cap or None,
            )
            # exact path on purpose: S here is min(2*top_count, candidates)
            # per cloud — an arbitrary integer that drifts every round, so
            # the fused kernel would pay a fresh Mosaic compile per shape
            # (CLAUDE.md: the compiled-shape set must be CLOSED); the
            # bucketed hot path (build_region_graph) is where the kernel
            # runs
            cd = chamfer_pairwise(jnp.asarray(pts), jnp.asarray(msk))
            sel = np.asarray(farthest_superpoint_sample(
                jnp.asarray(cents), cd, 0, top_counts[name]
            ))
            file_list[name] = [int(sp_ids[i]) for i in sel]
        return file_list

    def _graph_selection(self, table, sorted_inds, labeled_by_cloud,
                         inference, batch_size, round_num, stats):
        """gcn / gcn_fps branches (sampler2.py:687-781)."""
        import time

        from ssdr_al_tpu.active import region_graph as _rg

        a = self.args
        t0 = time.perf_counter()
        top_counts, candidates = self._top_candidates(
            table, sorted_inds, batch_size
        )
        stats.extra["before_gcn_file_num"] = len(top_counts)
        anchors = self.select_labeled_anchors(labeled_by_cloud, round_num)
        sampling_batch = sum(top_counts.values())
        self.phase_times["div_cand_anchor_s"] = time.perf_counter() - t0
        if sampling_batch == 0:
            # exhausted unlabeled pool (late AL rounds): no candidates, so
            # skip the graph/diversity work entirely instead of building an
            # anchors-only graph (the reference crashes at this point —
            # fps_gcn_cpu.py:155)
            return {}
        t0 = time.perf_counter()

        # candidate + anchor count is budget-scaled (2·B + (r−1)·1000 cap),
        # not cloud-count-scaled — the per-region tuples here stay bounded
        # as the dataset grows; dominant ids are arena VIEWS (no copies)
        regions_by_cloud: Dict[str, list] = {}
        for name, rows in candidates.items():
            regs = regions_by_cloud.setdefault(name, [])
            for r in rows:
                regs.append((int(table.sp_idx[r]), False, table.dom_ids(r)))
        for r in range(len(anchors)):
            regions_by_cloud.setdefault(anchors.cloud_name(r), []).append(
                (int(anchors.sp_idx[r]), True, anchors.dom_ids(r))
            )

        cloud_xyz = {n: self.cloud_by_name[n].xyz for n in regions_by_cloud}
        components = {
            n: self.state.load_superpoints(n).components for n in regions_by_cloud
        }
        if self._block_cache is None:
            from ssdr_al_tpu.active.region_graph import SuperpointBlockCache

            mxu = (_rg.mxu_default() if a.chamfer_mxu is None
                   else bool(a.chamfer_mxu))
            self._block_cache = SuperpointBlockCache(
                max_points_per_sp=a.chamfer_cap or None, mesh=self.mesh,
                mxu=mxu)
            # pre-stage EVERY training cloud, not just this round's
            # candidates: a cloud staged in a later round would grow the
            # slab — a new operand shape for the gathered chamfer program
            # (one fresh XLA compile) plus a full slab re-upload
            for c in self.clouds:
                if c.name in regions_by_cloud:
                    continue
                self._block_cache.ensure(
                    c.name, c.xyz,
                    self.state.load_superpoints(c.name).components)
        for n in regions_by_cloud:
            self._block_cache.ensure(n, cloud_xyz[n], components[n])
        self._block_cache.finalize()
        graph = build_region_graph(
            regions_by_cloud, cloud_xyz, components,
            max_points_per_sp=a.chamfer_cap or None,
            cache=self._block_cache, mesh=self.mesh,
            mxu=self._block_cache.mxu,
        )
        for k, v in _rg.LAST_TIMINGS.items():
            self.phase_times[f"div_graph_{k}"] = v
        self.phase_times["div_graph_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()

        # region features: mean penultimate feature over dominant point ids
        # (compute_features, sampler2.py:313-342) — reusing the pass-1
        # features. Preferred path: the runner kept penult ON DEVICE and one
        # segment-mean with an uploaded point→slot map produces all region
        # means (region_feature_means). Fallback (dp selection, direct
        # _graph_selection callers): vectorized host reduceat over the
        # transferred f16 penult.
        unlabeled_flags = np.zeros(graph.num_regions, bool)
        by_cloud: Dict[str, List[int]] = {}
        for i, ref in enumerate(graph.refs):
            unlabeled_flags[i] = not ref.is_labeled
            by_cloud.setdefault(ref.cloud_name, []).append(i)
        runner = getattr(self, "_runner", None)
        if runner is not None and runner.keep_penult:
            slot_maps: Dict[str, np.ndarray] = {}
            for name, idxs in by_cloud.items():
                n_pts = self.cloud_by_name[name].num_points
                sm = np.full(n_pts, -1, np.int64)
                ids = [graph.refs[i].dominant_point_ids for i in idxs]
                lens = np.fromiter((len(x) for x in ids), np.int64,
                                   count=len(ids))
                sm[np.concatenate(ids)] = np.repeat(
                    np.asarray(idxs, np.int64), lens)
                slot_maps[name] = sm
            feats = runner.region_feature_means(
                slot_maps, graph.num_regions)
        else:
            feats = np.zeros((graph.num_regions, 32), np.float32)
            for name, idxs in by_cloud.items():
                pen = inference.get(name)
                if pen is None:
                    # anchor cloud not among candidate clouds (anchors live
                    # in labeled clouds, which were all inferred)
                    raise RuntimeError(f"missing inference for {name}")
                ids = [graph.refs[i].dominant_point_ids for i in idxs]
                lens = np.array([len(x) for x in ids], np.int64)
                offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
                rows = pen.penult[np.concatenate(ids)].astype(np.float32)
                sums = np.add.reduceat(rows, offsets, axis=0)
                feats[np.asarray(idxs)] = sums / lens[:, None]

        self.phase_times["div_feats_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        try:
            if a.diversity == "gcn_fps":
                return gcn_fps_sampling(
                    graph, feats, unlabeled_flags, sampling_batch,
                    gcn_number=a.gcn_number, gcn_top=a.gcn_top, rng=self.rng,
                )
            return gcn_sampling(
                graph, feats, unlabeled_flags, sampling_batch,
                seed=int(self.rng.randint(1 << 31)),
            )
        finally:
            self.phase_times["div_gcn_s"] = time.perf_counter() - t0

    def _record_selection_stats(self, file_list, total_obj, stats):
        """w['gcn_file_num'/'gcn_sp_num'/'gcn_unlabel_num'] (sampler2.py:765-772)."""
        stats.extra["gcn_file_num"] = len(file_list)
        stats.extra["gcn_sp_num"] = sum(len(v) for v in file_list.values())
        n_unl = 0
        for name, sps in file_list.items():
            unl = total_obj["unlabeled"].get(name, ())
            n_unl += sum(1 for s in sps if s in unl)
        stats.extra["gcn_unlabel_num"] = n_unl
