"""Parameter-free GCN-FPS diversity reasoning (the full SSDR method's default).

Parity port of fps_gcn_cpu.py / fps_gcn_cuda.py:
  adjacency    A = D⁻¹(S−I)+I with S = exp(−(ED+CD))      (fps_adj_all:40-117)
  top-k sparse optional row-wise top-gcn_top mask          (GCN_FPS_sampling:153-160)
  propagation  V_combined = Σ_{i=0..hops} Aⁱ V             (:162-167)
  selection    farthest-feature sampling over unlabeled     (:119-147, 169-170)

The adjacency is block-diagonal by cloud (see region_graph.py), so the
propagation is a batched per-block matmul on the MXU instead of the
reference's global dense numpy matmul.
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ssdr_al_tpu.active.region_graph import (
    RegionGraph,
    flat_to_blocks,
)
from ssdr_al_tpu.ops.fps import farthest_feature_sample


@functools.partial(jax.jit, static_argnums=(2,))
def _normalize_adjacency(ed_cd, mask, gcn_top: int):
    """S = exp(−(ED+CD)) masked → A = (S−I)·diag(1/rowsum(S−I)) + I.

    Matches fps_gcn_cpu.py:102-116 including the *column* scaling by row sums
    (adj @ diag(d_inv)) and inf→0 guard. gcn_top > 0 applies the row-wise
    top-k mask of GCN_FPS_sampling:153-160 (before normalization, as there).
    """
    s = jnp.exp(-ed_cd)                                     # [C, S, S]
    pair_mask = mask[:, :, None] & mask[:, None, :]
    s = jnp.where(pair_mask, s, 0.0)
    eye = jnp.eye(s.shape[-1], dtype=s.dtype)[None]
    adj = s - eye * mask[:, :, None]                        # S − I on valid diag

    if gcn_top > 0:
        # keep the gcn_top largest entries per row
        thresh = jax.lax.top_k(adj, gcn_top)[0][..., -1:]  # kth-largest per row
        keep = adj >= thresh
        adj = jnp.where(keep, adj, 0.0)

    row_sum = jnp.sum(adj, axis=-1)                         # [C, S]
    d_inv = jnp.where(row_sum != 0, 1.0 / row_sum, 0.0)
    adj = adj * d_inv[:, None, :]                           # column scaling
    adj = adj + eye * mask[:, :, None]
    return adj


@functools.partial(jax.jit, static_argnums=(3,))
def _propagate(adj, feats, mask, hops: int):
    """V_combined = Σ_{i=0..hops} Aⁱ V per block (fps_gcn_cpu.py:162-167)."""
    feats = jnp.where(mask[:, :, None], feats, 0.0)
    total = feats
    v = feats
    for _ in range(hops):
        v = jnp.einsum(
            "cij,cjd->cid", adj, v, precision=jax.lax.Precision.HIGHEST
        )
        total = total + v
    return total


# candidate-count ladder for the fused program: power-of-two rungs keep
# the compiled-shape set closed as the anchor cap grows (r−1)·1000/round —
# 256-multiples recompiled the FPS program EVERY round (CLAUDE.md:
# shape-bucket every jitted operand in multi-round host loops)
_M_LADDER = (512, 1024, 2048, 4096, 8192, 16384, 32768, 65536)


def _m_rung(m: int) -> int:
    for v in _M_LADDER:
        if v >= m:
            return v
    return -(-m // 65536) * 65536


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def _gcn_fps_device(ed_cd, mask, blocks, cand_blk, cand_slot, start,
                    gcn_top: int, hops: int, sample_number: int):
    """The whole diversity-reasoning compute as ONE device program:
    adjacency normalization → feature propagation → candidate gather →
    greedy farthest-feature loop. The split form (3 dispatches + a [N, D]
    download + re-upload around a host gather) cost ~1.3 s/round at
    200-cloud scale on this platform's ~30 ms dispatch / ~35 MB/s tunnel;
    fused, only ed_cd/blocks travel up and sample_number int32 come back.
    cand_blk/cand_slot [M_pad] map candidate rows into the padded blocks;
    rows with cand_blk < 0 are padding (never selected)."""
    adj = _normalize_adjacency(ed_cd, mask, gcn_top)
    combined = _propagate(adj, blocks, mask, hops)
    valid = cand_blk >= 0
    feats_sel = combined[jnp.maximum(cand_blk, 0), cand_slot]
    return farthest_feature_sample(feats_sel, start, sample_number, valid)


def gcn_fps_sampling(
    graph: RegionGraph,
    features: np.ndarray,
    unlabeled_flags: np.ndarray,
    sampling_batch: int,
    *,
    gcn_number: int = 1,
    gcn_top: int = 0,
    rng: np.random.RandomState = None,
) -> Dict[str, List[int]]:
    """GCN_FPS_sampling (fps_gcn_cpu.py:150-178).

    features: [N, D] flat region features (penultimate means);
    unlabeled_flags: [N] bool — True rows are selectable candidates.
    Returns {cloud_name: [sp_idx]} of selected regions.
    """
    rng = rng or np.random.RandomState()
    if not np.any(unlabeled_flags) or sampling_batch <= 0:
        # exhausted pool (late AL rounds can drain every unlabeled
        # superpoint): nothing to select. The reference crashes here
        # (np.random.randint(0, 0) in fps_gcn_cpu.py:155) — returning an
        # empty selection lets the driver finish the horizon instead.
        return {}
    blocks = flat_to_blocks(graph, np.asarray(features, np.float32))

    unl_idx = np.where(unlabeled_flags)[0]
    sampling_batch = min(sampling_batch, len(unl_idx))
    start = rng.randint(0, len(unl_idx))
    m = len(unl_idx)
    m_pad = _m_rung(m)
    cand_blk = np.full(m_pad, -1, np.int32)
    cand_slot = np.zeros(m_pad, np.int32)
    cand_blk[:m] = graph.block_of[unl_idx]
    cand_slot[:m] = graph.slot_of[unl_idx]
    sel = np.asarray(_gcn_fps_device(
        jnp.asarray(graph.ed_cd), jnp.asarray(graph.mask),
        jnp.asarray(blocks), jnp.asarray(cand_blk), jnp.asarray(cand_slot),
        int(start), int(gcn_top), int(gcn_number), int(sampling_batch),
    ))
    file_list: Dict[str, List[int]] = {}
    for i in unl_idx[sel]:
        ref = graph.refs[i]
        file_list.setdefault(ref.cloud_name, []).append(ref.sp_idx)
    return file_list
