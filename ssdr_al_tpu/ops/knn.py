"""Batched exact k-nearest-neighbors on TPU.

TPU-native replacement for the reference's OpenMP/nanoflann CPU extension
(N1 in SURVEY.md: SSDR_AL_s3dis/utils/nearest_neighbors/knn_.cxx:21-45, exposed as
`nearest_neighbors.knn_batch(pts, queries, K, omp=True)` and consumed by
`DataProcessing.knn_search` in helper_tool.py:173-183).

Semantics: for each query point return the indices of its `k` nearest support
points by Euclidean distance, sorted ascending. The reference builds a KD-tree
per cloud on the host; on TPU the right shape is a *tiled brute-force* search —
the distance computation is a matmul-like contraction that maps onto the
MXU/VPU, and blocks of the O(Nq·Ns) distance matrix are never materialized in
HBM. Two engines:

  knn_xla     — chunked distances + jax.lax.top_k merge. Robust, fast, default.
  knn_pallas  — hand-tiled Pallas kernel (distance tiles on the VPU, running
                top-k maintained in VMEM scratch). For the hot 40960² layer-0
                search inside the model forward.

Both engines are exact and validated against a numpy oracle
(tests/test_knn.py), matching the reference's exact-KNN behavior.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_BIG = -1e30  # sentinel for padded support slots (in negated-distance space)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# XLA engine
# ---------------------------------------------------------------------------


def _topk_merge_scan(query_c, support, sq_norm_s, k, support_chunk):
    """Top-k over support for one query chunk, scanning support in chunks.

    query_c: [Qc, 3]; support: [Ns_pad, 3] (padded rows pushed to +inf distance
    via sq_norm_s sentinel); returns (neg_d2 [Qc, k], idx [Qc, k])."""
    qc = query_c.shape[0]
    ns = support.shape[0]
    num_chunks = ns // support_chunk

    sq_norm_q = jnp.sum(query_c * query_c, axis=-1, keepdims=True)  # [Qc, 1]

    def body(carry, i):
        best_v, best_i = carry
        start = i * support_chunk
        s = jax.lax.dynamic_slice_in_dim(support, start, support_chunk, axis=0)
        sn = jax.lax.dynamic_slice_in_dim(sq_norm_s, start, support_chunk, axis=0)
        # negated squared distance: 2 q·s − |q|² − |s|²  (larger = closer)
        cross = jnp.dot(query_c, s.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        neg_d2 = 2.0 * cross - sq_norm_q - sn[None, :]
        idx = start + jax.lax.broadcasted_iota(jnp.int32, (qc, support_chunk), 1)
        merged_v = jnp.concatenate([best_v, neg_d2], axis=1)
        merged_i = jnp.concatenate([best_i, idx], axis=1)
        new_v, sel = jax.lax.top_k(merged_v, k)
        new_i = jnp.take_along_axis(merged_i, sel, axis=1)
        return (new_v, new_i), None

    init_v = jnp.full((qc, k), _NEG_BIG, dtype=jnp.float32)
    init_i = jnp.zeros((qc, k), dtype=jnp.int32)
    (best_v, best_i), _ = jax.lax.scan(body, (init_v, init_i), jnp.arange(num_chunks))
    return best_v, best_i


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _knn_xla_single(support, query, k, query_chunk, support_chunk):
    """support [Ns,3], query [Nq,3] → idx [Nq,k] int32 (ascending distance)."""
    ns, nq = support.shape[0], query.shape[0]
    ns_pad = _round_up(ns, support_chunk)
    nq_pad = _round_up(nq, query_chunk)

    support_p = jnp.pad(support, ((0, ns_pad - ns), (0, 0)))
    # padded support rows get +inf squared norm → never selected
    sq_norm_s = jnp.sum(support_p * support_p, axis=-1)
    sq_norm_s = jnp.where(
        jnp.arange(ns_pad) < ns, sq_norm_s, jnp.float32(-_NEG_BIG)
    )
    query_p = jnp.pad(query, ((0, nq_pad - nq), (0, 0)))

    q_chunks = query_p.reshape(nq_pad // query_chunk, query_chunk, 3)
    fn = lambda qc: _topk_merge_scan(qc, support_p, sq_norm_s, k, support_chunk)
    best_v, best_i = jax.lax.map(fn, q_chunks)
    idx = best_i.reshape(nq_pad, k)[:nq]
    return idx


def knn_xla(support, query, k, *, query_chunk=2048, support_chunk=4096):
    """Batched exact KNN. support [B,Ns,3], query [B,Nq,3] → [B,Nq,k] int32.

    Neighbor indices are sorted by ascending distance (ties: ascending index
    is NOT guaranteed — same as the reference's nanoflann backend)."""
    support = jnp.asarray(support, jnp.float32)
    query = jnp.asarray(query, jnp.float32)
    squeeze = support.ndim == 2
    if squeeze:
        support, query = support[None], query[None]
    ns = support.shape[1]
    support_chunk = min(support_chunk, _round_up(ns, 128))
    query_chunk = min(query_chunk, _round_up(query.shape[1], 128))
    out = jax.vmap(
        lambda s, q: _knn_xla_single(s, q, k, query_chunk, support_chunk)
    )(support, query)
    return out[0] if squeeze else out


# ---------------------------------------------------------------------------
# Pallas engine
# ---------------------------------------------------------------------------


def _knn_kernel(qx_ref, sx_ref, out_i_ref, best_v, best_i, *, k, ts, ns_real):
    """One grid step = one query tile against the full support (looped in TS tiles).

    qx_ref: [TQ, 128] query xyz padded on lanes (x,y,z in lanes 0..2).
    sx_ref: [Ns_pad, 128] support xyz padded likewise (full array in VMEM).
    best_v/best_i: [TQ, k] VMEM scratch holding the running top-k.
    """
    tq = qx_ref.shape[0]
    qx = qx_ref[:, 0:1]  # [TQ, 1]
    qy = qx_ref[:, 1:2]
    qz = qx_ref[:, 2:3]

    best_v[:] = jnp.full((tq, k), _NEG_BIG, dtype=jnp.float32)
    best_i[:] = jnp.zeros((tq, k), dtype=jnp.int32)

    num_s_tiles = sx_ref.shape[0] // ts

    def s_tile(si, _):
        start = si * ts
        s = sx_ref[pl.ds(start, ts), :]  # [TS, 128]
        sxr = s[:, 0].reshape(1, ts)
        syr = s[:, 1].reshape(1, ts)
        szr = s[:, 2].reshape(1, ts)
        dx = qx - sxr
        dy = qy - syr
        dz = qz - szr
        neg_d2 = -(dx * dx + dy * dy + dz * dz)  # [TQ, TS]
        cand_i = start + jax.lax.broadcasted_iota(jnp.int32, (tq, ts), 1)
        # mask padded support rows
        neg_d2 = jnp.where(cand_i < ns_real, neg_d2, _NEG_BIG)

        # merge candidate tile into running top-k by k-step extraction
        def extract(t, carry):
            cand_v, bv, bi = carry
            m = jnp.max(cand_v, axis=1, keepdims=True)          # [TQ, 1]
            am = jnp.argmax(cand_v, axis=1)                     # [TQ]
            sel = jax.lax.broadcasted_iota(jnp.int32, (tq, ts), 1) == am[:, None]
            gi = jnp.sum(jnp.where(sel, cand_i, 0), axis=1, keepdims=True)  # [TQ,1]
            # current worst of the running top-k is column t..k-1 region;
            # we rebuild best arrays by comparing against column-wise mins.
            worst = bv[:, k - 1 : k]                            # [TQ, 1]
            take = m > worst
            # insert (m, gi) into sorted-desc (bv, bi) rows where take
            ins_v = jnp.where(take, m, worst)
            ins_i = jnp.where(take, gi, bi[:, k - 1 : k])
            merged_v = jnp.concatenate([bv[:, : k - 1], ins_v], axis=1)
            merged_i = jnp.concatenate([bi[:, : k - 1], ins_i], axis=1)
            # one bubble pass restores sorted-desc order (new element sinks
            # from the tail toward its slot; k passes total across t-loop
            # guarantee full order on exit)
            bv2, bi2 = _bubble_desc(merged_v, merged_i, k)
            # knock the extracted candidate out of the tile
            cand_v = jnp.where(sel, _NEG_BIG, cand_v)
            return cand_v, bv2, bi2

        bv, bi = best_v[:], best_i[:]
        _, bv, bi = jax.lax.fori_loop(
            0, k, extract, (neg_d2, bv, bi), unroll=True
        )
        best_v[:] = bv
        best_i[:] = bi
        return ()

    jax.lax.fori_loop(0, num_s_tiles, s_tile, (), unroll=False)
    out_i_ref[:] = best_i[:]


def _bubble_desc(v, i, k):
    """One full bubble pass keeping rows of v sorted descending (i follows)."""
    for c in range(k - 1, 0, -1):
        a_v, b_v = v[:, c - 1 : c], v[:, c : c + 1]
        a_i, b_i = i[:, c - 1 : c], i[:, c : c + 1]
        swap = b_v > a_v
        new_a_v = jnp.where(swap, b_v, a_v)
        new_b_v = jnp.where(swap, a_v, b_v)
        new_a_i = jnp.where(swap, b_i, a_i)
        new_b_i = jnp.where(swap, a_i, b_i)
        parts_v = [new_a_v, new_b_v]
        parts_i = [new_a_i, new_b_i]
        if c > 1:
            parts_v.insert(0, v[:, : c - 1])
            parts_i.insert(0, i[:, : c - 1])
        if c + 1 < k:
            parts_v.append(v[:, c + 1 :])
            parts_i.append(i[:, c + 1 :])
        v = jnp.concatenate(parts_v, axis=1)
        i = jnp.concatenate(parts_i, axis=1)
    return v, i


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _knn_pallas_single(support, query, k, tq, ts):
    ns, nq = support.shape[0], query.shape[0]
    ns_pad = _round_up(ns, ts)
    nq_pad = _round_up(nq, tq)
    # lane-pad xyz to 128 so tiles are aligned
    sp = jnp.zeros((ns_pad, 128), jnp.float32).at[:ns, :3].set(support)
    qp = jnp.zeros((nq_pad, 128), jnp.float32).at[:nq, :3].set(query)

    kernel = functools.partial(_knn_kernel, k=k, ts=ts, ns_real=ns)
    out = pl.pallas_call(
        kernel,
        grid=(nq_pad // tq,),
        in_specs=[
            pl.BlockSpec((tq, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ns_pad, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq_pad, k), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tq, k), jnp.float32),
            pltpu.VMEM((tq, k), jnp.int32),
        ],
    )(qp, sp)
    return out[:nq]


def knn_pallas(support, query, k, *, tile_q=256, tile_s=512):
    """Pallas-tiled exact KNN; same contract as knn_xla."""
    support = jnp.asarray(support, jnp.float32)
    query = jnp.asarray(query, jnp.float32)
    squeeze = support.ndim == 2
    if squeeze:
        support, query = support[None], query[None]
    out = jax.vmap(
        lambda s, q: _knn_pallas_single(s, q, k, tile_q, tile_s)
    )(support, query)
    return out[0] if squeeze else out


def knn(support, query, k, *, engine="xla", **kw):
    """Drop-in equivalent of the reference's DP.knn_search (helper_tool.py:173-183)."""
    if engine == "xla":
        return knn_xla(support, query, k, **kw)
    if engine == "pallas":
        return knn_pallas(support, query, k, **kw)
    raise ValueError(f"unknown knn engine {engine!r}")
