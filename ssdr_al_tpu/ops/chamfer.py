"""Pairwise chamfer distance between padded superpoints, on device.

TPU-native replacement for BOTH reference chamfer paths (N5 in SURVEY.md):
  - the CUDA kernel (SSRD_AL_semantic3d/chamfer3D/chamfer3D.cu + dist_chamfer_3D.py)
  - the CPU KDTree fallback (`create_cd`/`chamfer_distance`, fps_gcn_cpu.py:12-38).

Semantics (fps_gcn_cpu.py:12-24): for clouds i, j (already centered by their
bbox centroid by the caller),
    cd[i, j] = mean_{p∈i} min_{q∈j} ||p−q||  +  mean_{q∈j} min_{p∈i} ||p−q||
with cd[i, i] = 0. Distances are Euclidean (not squared).

Ragged superpoints are padded to a fixed P with a validity mask; the inner
min/mean reductions ignore padding. The O(S²·P²) distance computation is
blocked so only [P, chunk·P] tiles are live at once, and the cross terms ride
the MXU as one batched matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e30


@functools.partial(jax.jit, static_argnums=(2,))
def chamfer_pairwise(points, mask, row_chunk=8):
    """points: [S, P, 3] float32 (centered); mask: [S, P] bool.
    Returns cd: [S, S] float32 with zero diagonal.

    row_chunk: number of source clouds processed per scan step. The target
    side is ALSO chunked so the live distance block
    [row_chunk, P, target_chunk, P] stays under ~128 MB regardless of S·P —
    at S=512/P=512 an unchunked [1, P, S, P] block is 537 MB plus XLA
    temporaries, which crashed the TPU worker (huge-anchor AL rounds).
    Chunking is value-identical: per-target mins/means decompose over
    target chunks.
    """
    points = jnp.asarray(points, jnp.float32)
    s, p, _ = points.shape
    s_pad = ((s + row_chunk - 1) // row_chunk) * row_chunk
    pts = jnp.pad(points, ((0, s_pad - s), (0, 0), (0, 0)))
    msk = jnp.pad(mask, ((0, s_pad - s), (0, 0)))

    counts = jnp.maximum(jnp.sum(msk, axis=1), 1).astype(jnp.float32)  # [S]

    # target chunk: keep row_chunk·P·tc·P f32 ≤ ~128 MB, tc | s_pad
    budget = 128 * 1024 * 1024 // 4
    tc = max(1, min(s_pad, budget // max(row_chunk * p * p, 1)))
    while s_pad % tc:
        tc -= 1

    def body(_, ci):
        start = ci * row_chunk
        a = jax.lax.dynamic_slice_in_dim(pts, start, row_chunk, axis=0)    # [rc,P,3]
        a_msk = jax.lax.dynamic_slice_in_dim(msk, start, row_chunk, axis=0)
        a_counts = jax.lax.dynamic_slice_in_dim(counts, start, row_chunk, axis=0)

        def tbody(_, tj):
            t0 = tj * tc
            t_pts = jax.lax.dynamic_slice_in_dim(pts, t0, tc, axis=0)
            t_msk = jax.lax.dynamic_slice_in_dim(msk, t0, tc, axis=0)
            t_counts = jax.lax.dynamic_slice_in_dim(counts, t0, tc, axis=0)
            flat = t_pts.reshape(tc * p, 3)
            # broadcast-subtraction distances: exact f32 on the VPU, the
            # SAME form every KNN kernel here uses. (The previous K=3
            # HIGHEST-precision einsum was the only MXU matmul in the AL
            # path and coincided with repeated TPU-worker kernel faults.)
            dx = a[:, :, 0][:, :, None] - flat[:, 0][None, None, :]
            dy = a[:, :, 1][:, :, None] - flat[:, 1][None, None, :]
            dz = a[:, :, 2][:, :, None] - flat[:, 2][None, None, :]
            d2 = dx * dx + dy * dy + dz * dz            # [rc, P, tc*P]
            d2 = jnp.where(t_msk.reshape(tc * p)[None, None, :], d2, _BIG)
            d2 = d2.reshape(row_chunk, p, tc, p)
            dmin_ab = jnp.sqrt(jnp.min(d2, axis=-1))        # [rc, P, tc]
            dmin_ab = jnp.where(a_msk[:, :, None], dmin_ab, 0.0)
            mean_ab = jnp.sum(dmin_ab, axis=1) / a_counts[:, None]
            d2_ba = jnp.where(a_msk[:, :, None, None], d2, _BIG)
            dmin_ba = jnp.sqrt(jnp.min(d2_ba, axis=1))      # [rc, tc, P]
            dmin_ba = jnp.where(t_msk[None, :, :], dmin_ba, 0.0)
            mean_ba = jnp.sum(dmin_ba, axis=-1) / t_counts[None, :]
            return None, mean_ab + mean_ba                  # [rc, tc]

        _, cols = jax.lax.scan(tbody, None, jnp.arange(s_pad // tc))
        # cols: [s_pad/tc, rc, tc] → [rc, s_pad]
        return None, jnp.transpose(cols, (1, 0, 2)).reshape(row_chunk, s_pad)

    _, rows = jax.lax.scan(body, None, jnp.arange(s_pad // row_chunk))
    cd = rows.reshape(s_pad, s_pad)[:s, :s]
    return cd * (1.0 - jnp.eye(s, dtype=cd.dtype))


@functools.partial(jax.jit, static_argnums=(3,))
def chamfer_pairwise_blocks_gathered(points_all, mask_all, idx, row_chunk=8):
    """chamfer_pairwise_blocks over blocks GATHERED on device from a
    resident slab: points_all [R, P, 3], mask_all [R, P], idx [C, S] int32
    rows into R (a trailing all-False trash row absorbs padding slots).
    Returns [C, S, S].

    The slab stays in HBM across AL rounds (superpoint point sets are
    static for a whole run) so a selection round uploads only `idx` —
    a few KB — instead of re-streaming [C, S, P, 3] float32 blocks over a
    ~25 MB/s host link (region_graph.SuperpointBlockCache)."""
    pts = points_all[idx]                       # [C, S, P, 3]
    msk = mask_all[idx]                         # [C, S, P]
    return jax.lax.map(
        lambda args: chamfer_pairwise(args[0], args[1], row_chunk),
        (pts, msk),
    )


@functools.lru_cache(maxsize=32)
def _gathered_dp_fn(mesh, row_chunk: int, axis_name: str):
    """Cached jitted shard_map of the gathered chamfer: the block axis C is
    sharded over the mesh (each device gathers + reduces its own blocks
    from the replicated slab), the [C, S, S] result shards the same way.
    Rebuilding jit(shard_map(...)) per call would recompile every round —
    cache per (mesh, row_chunk)."""
    from jax.sharding import PartitionSpec as P

    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # older jax
        from jax.experimental.shard_map import shard_map

    def body(points_all, mask_all, idx):
        return chamfer_pairwise_blocks_gathered(
            points_all, mask_all, idx, row_chunk)

    sm = shard_map(body, mesh=mesh,
                   in_specs=(P(), P(), P(axis_name)),
                   out_specs=P(axis_name))
    return jax.jit(sm)


@functools.lru_cache(maxsize=32)
def _blocks_dp_fn(mesh, row_chunk: int, axis_name: str):
    """Cached jitted shard_map of the streaming blocked chamfer (block axis
    sharded over the mesh)."""
    from jax.sharding import PartitionSpec as P

    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # older jax
        from jax.experimental.shard_map import shard_map

    def body(points, mask):
        return chamfer_pairwise_blocks(points, mask, row_chunk)

    sm = shard_map(body, mesh=mesh,
                   in_specs=(P(axis_name), P(axis_name)),
                   out_specs=P(axis_name))
    return jax.jit(sm)


def chamfer_pairwise_blocks_gathered_dp(points_all, mask_all, idx, mesh,
                                        row_chunk=8, axis_name="data"):
    """Data-parallel chamfer_pairwise_blocks_gathered: the C chamfer blocks
    of one dispatch are embarrassingly parallel, so shard the block axis
    over the data mesh (the distributed diversity phase — the reference has
    no distributed anything, SURVEY §2.3; this is the TPU-native scaling
    story for selection beyond the prediction pass). Requires
    C % mesh-size == 0 (region_graph dispatches fixed chunks of 8)."""
    return _gathered_dp_fn(mesh, row_chunk, axis_name)(
        points_all, mask_all, idx)


def chamfer_pairwise_blocks_dp(points, mask, mesh, row_chunk=8,
                               axis_name="data"):
    """Data-parallel chamfer_pairwise_blocks (streaming path)."""
    return _blocks_dp_fn(mesh, row_chunk, axis_name)(points, mask)


@functools.partial(jax.jit, static_argnums=(2,))
def chamfer_pairwise_blocks(points, mask, row_chunk=8):
    """Batched chamfer_pairwise over per-cloud blocks in ONE device call.

    points: [C, S, P, 3] float32 (centered); mask: [C, S, P] bool.
    Returns [C, S, S]. Blocks are processed sequentially on device
    (lax.map = scan), so live memory stays at one block's working set while
    the host pays a single dispatch instead of C round-trips (~30 ms each
    on this platform — the reason region_graph batches all clouds)."""

    def one(args):
        pts, msk = args
        return chamfer_pairwise(pts, msk, row_chunk)

    return jax.lax.map(one, (points, mask))


def pad_superpoints(sp_points_list, max_points=None):
    """Host helper: ragged list of [Pi, 3] arrays → ([S, P, 3], [S, P] mask).

    Clouds are centered by their *bbox* centroid (min+max)/2, matching
    sampler2.py:570-573 / fps_gcn_cpu.py:87-89. If max_points caps P, clouds
    larger than the cap are uniformly subsampled (a controlled approximation —
    pass None for exact parity with the reference).
    """
    import numpy as np

    s = len(sp_points_list)
    sizes = [len(x) for x in sp_points_list]
    p = max(sizes)
    if max_points is not None and p > max_points:
        p = max_points
    pts = np.zeros((s, p, 3), np.float32)
    msk = np.zeros((s, p), bool)
    for i, x in enumerate(sp_points_list):
        x = np.asarray(x, np.float32)
        center = (x.min(axis=0) + x.max(axis=0)) / 2.0
        x = x - center
        if len(x) > p:
            sel = np.linspace(0, len(x) - 1, p).astype(np.int64)
            x = x[sel]
        pts[i, : len(x)] = x
        msk[i, : len(x)] = True
    return pts, msk
