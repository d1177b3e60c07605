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
from jax.experimental import pallas as pl

_BIG = 1e30


def _split_bf16(x):
    """f32 → (hi, lo) bf16 parts with hi + lo ≈ x to ~16 mantissa bits.

    The split is done by BITCAST TRUNCATION (zero the low 16 mantissa
    bits), not by a bf16 convert round-trip: this platform's XLA folds
    `convert_f32(convert_bf16(x)) → x`, which silently turns the naive
    `lo = x − f32(bf16(x))` into exactly 0 and collapses the whole bf16x3
    algorithm into a single bf16 matmul (measured: the in-graph
    round-trip split produced results BITWISE equal to a plain
    DEFAULT-precision f32 dot, abs err 3.2e-3; the bitcast split survives
    and restores the studied 1e-5-scale error). Rounding: adding 0x8000
    before masking rounds half-away-from-zero instead of truncating —
    plain truncation biases every residual the same direction and the
    systematic part survives the chamfer means (measured 16× worse cd
    error: rel p99 4.7e-4 truncated vs 2.2e-5 rounded). The rounded hi has
    zero low mantissa bits, so it is exactly bf16-representable and its
    convert is exact."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi_f = jax.lax.bitcast_convert_type(
        (bits + jnp.uint32(0x8000)) & jnp.uint32(0xFFFF0000), jnp.float32)
    return hi_f.astype(jnp.bfloat16), (x - hi_f).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnums=(2, 3))
def chamfer_pairwise(points, mask, row_chunk=8, mxu=False):
    """points: [S, P, 3] float32 (centered); mask: [S, P] bool.
    Returns cd: [S, S] float32 with zero diagonal.

    row_chunk: number of source clouds processed per scan step. The target
    side is ALSO chunked so the live distance block
    [row_chunk, P, target_chunk, P] stays under ~128 MB regardless of S·P —
    at S=512/P=512 an unchunked [1, P, S, P] block is 537 MB plus XLA
    temporaries, which crashed the TPU worker (huge-anchor AL rounds).
    Chunking is value-identical: per-target mins/means decompose over
    target chunks.

    mxu=True builds the distance block on the systolic array instead of the
    VPU: d² = |a|² + |b|² − 2a·b with the cross term as ONE K=9 bf16 matmul
    using a manual hi/lo split (the bf16_3x algorithm — a·b ≈ a_hi·b_hi +
    a_hi·b_lo + a_lo·b_hi, f32 accumulation; the dropped lo·lo term is
    ~2⁻¹⁶ relative). Norms stay exact f32 on the VPU, so only the cross
    term carries bf16x3 error. Measured numerics (scripts/bench_chamfer_mxu.py,
    2 seeds, 96 superpoints): cd rel-err mean 4e-6 / p99 2.2e-5 / max 5.1e-5,
    FPS pick overlap 1.0, top-8 graph-neighbor agreement 1.0 vs exact —
    in contrast to P-cap shrinking, which was measurably lossy
    (bench_chamfer_cap.py: cap 256 → overlap 0.79). The HIGHEST-precision
    K=3 einsum (XLA's own bf16_6x expansion) is NOT used: it coincided with
    repeated TPU-worker kernel faults on this platform; the manual split
    takes the plain DEFAULT-precision MXU codegen path.
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

    if mxu:
        # zero masked slots BEFORE the split: the VPU path's `where` masks
        # make results independent of padded-point coordinates, and the
        # cross term must keep that invariant (callers may reuse buffers
        # with junk in masked slots)
        pts_m = jnp.where(msk[..., None], pts, 0.0)
        hi, lo = _split_bf16(pts_m)                    # [S, P, 3] bf16 ×2
        # masked squared norms: BIG on padded points makes them lose every
        # min in BOTH directions (replaces the two `where` masks of the VPU
        # path; the zeroed coords make the cross term exactly 0 there, so
        # there is no cancellation risk against the sentinel); empty
        # superpoints still come out as ~sqrt(_BIG)≈1e15 → isolated graph
        # nodes, same as the exact path.
        norms = jnp.where(msk, jnp.sum(pts_m * pts_m, axis=-1), _BIG)

    def body(_, ci):
        start = ci * row_chunk
        a = jax.lax.dynamic_slice_in_dim(pts, start, row_chunk, axis=0)    # [rc,P,3]
        a_msk = jax.lax.dynamic_slice_in_dim(msk, start, row_chunk, axis=0)
        a_counts = jax.lax.dynamic_slice_in_dim(counts, start, row_chunk, axis=0)
        if mxu:
            a_hi = jax.lax.dynamic_slice_in_dim(hi, start, row_chunk, axis=0)
            a_lo = jax.lax.dynamic_slice_in_dim(lo, start, row_chunk, axis=0)
            a_n = jax.lax.dynamic_slice_in_dim(norms, start, row_chunk, axis=0)
            # K-packed left operand: −2(ah·bh + ah·bl + al·bh) as ONE matmul
            # (−2·bf16 is exact — exponent bump). [rc·P, 9]
            ak = jnp.concatenate(
                [-2.0 * a_hi, -2.0 * a_hi, -2.0 * a_lo], axis=-1
            ).reshape(row_chunk * p, 9)

        def tbody(_, tj):
            t0 = tj * tc
            t_msk = jax.lax.dynamic_slice_in_dim(msk, t0, tc, axis=0)
            t_counts = jax.lax.dynamic_slice_in_dim(counts, t0, tc, axis=0)
            if mxu:
                b_hi = jax.lax.dynamic_slice_in_dim(hi, t0, tc, axis=0)
                b_lo = jax.lax.dynamic_slice_in_dim(lo, t0, tc, axis=0)
                b_n = jax.lax.dynamic_slice_in_dim(norms, t0, tc, axis=0)
                bk = jnp.concatenate(
                    [b_hi, b_lo, b_hi], axis=-1).reshape(tc * p, 9)
                ab = jax.lax.dot_general(
                    ak, bk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)      # [rc·P, tc·P]
                d2 = (a_n.reshape(row_chunk * p)[:, None]
                      + b_n.reshape(tc * p)[None, :] + ab)
                d2 = d2.reshape(row_chunk, p, tc, p)
                # cancellation can leave tiny negatives near d≈0: clamp
                # AFTER the min (O(S·P·tc) instead of O(S·P·tc·P))
                dmin_ab = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0))
                dmin_ba = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=1), 0.0))
            else:
                t_pts = jax.lax.dynamic_slice_in_dim(pts, t0, tc, axis=0)
                flat = t_pts.reshape(tc * p, 3)
                # broadcast-subtraction distances: exact f32 on the VPU, the
                # SAME form every KNN kernel here uses.
                dx = a[:, :, 0][:, :, None] - flat[:, 0][None, None, :]
                dy = a[:, :, 1][:, :, None] - flat[:, 1][None, None, :]
                dz = a[:, :, 2][:, :, None] - flat[:, 2][None, None, :]
                d2 = dx * dx + dy * dy + dz * dz            # [rc, P, tc*P]
                d2 = jnp.where(t_msk.reshape(tc * p)[None, None, :], d2, _BIG)
                d2 = d2.reshape(row_chunk, p, tc, p)
                dmin_ab = jnp.sqrt(jnp.min(d2, axis=-1))        # [rc, P, tc]
                d2_ba = jnp.where(a_msk[:, :, None, None], d2, _BIG)
                dmin_ba = jnp.sqrt(jnp.min(d2_ba, axis=1))      # [rc, tc, P]
            dmin_ab = jnp.where(a_msk[:, :, None], dmin_ab, 0.0)
            mean_ab = jnp.sum(dmin_ab, axis=1) / a_counts[:, None]
            dmin_ba = jnp.where(t_msk[None, :, :], dmin_ba, 0.0)
            mean_ba = jnp.sum(dmin_ba, axis=-1) / t_counts[None, :]
            return None, mean_ab + mean_ba                  # [rc, tc]

        _, cols = jax.lax.scan(tbody, None, jnp.arange(s_pad // tc))
        # cols: [s_pad/tc, rc, tc] → [rc, s_pad]
        return None, jnp.transpose(cols, (1, 0, 2)).reshape(row_chunk, s_pad)

    _, rows = jax.lax.scan(body, None, jnp.arange(s_pad // row_chunk))
    cd = rows.reshape(s_pad, s_pad)[:s, :s]
    return cd * (1.0 - jnp.eye(s, dtype=cd.dtype))


@functools.partial(jax.jit, static_argnums=(3, 4))
def chamfer_pairwise_blocks_gathered(points_all, mask_all, idx, row_chunk=8,
                                     mxu=False):
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
        lambda args: chamfer_pairwise(args[0], args[1], row_chunk, mxu),
        (pts, msk),
    )


def _get_shard_map():
    """jax.shard_map moved out of experimental mid-0.4.x — resolve once."""
    sm = getattr(jax, "shard_map", None)
    if sm is None:  # older jax
        from jax.experimental.shard_map import shard_map as sm
    return sm


@functools.lru_cache(maxsize=32)
def _gathered_dp_fn(mesh, row_chunk: int, axis_name: str, mxu: bool = False):
    """Cached jitted shard_map of the gathered chamfer: the block axis C is
    sharded over the mesh (each device gathers + reduces its own blocks
    from the replicated slab), the [C, S, S] result shards the same way.
    Rebuilding jit(shard_map(...)) per call would recompile every round —
    cache per (mesh, row_chunk)."""
    from jax.sharding import PartitionSpec as P

    shard_map = _get_shard_map()

    def body(points_all, mask_all, idx):
        return chamfer_pairwise_blocks_gathered(
            points_all, mask_all, idx, row_chunk, mxu)

    sm = shard_map(body, mesh=mesh,
                   in_specs=(P(), P(), P(axis_name)),
                   out_specs=P(axis_name))
    return jax.jit(sm)


@functools.lru_cache(maxsize=32)
def _blocks_dp_fn(mesh, row_chunk: int, axis_name: str, mxu: bool = False):
    """Cached jitted shard_map of the streaming blocked chamfer (block axis
    sharded over the mesh)."""
    from jax.sharding import PartitionSpec as P

    shard_map = _get_shard_map()

    def body(points, mask):
        return chamfer_pairwise_blocks(points, mask, row_chunk, mxu)

    sm = shard_map(body, mesh=mesh,
                   in_specs=(P(axis_name), P(axis_name)),
                   out_specs=P(axis_name))
    return jax.jit(sm)


def chamfer_pairwise_blocks_gathered_dp(points_all, mask_all, idx, mesh,
                                        row_chunk=8, axis_name="data",
                                        mxu=False):
    """Data-parallel chamfer_pairwise_blocks_gathered: the C chamfer blocks
    of one dispatch are embarrassingly parallel, so shard the block axis
    over the data mesh (the distributed diversity phase — the reference has
    no distributed anything, SURVEY §2.3; this is the TPU-native scaling
    story for selection beyond the prediction pass). Requires
    C % mesh-size == 0 (region_graph dispatches fixed chunks of 8)."""
    return _gathered_dp_fn(mesh, row_chunk, axis_name, mxu)(
        points_all, mask_all, idx)


def chamfer_pairwise_blocks_dp(points, mask, mesh, row_chunk=8,
                               axis_name="data", mxu=False):
    """Data-parallel chamfer_pairwise_blocks (streaming path)."""
    return _blocks_dp_fn(mesh, row_chunk, axis_name, mxu)(points, mask)


@functools.partial(jax.jit, static_argnums=(2, 3))
def chamfer_pairwise_blocks(points, mask, row_chunk=8, mxu=False):
    """Batched chamfer_pairwise over per-cloud blocks in ONE device call.

    points: [C, S, P, 3] float32 (centered); mask: [C, S, P] bool.
    Returns [C, S, S]. Blocks are processed sequentially on device
    (lax.map = scan), so live memory stays at one block's working set while
    the host pays a single dispatch instead of C round-trips (~30 ms each
    on this platform — the reason region_graph batches all clouds)."""

    def one(args):
        pts, msk = args
        return chamfer_pairwise(pts, msk, row_chunk, mxu)

    return jax.lax.map(one, (points, mask))


# --------------------------------------------------------------- pallas ---
# Fused MXU chamfer kernel. The XLA mxu=True path above is numerically
# right but 9× SLOWER than the exact VPU path on this platform: XLA cannot
# fuse the min-reductions into a matmul producer, so every [rc·P, tc·P]
# distance block round-trips HBM (measured 3.28 s vs 0.37 s at 8×256×512).
# The kernel streams d² tiles through VMEM instead: one K=16 bf16 matmul
# builds each [P, TJ·P] tile (cross term bf16x3 + norms bf16x2, all packed
# into the contraction dim — zero VPU assembly ops), and the two
# directional min/sqrt/sum reductions consume it in-place. Only the
# [S, S] directional SUMS leave the kernel.


def _pack_chamfer_operands(points, mask):
    """points [C, S, P, 3] f32 + mask [C, S, P] → (lhs [C·S·P, 16] bf16,
    rhs [16, C·S·P] bf16) with d²[a, b] = lhs[a] · rhs[b].

    K-lane layout (bf16x3 cross term, bf16x2 norms — numerics measured in
    scripts/bench_chamfer_mxu.py form=bf16x3_kernel_pack):
      lhs: [-2xh,-2yh,-2zh, -2xh,-2yh,-2zh, -2xl,-2yl,-2zl, nh, nl, 1, 1, 0×3]
      rhs: [ xh,  yh,  zh,   xl,  yl,  zl,   xh,  yh,  zh,  1,  1, nh, nl, 0×3]

    Padded points get coords 0 and norm 1e30: their d² against ANYTHING is
    ≥ ~1e30 with NO cancellation risk (the cross term is exactly zero), so
    an in-kernel `dmin < 1e14` threshold separates sentinel rows exactly —
    genuine distances are scene-scale. An all-padded (empty) superpoint
    yields dmin ≈ 1e15, preserved as the isolated-node sentinel by the
    caller's epilogue."""
    c, s, p, _ = points.shape
    pts = jnp.where(mask[..., None], points.astype(jnp.float32), 0.0)
    n = jnp.where(mask, jnp.sum(pts * pts, axis=-1), _BIG)
    xh, xl = _split_bf16(pts)                     # [C,S,P,3] bf16 ×2
    nh, nl = _split_bf16(n)                       # [C,S,P]  bf16 ×2
    one = jnp.ones_like(nh)
    zero = jnp.zeros_like(nh)
    st = [zero[..., None]] * 3
    lhs = jnp.concatenate(
        [-2.0 * xh, -2.0 * xh, -2.0 * xl,
         nh[..., None], nl[..., None], one[..., None], one[..., None]] + st,
        axis=-1).reshape(c * s * p, 16)
    rhs = jnp.concatenate(
        [xh, xl, xh,
         one[..., None], one[..., None], nh[..., None], nl[..., None]] + st,
        axis=-1).reshape(c * s * p, 16)
    return lhs, jnp.transpose(rhs)


def _chamfer_sums_kernel(lhs_ref, rhs_ref, out_ref, *, p, ti, tj):
    """One grid step: TI source superpoints × TJ target superpoints.

    lhs_ref [TI·P, 16] bf16; rhs_ref [16, TJ·P] bf16; out_ref [TI, S] f32
    with out[t1, t2] = Σ over t2's VALID points of (min distance to t1's
    points) — ONE directional sum per ordered pair. The other direction is
    its own transpose (Σ over a's points of min-to-b ≡ out[b, a]), so the
    kernel does HALF the min work of a two-sided form and only the
    lane-efficient axis-0 reduction (a [1, P] row per segment; the axis-1
    form yields [P, 1] columns — a full lane-padded vreg each, the Mosaic
    pathology CLAUDE.md documents). Division by counts, the transpose
    combine, and the empty-superpoint guard happen in the XLA epilogue,
    where the counts live.

    The out block spans the FULL S column dim (Mosaic requires the last
    block dim be 128-divisible or whole-array; [TI, TJ] is neither) and
    persists across the innermost grid dim j — each j step blends its own
    disjoint tj-column window at j·tj via a lane-iota select (Mosaic can't
    store scalars to VMEM)."""
    j = pl.program_id(2)
    s = out_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    for t1 in range(ti):
        a = lhs_ref[pl.ds(t1 * p, p), :]                    # [P, 16]
        d2 = jax.lax.dot_general(
            a, rhs_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [P, TJ·P]
        row = out_ref[t1:t1 + 1, :]                         # [1, S]
        for t2 in range(tj):
            seg = d2[:, t2 * p:(t2 + 1) * p]                # [P, P]
            dba = jnp.sqrt(jnp.maximum(
                jnp.min(seg, axis=0, keepdims=True), 0.0))  # [1, P]
            dba = jnp.where(dba < 1e14, dba, 0.0)
            row = jnp.where(lane == j * tj + t2, jnp.sum(dba), row)
        out_ref[t1:t1 + 1, :] = row


def _pallas_tiles(s: int, p: int):
    """(TI, TJ) for the kernel grid, or None if the shape is unsupported.

    Gates: P lane-sliceable (×128, ≤1024); the [P, TJ·P] f32 d² tile fits
    VMEM; S % 8 == 0 so the tiles never degenerate — an odd S would force
    ti=tj=1, a grid of S² steps each doing one tiny [P, P] matmul, slower
    than the exact VPU call it replaces. region_graph's S buckets are 16s
    so production dispatches always pass; arbitrary-S callers (e.g. the
    edcd branch's per-round top-k counts) fall back to the exact path,
    which also avoids per-round Mosaic recompiles on drifting shapes."""
    if p % 128 or p > 1024 or s % 8:
        return None
    tj = min(8, (2 * 1024 * 1024) // (p * p))   # d² tile ≤ 8 MB
    while tj > 1 and s % tj:
        tj //= 2
    ti = 8
    if tj < 1 or s % tj or s % ti:
        return None
    return ti, tj


# live-buffer cap for ONE kernel dispatch: the packed operands bound the
# largest single live buffers — the masked f32 pts [C,S,P,3] (12·C·S·P
# bytes) and the bf16 lhs/rhs [C·S·P, 16] (32·C·S·P each) — and this
# platform's TPU worker dies on >500 MB live buffers (~40 min recovery,
# CLAUDE.md). 5.24e6 = the measured-good 8×1024×512 production dispatch
# ×1.25 (~168 MB per packed operand).
_CSP_CAP = 5_242_880


def _subchunk(c: int, s: int, p: int):
    """Largest power-of-two block count ≤ c whose dispatch fits _CSP_CAP.
    Power-of-two sizes keep the compiled-shape SET closed ({8,4,2,1} at the
    production _G_CHUNK=8) — an exact-fit ladder measured WORSE on this
    platform (4× compile surface; CLAUDE.md chamfer-group lesson)."""
    sub = 1
    while sub * 2 <= c and c % (sub * 2) == 0 and 2 * sub * s * p <= _CSP_CAP:
        sub *= 2
    return sub if sub * s * p <= _CSP_CAP else 0


def chamfer_supports_pallas(s: int, p: int, c: int = 8) -> bool:
    """True iff the fused kernel both exists (TPU) and can run SAFELY at
    this dispatch — directly when C·S·P fits the live-buffer cap, else via
    the *_chunked wrappers, which split the block axis into power-of-two
    sub-dispatches (exact: blocks are independent) so large ladder rungs
    (late-round anchor growth reaches S=4096) keep kernel coverage instead
    of falling back wholesale (VERDICT r4 #2 — the reference's CUDA chamfer
    tiles through fixed 512-pt shared-memory buffers at ANY size,
    chamfer3D.cu:11+). Only shapes the tile gates reject (odd S, P>1024 or
    not lane-sliceable, or a single block over the cap) use the exact
    path."""
    if _subchunk(c, s, p) == 0:
        return False
    return jax.default_backend() == "tpu" and _pallas_tiles(s, p) is not None


@functools.partial(jax.jit, static_argnums=(2,))
def chamfer_pairwise_blocks_pallas(points, mask, interpret=False):
    """chamfer_pairwise_blocks on the fused MXU kernel.

    points [C, S, P, 3] f32 (centered), mask [C, S, P] → [C, S, S] f32,
    zero diagonal, ~1e15 at empty superpoints (isolated graph nodes), same
    semantics as the exact path to the bf16x3 tolerance
    (scripts/bench_chamfer_mxu.py: FPS picks and top-8 graph neighbors
    identical to exact f32)."""
    c, s, p, _ = points.shape
    tiles = _pallas_tiles(s, p)
    if tiles is None or c * s * p > _CSP_CAP:
        # the C·S·P cap bounds the packed-operand live buffers under this
        # platform's ~500 MB worker-crash line; over-cap callers go through
        # chamfer_pairwise_blocks_pallas_chunked
        raise ValueError(f"unsupported chamfer kernel shape C={c} S={s} P={p}")
    ti, tj = tiles
    lhs, rhs = _pack_chamfer_operands(points, mask)
    kern = functools.partial(_chamfer_sums_kernel, p=p, ti=ti, tj=tj)
    o = pl.pallas_call(
        kern,
        grid=(c, s // ti, s // tj),
        in_specs=[
            pl.BlockSpec((ti * p, 16), lambda ci, ib, j: (ci * (s // ti) + ib, 0)),
            pl.BlockSpec((16, tj * p), lambda ci, ib, j: (0, ci * (s // tj) + j)),
        ],
        # full-S column block (Mosaic block-shape rule), persistent across
        # the innermost grid dim — see _chamfer_sums_kernel
        out_specs=pl.BlockSpec(
            (ti, s), lambda ci, ib, j: (ci * (s // ti) + ib, 0)),
        out_shape=jax.ShapeDtypeStruct((c * s, s), jnp.float32),
        interpret=interpret,
    )(lhs, rhs)
    # o[a, b] = Σ over b's points of min-dist-to-a; the chamfer combine
    # cd[a, b] = oab[a, b]/cnt[a] + oab[b, a]/cnt[b] with oab = oᵀ
    cnt = jnp.sum(mask, axis=-1).astype(jnp.float32)        # [C, S]
    safe = jnp.maximum(cnt, 1.0)
    o = o.reshape(c, s, s)
    cd = (jnp.swapaxes(o, 1, 2) / safe[:, :, None]
          + o / safe[:, None, :])
    empty = cnt == 0
    cd = jnp.where(empty[:, :, None] | empty[:, None, :], 1e15, cd)
    return cd * (1.0 - jnp.eye(s, dtype=cd.dtype))[None]


@jax.jit
def chamfer_pairwise_blocks_gathered_pallas(points_all, mask_all, idx):
    """Gathered-slab variant of the kernel path (see
    chamfer_pairwise_blocks_gathered for the slab protocol)."""
    return chamfer_pairwise_blocks_pallas(points_all[idx], mask_all[idx])


def chamfer_pairwise_blocks_pallas_chunked(points, mask, interpret=False):
    """Kernel path at ANY C·S·P the tile gates accept: the block axis is
    split into power-of-two sub-dispatches that each fit the live-buffer
    cap (_subchunk). Exact — blocks are independent; results concatenate.
    All sub-dispatches are enqueued before any completes, so the device
    pipelines them back-to-back."""
    c, s, p, _ = points.shape
    sub = _subchunk(c, s, p)
    if sub == 0 or c % sub:
        raise ValueError(f"unsupported chunked chamfer shape C={c} S={s} P={p}")
    if sub == c:
        return chamfer_pairwise_blocks_pallas(points, mask, interpret)
    parts = [chamfer_pairwise_blocks_pallas(points[lo:lo + sub],
                                            mask[lo:lo + sub], interpret)
             for lo in range(0, c, sub)]
    return jnp.concatenate(parts, axis=0)


def chamfer_pairwise_blocks_gathered_pallas_chunked(points_all, mask_all,
                                                    idx):
    """Gathered-slab kernel path with block-axis sub-chunking (each
    sub-dispatch gathers only its own [sub, S, P, 3] transient)."""
    c, s = idx.shape
    p = int(points_all.shape[1])
    sub = _subchunk(c, s, p)
    if sub == 0 or c % sub:
        raise ValueError(f"unsupported chunked chamfer shape C={c} S={s} P={p}")
    if sub == c:
        return chamfer_pairwise_blocks_gathered_pallas(
            points_all, mask_all, idx)
    parts = [chamfer_pairwise_blocks_gathered_pallas(
                points_all, mask_all, idx[lo:lo + sub])
             for lo in range(0, c, sub)]
    return jnp.concatenate(parts, axis=0)


@functools.lru_cache(maxsize=32)
def _gathered_pallas_dp_fn(mesh, axis_name: str):
    from jax.sharding import PartitionSpec as P

    shard_map = _get_shard_map()

    def body(points_all, mask_all, idx):
        # chunked: a per-device shard can still exceed the live-buffer cap
        return chamfer_pairwise_blocks_gathered_pallas_chunked(
            points_all, mask_all, idx)

    sm = shard_map(body, mesh=mesh,
                   in_specs=(P(), P(), P(axis_name)),
                   out_specs=P(axis_name))
    return jax.jit(sm)


@functools.lru_cache(maxsize=32)
def _blocks_pallas_dp_fn(mesh, axis_name: str):
    from jax.sharding import PartitionSpec as P

    shard_map = _get_shard_map()

    sm = shard_map(chamfer_pairwise_blocks_pallas_chunked, mesh=mesh,
                   in_specs=(P(axis_name), P(axis_name)),
                   out_specs=P(axis_name))
    return jax.jit(sm)


def chamfer_pairwise_blocks_gathered_dp_pallas(points_all, mask_all, idx,
                                               mesh, axis_name="data"):
    return _gathered_pallas_dp_fn(mesh, axis_name)(points_all, mask_all, idx)


def chamfer_pairwise_blocks_dp_pallas(points, mask, mesh, axis_name="data"):
    return _blocks_pallas_dp_fn(mesh, axis_name)(points, mask)


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
