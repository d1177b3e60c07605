"""Batched k-nearest-neighbors on TPU.

TPU-native replacement for the reference's OpenMP/nanoflann CPU extension
(N1 in SURVEY.md: SSDR_AL_s3dis/utils/nearest_neighbors/knn_.cxx:21-45, exposed as
`nearest_neighbors.knn_batch(pts, queries, K, omp=True)` and consumed by
`DataProcessing.knn_search` in helper_tool.py:173-183).

The reference builds a KD-tree per cloud on the host; on TPU the right shape
is a *tiled brute-force* search — the distance computation is a matmul that
rides the MXU, and blocks of the O(Nq·Ns) distance matrix are never
materialized in HBM. Four engines (all take support [B,Ns,3], query
[B,Nq,3] → int32 [B,Nq,k], ascending distance):

  knn_window — morton-window search, the model-pyramid DEFAULT: support and
               queries are sorted along a z-order curve and each
               morton-contiguous query tile searches one window-sized slice
               of the sorted support via a fused Pallas kernel (distances +
               bit-packed top-k entirely in VMEM). ~12 ms device time per
               40960² k=16 search at ~0.93 recall (scene-dependent; the
               bench records it per run, probes=2 lifts it further) —
               3× faster than approx, ~20× faster than exact top-k
               merging. RandLA-Net's neighborhoods feed max/attention
               aggregation and the architecture randomizes its sampling
               everywhere, so ~93% neighbor recall is statistically
               invisible (TPU-gated model-agreement test in
               tests/test_knn.py).
  knn_approx — chunked distances + `jax.lax.approx_min_k` (the TPU's
               PartialReduce hardware path); ≥0.997 recall at
               recall_target=0.99.
  knn_xla    — exact: per support tile, k-step extraction (max+argmax+mask)
               merged into a sorted running top-k. ~5× faster than
               jax.lax.top_k merging (which lowers to a full sort).
  knn_pallas — exact hand-tiled Pallas kernel (VPU distance tiles, running
               top-k in VMEM scratch).

Distance matmuls use HIGHEST precision where used: bf16 passes lose the
~1e-3 distance deltas that order near neighbors (measured recall collapses
to 0.55); the broadcast-subtraction forms are exact f32 on the VPU.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_BIG = -1e30  # sentinel for padded support slots (negated-distance space)
_HIGH = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _batched(fn):
    """Promote a single-cloud knn fn to batched [B, N, 3] with vmap."""

    @functools.wraps(fn)
    def wrapper(support, query, k, **kw):
        support = jnp.asarray(support, jnp.float32)
        query = jnp.asarray(query, jnp.float32)
        squeeze = support.ndim == 2
        if squeeze:
            support, query = support[None], query[None]
        out = jax.vmap(lambda s, q: fn(s, q, k, **kw))(support, query)
        return out[0] if squeeze else out

    return wrapper


# ---------------------------------------------------------------------------
# approx engine (default in the model pyramid)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _knn_approx_single(support, query, k, query_chunk, recall_target):
    ns, nq = support.shape[0], query.shape[0]
    nq_pad = _round_up(nq, query_chunk)
    query_p = jnp.pad(query, ((0, nq_pad - nq), (0, 0)))
    # distances via broadcast subtraction: exact f32 on the VPU, measurably
    # faster than the matmul form at HIGHEST precision (which the tiny
    # neighbor-distance deltas require — see module docstring)
    sx = support[:, 0].reshape(1, ns)
    sy = support[:, 1].reshape(1, ns)
    sz = support[:, 2].reshape(1, ns)

    def body(q):
        dx = q[:, 0:1] - sx
        dy = q[:, 1:2] - sy
        dz = q[:, 2:3] - sz
        d2 = dx * dx + dy * dy + dz * dz
        _, idx = jax.lax.approx_min_k(d2, k, recall_target=recall_target)
        return idx.astype(jnp.int32)

    qs = query_p.reshape(nq_pad // query_chunk, query_chunk, 3)
    out = jax.lax.map(body, qs).reshape(nq_pad, k)
    return out[:nq]


def knn_approx(support, query, k, *, query_chunk=1024, recall_target=0.99):
    ns = jnp.shape(support)[-2]
    if ns < max(2 * k, 128):  # tiny clouds: exact is faster and approx_min_k
        return knn_xla(support, query, k)   # needs k ≤ n
    qc = min(query_chunk, _round_up(jnp.shape(query)[-2], 128))
    return _batched(_knn_approx_single)(
        support, query, k, query_chunk=qc, recall_target=recall_target
    )


# ---------------------------------------------------------------------------
# morton-window engine: spatial-locality pruning
# ---------------------------------------------------------------------------


def _part1by2(x):
    """Spread 10 bits of x over 30 bits (every 3rd position)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def morton_codes(xyz, lo, hi, shift: int = 0):
    """30-bit morton (z-order) codes over the [lo, hi] bbox.

    shift: grid offset in 0..1023 units applied mod 1024 before interleaving.
    shift=512 flips the top-level octant planes — a second probe sorted this
    way makes neighbor pairs split by a major z-order boundary contiguous
    (the classic shifted-grid trick; used by knn_window(probes=2))."""
    span = jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip(((xyz - lo) / span * 1023.0).astype(jnp.int32), 0, 1023)
    if shift:
        q = (q + shift) % 1024
    return (
        _part1by2(q[..., 0])
        | (_part1by2(q[..., 1]) << 1)
        | (_part1by2(q[..., 2]) << 2)
    )


def _hilbert_transpose(q, bits: int):
    """Skilling's AxestoTranspose (Programming the Hilbert curve, 2004) for
    n=3 axes, vectorized over points. q [..., 3] int32 in [0, 2**bits) →
    list of 3 transposed-index planes (bit b of plane i is bit 3·b+(2−i) of
    the Hilbert index). Pure bitwise ops over a static `bits`-level loop —
    O(bits) VPU work per point, same cost class as the morton interleave."""
    X = [q[..., 0], q[..., 1], q[..., 2]]
    Q = 1 << (bits - 1)
    while Q > 1:
        P = Q - 1
        # i = 0: the exchange branch is a no-op (t = 0)
        X[0] = jnp.where((X[0] & Q) != 0, X[0] ^ P, X[0])
        for i in (1, 2):
            cond = (X[i] & Q) != 0
            t = (X[0] ^ X[i]) & P
            x0, xi = X[0], X[i]
            X[0] = jnp.where(cond, x0 ^ P, x0 ^ t)
            X[i] = jnp.where(cond, xi, xi ^ t)
        Q >>= 1
    # Gray encode
    X[1] = X[1] ^ X[0]
    X[2] = X[2] ^ X[1]
    t = jnp.zeros_like(X[0])
    Q = 1 << (bits - 1)
    while Q > 1:
        t = jnp.where((X[2] & Q) != 0, t ^ (Q - 1), t)
        Q >>= 1
    return [x ^ t for x in X]


def hilbert_codes(xyz, lo, hi, shift: int = 0, bits: int = 10):
    """30-bit Hilbert-curve codes over the [lo, hi] bbox.

    Drop-in alternative to `morton_codes` for the window engine. The Hilbert
    curve never jumps (consecutive codes are L1-adjacent cells; bijectivity
    and unit-step adjacency are property-tested in
    tests/test_knn.py::TestHilbertCurve), so in theory the same window
    catches more true neighbors than z-order. MEASURED (scripts/
    bench_curve.py, n=40960 k=16): on uniform data hilbert adds +0.003..+0.01
    recall at production windows, but on clustered scene data it is -0.002..
    -0.003 WORSE, at identical search cost (4.01 ms both at w=3840) — the
    z-order octant jumps the Hilbert curve removes are rare exactly where
    points cluster. Morton stays the default; this is kept as a measured
    negative and an A/B knob (Config.curve / SSDR_CURVE). shift: same
    shifted-grid trick as morton_codes (two-probe merge)."""
    span = jnp.maximum(hi - lo, 1e-9)
    top = (1 << bits) - 1
    q = jnp.clip(((xyz - lo) / span * top).astype(jnp.int32), 0, top)
    if shift:
        q = (q + shift) % (top + 1)
    x0, x1, x2 = _hilbert_transpose(q, bits)
    return (
        (_part1by2(x0) << 2) | (_part1by2(x1) << 1) | _part1by2(x2)
    )


CURVES = {"morton": morton_codes, "hilbert": hilbert_codes}
# window-engine default space-filling curve (env-overridable for A/B runs;
# scripts/bench_curve.py measures recall-vs-window per curve)
DEFAULT_CURVE = _os.environ.get("SSDR_CURVE", "morton")


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _knn_window_single(support, query, k, query_chunk, window, shift=0,
                       curve=None):
    """Morton-window KNN: sort support and query along a z-order curve; each
    morton-contiguous query chunk searches only a `window`-sized slice of the
    sorted support centered on its median rank. Spatial locality makes the
    slice contain (almost) all true neighbors at a fraction of the O(Nq·Ns)
    distance work. Approximate: measured recall 0.93-0.97 at window=4096
    depending on scene clustering (tests/test_knn.py gates it)."""
    ns, nq = support.shape[0], query.shape[0]
    window = min(window, ns)
    codes = CURVES[curve or DEFAULT_CURVE]
    lo = jnp.minimum(jnp.min(support, 0), jnp.min(query, 0))
    hi = jnp.maximum(jnp.max(support, 0), jnp.max(query, 0))
    code_s = codes(support, lo, hi, shift)
    code_q = codes(query, lo, hi, shift)

    s_order = jnp.argsort(code_s)
    s_sorted = support[s_order]
    code_s_sorted = code_s[s_order]
    q_order = jnp.argsort(code_q)

    nq_pad = _round_up(nq, query_chunk)
    # pad with the last query (harmless duplicates, sliced away at the end)
    q_idx_pad = jnp.concatenate(
        [q_order, jnp.full(nq_pad - nq, q_order[-1], q_order.dtype)]
    )
    q_sorted = query[q_idx_pad]
    pos = jnp.searchsorted(code_s_sorted, code_q[q_idx_pad])

    # one shared window per morton-contiguous query chunk, gathered and
    # reduced in a single batched program (a chunked lax.map serializes into
    # ~Nq/C tiny dispatches whose launch overhead dominates the saved FLOPs)
    num_chunks = nq_pad // query_chunk
    ps = pos.reshape(num_chunks, query_chunk)
    starts = jnp.clip(
        jnp.median(ps, axis=1).astype(jnp.int32) - window // 2, 0, ns - window
    )                                                   # [NC]
    win_idx = starts[:, None] + jnp.arange(window)[None, :]       # [NC, W]
    win_pts = s_sorted[win_idx]                                   # [NC, W, 3]
    qs = q_sorted.reshape(num_chunks, query_chunk, 3)
    dx = qs[:, :, 0:1] - win_pts[:, None, :, 0]
    dy = qs[:, :, 1:2] - win_pts[:, None, :, 1]
    dz = qs[:, :, 2:3] - win_pts[:, None, :, 2]
    d2 = dx * dx + dy * dy + dz * dz                              # [NC, C, W]
    _, idx = jax.lax.approx_min_k(d2, k, recall_target=0.99)
    out_sorted = (starts[:, None, None] + idx.astype(jnp.int32)).reshape(
        nq_pad, k
    )
    out = s_order[out_sorted]                            # back to support ids
    # scatter rows back to the original query order
    inv = jnp.zeros(nq_pad, jnp.int32).at[q_idx_pad[:nq]].set(
        jnp.arange(nq, dtype=jnp.int32), mode="drop"
    )
    return out[inv[:nq]]


def _knn_window_kernel(start_ref, qx_ref, sx_ref, out_ref, *, k, window,
                       fold=1):
    """Fused distance + top-k over one morton window, entirely in VMEM.

    start_ref: SMEM scalar — this query tile's window offset into the sorted
    support. qx_ref: [TQ, 128] sorted queries (xyz in lanes 0..2).
    sx_ref: [8, Ns_pad] sorted support, sublane-packed, VMEM-resident.
    out_ref: [TQ, k] window-relative neighbor ranks.

    Top-k trick: distances are non-negative f32, so their int32 bit patterns
    are order-isomorphic; zero the low 12 mantissa bits and pack the
    12-bit window-relative index there. One packed int32 min-reduction then
    yields BOTH the min distance and its index; the extracted element is
    knocked out by exact equality (index bits make packed values unique).

    fold > 1: strided group-min pre-reduction before the k-step extraction
    — the VPU-bound part of this kernel. packed[:, c·G:(c+1)·G] slices are
    elementwise-min-folded to [TQ, G=W/fold]; because packed values CARRY
    their lane index, the fold keeps exact identities and the extraction
    loop (k passes) then runs over G lanes instead of W. The only loss is
    within-group 2nd-bests: a true neighbor is dropped iff another true
    neighbor sits exactly c·G lanes away — spatially far in morton order,
    so rare (measured: recall −0.002 at fold=10/W=3840 on the bench scene
    vs 16/fold× less extraction work)."""
    tq = qx_ref.shape[0]
    start = pl.multiple_of(start_ref[pl.program_id(0)], 128)
    qx = qx_ref[:, 0:1]
    qy = qx_ref[:, 1:2]
    qz = qx_ref[:, 2:3]
    s = sx_ref[:, pl.ds(start, window)]              # [8, W]
    dx = qx - s[0:1, :]
    dy = qy - s[1:2, :]
    dz = qz - s[2:3, :]
    d2 = dx * dx + dy * dy + dz * dz                 # [TQ, W]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, window), 1)
    packed = (pltpu.bitcast(d2, jnp.int32) & jnp.int32(~0xFFF)) | lane

    if fold > 1:
        g = window // fold
        red = packed[:, 0:g]
        for c in range(1, fold):
            red = jnp.minimum(red, packed[:, c * g:(c + 1) * g])
        packed = red

    big = jnp.int32(0x7F000000)
    cols = []
    for _ in range(k):
        m = jnp.min(packed, axis=1, keepdims=True)   # [TQ, 1]
        cols.append(m & 0xFFF)
        packed = jnp.where(packed == m, big, packed)
    out_ref[:] = jnp.concatenate(cols, axis=1)


# Default engine for the window-search distance build: False = broadcast-
# subtraction on the VPU (_knn_window_kernel), True = MXU matmul build
# (_knn_window_kernel_mxu). Set after measurement (scripts/bench_knn_mxu.py).
_MXU_DISTANCE_DEFAULT = False


def _knn_window_kernel_mxu(start_ref, qx_ref, sx_ref, out_ref, *, k, window,
                           fold=1):
    """_knn_window_kernel with the distance build moved to the MXU.

    The broadcast-subtraction build is ~11 VPU ops over [TQ, W]; the MXU is
    idle during the search. Rewrite d2 (up to the per-row constant that
    ordering ignores, then re-added for the sign-bit/packing trick) as

        d2[q, s] = |q'|^2 + |s'|^2 - 2 q'.s'   (q' = q - c, s' = s - c)

    with the -2 q'.s' term one [TQ, 8] @ [8, W] HIGHEST-precision matmul
    (xyz in the first 3 sublanes, -2-prescaled queries). Coordinates are
    CENTERED on the tile's first query so |q'|^2, |s'|^2 are window-scale —
    without centering the cancellation |q|^2 - 2qs + |s|^2 loses ~10 bits
    at room-scale coordinates and ordering drifts into the packed-index
    mantissa bits. max(d2, 0) guards the tiny negative roundings near
    d2 = 0 (negative f32 bit patterns break the int32 order isomorphism).
    """
    tq = qx_ref.shape[0]
    start = pl.multiple_of(start_ref[pl.program_id(0)], 128)
    s = sx_ref[:, pl.ds(start, window)]              # [8, W], xyz rows 0..2
    # center: the window's FIRST support point, read as [1,1] slab scalars
    # (morton-local, so all window points and queries are nearby). [1,1]
    # broadcasts need no sublane<->lane move; rows/lanes 3..7 are zero on
    # both sides and must STAY zero, hence the masked subtraction.
    cx, cy, cz = s[0:1, 0:1], s[1:2, 0:1], s[2:3, 0:1]
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    sc = s - (cx * (row == 0) + cy * (row == 1) + cz * (row == 2)).astype(
        jnp.float32)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    qc = qx_ref[:, 0:8] - (
        cx * (lane8 == 0) + cy * (lane8 == 1) + cz * (lane8 == 2)
    ).astype(jnp.float32)                            # [TQ, 8] centered
    q2 = jnp.sum(qc * qc, axis=1, keepdims=True)     # [TQ, 1]
    qm2 = qc * jnp.float32(-2.0)
    y = jax.lax.dot_general(
        qm2, sc, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )                                                # [TQ, W] = -2 q'.s'
    s2 = jnp.sum(sc[0:3, :] * sc[0:3, :], axis=0, keepdims=True)  # [1, W]
    d2 = jnp.maximum(y + (s2 + q2), 0.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, window), 1)
    packed = (pltpu.bitcast(d2, jnp.int32) & jnp.int32(~0xFFF)) | lane

    big = jnp.int32(0x7F000000)
    cols = []
    for _ in range(k):
        m = jnp.min(packed, axis=1, keepdims=True)   # [TQ, 1]
        cols.append(m & 0xFFF)
        packed = jnp.where(packed == m, big, packed)
    out_ref[:] = jnp.concatenate(cols, axis=1)


def _pick_extract_fold(window: int, fold: int = 0) -> int:
    """Strided-group pre-reduction fold for the extraction loop (fold=0 →
    default 1 = exact k-step extraction; callers may pass ≥2 for the folded
    variant, which requires window % fold == 0 and window/fold % 128 == 0).

    MEASURED NEGATIVE RESULT (kept as a knob for future shapes): at
    W=3840/TQ=256/k=16 on 40960-pt scenes the fold does NOT speed up the
    kernel (fold 1/6/10/15 all ~1.35 ms per 40960-query search) — the
    kernel is not extraction-bound at these shapes, contrary to the pass-
    count model; recall holds at fold=6 (0.9293 == exact) and only drops
    at 15 (0.9214). Exact extraction therefore stays the default."""
    return fold if fold else 1


def _run_window_pallas(s_sorted, q_sorted, starts, k, query_chunk, window,
                       fold=0, mxu=None):
    ns, nq = s_sorted.shape[0], q_sorted.shape[0]
    num_tiles = nq // query_chunk
    sp = jnp.zeros((8, ns), jnp.float32).at[:3, :].set(s_sorted.T)
    qp = jnp.zeros((nq, 128), jnp.float32).at[:, :3].set(q_sorted)

    if mxu is None:
        mxu = _MXU_DISTANCE_DEFAULT
    kern = _knn_window_kernel_mxu if mxu else _knn_window_kernel
    kernel = functools.partial(kern, k=k, window=window,
                               fold=_pick_extract_fold(window, fold))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((query_chunk, 128), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ns), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((query_chunk, k), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    rel = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq, k), jnp.int32),
    )(starts, qp, sp)
    return rel


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _knn_window_single_pallas(support, query, k, query_chunk, window, shift=0,
                              curve=None):
    """Curve-sort (morton/hilbert) wrapper around the fused kernel."""
    ns, nq = support.shape[0], query.shape[0]
    codes_fn = CURVES[curve or DEFAULT_CURVE]
    lo = jnp.minimum(jnp.min(support, 0), jnp.min(query, 0))
    hi = jnp.maximum(jnp.max(support, 0), jnp.max(query, 0))
    code_s = codes_fn(support, lo, hi, shift)
    code_q = codes_fn(query, lo, hi, shift)
    code_s_sorted, s_order, s_sorted = sort_by_codes(code_s, support)
    code_q_sorted, q_order, q_sorted0 = sort_by_codes(code_q, query)

    ns_pad = _round_up(ns, 128)
    # sentinel rows far from everything (never selected)
    s_sorted = jnp.concatenate(
        [s_sorted, jnp.full((ns_pad - ns, 3), 3e18, jnp.float32)], axis=0
    )
    nq_pad = _round_up(nq, query_chunk)
    q_sorted = jnp.concatenate(
        [q_sorted0, jnp.broadcast_to(q_sorted0[nq - 1], (nq_pad - nq, 3))]
    )
    code_q_pad = jnp.concatenate(
        [code_q_sorted,
         jnp.broadcast_to(code_q_sorted[nq - 1], (nq_pad - nq,))]
    )
    pos = jnp.searchsorted(code_s_sorted, code_q_pad).astype(jnp.int32)
    starts = jnp.clip(
        jnp.median(pos.reshape(-1, query_chunk), axis=1).astype(jnp.int32)
        - window // 2,
        0, ns_pad - window,
    )
    starts = (starts // 128) * 128  # lane alignment for the in-kernel slice
    rel = _run_window_pallas(s_sorted, q_sorted, starts, k, query_chunk, window)
    out_sorted = jnp.repeat(starts, query_chunk)[:, None] + rel
    out = s_order[jnp.clip(out_sorted, 0, ns - 1)]
    return out[invert_permutation(q_order)]


class SortedCloud:
    """A cloud pre-sorted along the morton curve, reusable across several
    window searches (build_pyramid uses each layer as self-support,
    self-query, AND up-query — sorting once amortizes 3 argsort+gather
    passes)."""

    def __init__(self, xyz_sorted, order, codes_sorted, n_real):
        self.xyz_sorted = xyz_sorted    # [N_pad, 3] (sentinels at the tail)
        self.order = order              # [N_real] original index per rank
        self.codes_sorted = codes_sorted
        self.n_real = n_real


def invert_permutation(order):
    """Inverse of a permutation. argsort(order) — XLA's sort is ~5× cheaper
    than the equivalent scatter on this platform (measured [6,40960]:
    0.3 vs 1.6 ms; scripts/profile_forward.py --sorts)."""
    return jnp.argsort(order).astype(jnp.int32)


def sort_by_codes(codes, xyz):
    """ONE payload-carrying sort returning (codes_sorted, order, xyz_sorted).

    Replaces argsort + xyz row-gather + codes gather: the two O(N)-row
    gathers pay this platform's flat ~12 ns/row tax and cost 5.3 ms at
    [6,40960] vs 0.95 ms for the 5-operand sort (profile_forward --sorts).
    is_stable=True keeps exact parity with the previous jnp.argsort path
    (ties in quantized morton codes are common)."""
    n = xyz.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    codes_s, order, xs, ys, zs = jax.lax.sort(
        (codes, iota, xyz[:, 0], xyz[:, 1], xyz[:, 2]),
        num_keys=1, is_stable=True,
    )
    return codes_s, order, jnp.stack([xs, ys, zs], axis=-1)


def sort_cloud(xyz, lo, hi, pad_to=128, curve=None) -> "SortedCloud":
    n = xyz.shape[0]
    codes = CURVES[curve or DEFAULT_CURVE](xyz, lo, hi)
    codes_sorted, order, xyz_sorted = sort_by_codes(codes, xyz)
    n_pad = _round_up(n, pad_to)
    xyz_sorted = jnp.concatenate(
        [xyz_sorted, jnp.full((n_pad - n, 3), 3e18, jnp.float32)], axis=0
    )
    return SortedCloud(xyz_sorted, order, codes_sorted, n)


def knn_window_sorted_raw(sup: "SortedCloud", qry: "SortedCloud", k, *,
                          query_chunk=256, window=2048, self_query=False):
    """Window KNN between pre-sorted clouds, STAYING in sorted space.

    Returns (idx, starts): idx [nq, k] indexes the support's SORTED rows
    (rows in the query's SORTED order), starts [nq_pad/query_chunk] are the
    128-aligned per-tile window offsets — together they carry the invariant
    idx[tile t] ∈ [starts[t], starts[t]+window) that ops.gather.gather_window
    relies on. The sorted-space model path (models.randlanet) consumes these
    directly, skipping the two O(nq·k)-row unsort gathers that cost ~36 ms
    per 40960-pt layer on this platform."""
    ns, nq = sup.n_real, qry.n_real
    nq_pad = _round_up(nq, query_chunk)
    q_sorted = jnp.concatenate(
        [qry.xyz_sorted[:nq],
         jnp.broadcast_to(qry.xyz_sorted[nq - 1], (nq_pad - nq, 3))], axis=0
    )
    ns_pad = sup.xyz_sorted.shape[0]
    num_tiles = nq_pad // query_chunk
    if self_query:
        centers = (
            jnp.arange(num_tiles, dtype=jnp.int32) * query_chunk
            + query_chunk // 2
        )
        pos_med = centers
    else:
        q_codes = jnp.concatenate(
            [qry.codes_sorted, jnp.broadcast_to(qry.codes_sorted[nq - 1],
                                                (nq_pad - nq,))]
        )
        pos = jnp.searchsorted(sup.codes_sorted, q_codes).astype(jnp.int32)
        pos_med = jnp.median(pos.reshape(-1, query_chunk), axis=1).astype(
            jnp.int32
        )
    starts = jnp.clip(pos_med - window // 2, 0, ns_pad - window)
    starts = (starts // 128) * 128
    # (a chunked variant with per-chunk skip against a scalar kth bound was
    # tried to cut the k-step extraction: exact, but NO chunk ever skips —
    # the bound is a max over 256 rows and nearly every tile contains a
    # morton-outlier row — and the per-chunk overheads made it 2× slower)
    rel = _run_window_pallas(
        sup.xyz_sorted, q_sorted, starts, k, query_chunk, window
    )
    out_sorted = jnp.repeat(starts, query_chunk)[:, None] + rel
    # sentinel picks (only possible when the last window overhangs the pad
    # rows) clamp to the last real row, which stays inside that window
    out_sorted = jnp.minimum(out_sorted, ns - 1)
    return out_sorted[:nq], starts


def knn_window_sorted(sup: "SortedCloud", qry: "SortedCloud", k, *,
                      query_chunk=256, window=2048, self_query=False):
    """Window KNN between pre-sorted clouds; indices returned in the ORIGINAL
    support order, rows in the ORIGINAL query order.

    self_query=True (support IS the query cloud): each query's morton rank is
    its own position, so the per-tile window starts are static — no
    searchsorted / median reduction at all."""
    out_sorted, _ = knn_window_sorted_raw(
        sup, qry, k, query_chunk=query_chunk, window=window,
        self_query=self_query,
    )
    out = sup.order[out_sorted]
    return out[invert_permutation(qry.order)]


def _merge_probes(support, query, idx1, idx2, k):
    """Merge two candidate neighbor sets by exact distance, deduplicated.

    idx1, idx2: [nq, k] support row ids. Sort the 2k candidates by id so
    duplicates are adjacent (their distances set to +inf), then top-k by
    distance. All ops are [nq, 2k]-shaped — negligible next to the search."""
    both = jnp.concatenate([idx1, idx2], axis=-1)                  # [nq, 2k]
    cand = support[both]                                           # [nq,2k,3]
    d2 = jnp.sum((query[:, None, :] - cand) ** 2, axis=-1)
    ordr = jnp.argsort(both, axis=-1)
    ids = jnp.take_along_axis(both, ordr, axis=-1)
    d2s = jnp.take_along_axis(d2, ordr, axis=-1)
    dup = jnp.concatenate(
        [jnp.zeros_like(ids[:, :1], bool), ids[:, 1:] == ids[:, :-1]], axis=-1
    )
    d2s = jnp.where(dup, jnp.inf, d2s)
    _, sel = jax.lax.top_k(-d2s, k)
    return jnp.take_along_axis(ids, sel, axis=-1)


def knn_window(support, query, k, *, query_chunk=256, window=2048,
               impl="auto", probes=1, curve=None):
    """Morton-window KNN (approximate; recall ≥0.95 at the defaults on scene
    data, gated in tests). impl: 'pallas' (fused kernel, TPU), 'xla', 'auto'.

    probes=2 runs a second search on a half-range-shifted grid (morton_codes
    shift=512) and merges by exact distance: neighbor pairs split by a major
    z-order plane land in the second probe's window. Measured on 40960-pt
    scenes at window=2048: recall 0.899→0.953 (uniform), 0.947→0.966 (rooms)
    for 2× search cost — dual-2048 beats single-4096 on uniform scenes at
    equal total window work."""
    import jax as _jax

    ns = jnp.shape(support)[-2]
    if ns <= window or ns < 2 * k:
        return knn_approx(support, query, k)
    if impl == "auto":
        impl = "pallas" if _jax.default_backend() == "tpu" else "xla"
    qc = min(query_chunk, _round_up(jnp.shape(query)[-2], 128))
    if impl == "pallas":
        if k > 16 or window > 4096:
            raise ValueError("pallas window kernel supports k ≤ 16, window ≤ 4096")
        single, qc_eff = _knn_window_single_pallas, qc
    else:
        single, qc_eff = _knn_window_single, max(qc, 512)
    if probes == 1:
        return _batched(single)(
            support, query, k, query_chunk=qc_eff, window=window,
            curve=curve,
        )

    def dual(s, q, kk, query_chunk, window, curve):
        i1 = single(s, q, kk, query_chunk, window, 0, curve)
        i2 = single(s, q, kk, query_chunk, window, 512, curve)
        return _merge_probes(s, q, i1, i2, kk)

    return _batched(dual)(
        support, query, k, query_chunk=qc_eff, window=window, curve=curve
    )


# ---------------------------------------------------------------------------
# exact XLA engine: k-step extraction merge
# ---------------------------------------------------------------------------


def _extract_merge(neg_d2, cand_i, best_v, best_i, k):
    """Merge a candidate tile into the sorted-desc running top-k by k
    iterations of (max, argmax, mask, insert+bubble)."""
    qc, ts = neg_d2.shape

    def ext(t, st):
        nd, bv, bi = st
        m = jnp.max(nd, axis=1, keepdims=True)
        am = jnp.argmax(nd, axis=1)
        sel = jax.lax.broadcasted_iota(jnp.int32, (qc, ts), 1) == am[:, None]
        gi = jnp.sum(jnp.where(sel, cand_i, 0), axis=1, keepdims=True)
        worst = bv[:, k - 1 : k]
        take = m > worst
        ins_v = jnp.where(take, m, worst)
        ins_i = jnp.where(take, gi, bi[:, k - 1 : k])
        bv = jnp.concatenate([bv[:, : k - 1], ins_v], axis=1)
        bi = jnp.concatenate([bi[:, : k - 1], ins_i], axis=1)
        bv, bi = _bubble_desc(bv, bi, k)
        nd = jnp.where(sel, _NEG_BIG, nd)
        return nd, bv, bi

    _, best_v, best_i = jax.lax.fori_loop(
        0, k, ext, (neg_d2, best_v, best_i), unroll=False
    )
    return best_v, best_i


def _bubble_desc(v, i, k):
    """One bubble pass: floats the (single out-of-place) tail element to its
    slot, keeping rows sorted descending."""
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
def _knn_xla_single(support, query, k, query_chunk, support_chunk):
    ns, nq = support.shape[0], query.shape[0]
    ns_pad = _round_up(ns, support_chunk)
    nq_pad = _round_up(nq, query_chunk)

    support_p = jnp.pad(support, ((0, ns_pad - ns), (0, 0)))
    sq_s = jnp.sum(support_p * support_p, axis=-1)
    # padded support rows get a huge squared norm → never selected
    sq_s = jnp.where(jnp.arange(ns_pad) < ns, sq_s, jnp.float32(-_NEG_BIG))
    query_p = jnp.pad(query, ((0, nq_pad - nq), (0, 0)))

    def qbody(q):
        sq_q = jnp.sum(q * q, axis=-1, keepdims=True)

        def sbody(carry, si):
            bv, bi = carry
            start = si * support_chunk
            s = jax.lax.dynamic_slice_in_dim(support_p, start, support_chunk, 0)
            sn = jax.lax.dynamic_slice_in_dim(sq_s, start, support_chunk, 0)
            neg_d2 = (
                2.0 * jnp.dot(q, s.T, precision=_HIGH) - sq_q - sn[None, :]
            )
            idx = start + jax.lax.broadcasted_iota(
                jnp.int32, (query_chunk, support_chunk), 1
            )
            if k <= 24:
                # k-step extraction: ~5× faster than a top_k sort on TPU,
                # but its unrolled insertion network grows with k²
                return _extract_merge(neg_d2, idx, bv, bi, k), None
            merged_v = jnp.concatenate([bv, neg_d2], axis=1)
            merged_i = jnp.concatenate([bi, idx], axis=1)
            new_v, sel = jax.lax.top_k(merged_v, k)
            new_i = jnp.take_along_axis(merged_i, sel, axis=1)
            return (new_v, new_i), None

        bv0 = jnp.full((query_chunk, k), _NEG_BIG, jnp.float32)
        bi0 = jnp.zeros((query_chunk, k), jnp.int32)
        (bv, bi), _ = jax.lax.scan(
            sbody, (bv0, bi0), jnp.arange(ns_pad // support_chunk)
        )
        return bi

    qs = query_p.reshape(nq_pad // query_chunk, query_chunk, 3)
    out = jax.lax.map(qbody, qs).reshape(nq_pad, k)
    return out[:nq]


def knn_xla(support, query, k, *, query_chunk=1024, support_chunk=4096):
    """Exact batched KNN, sorted ascending by distance."""
    ns = jnp.shape(support)[-2]
    nq = jnp.shape(query)[-2]
    support_chunk = min(support_chunk, _round_up(ns, 128))
    query_chunk = min(query_chunk, _round_up(nq, 128))
    return _batched(_knn_xla_single)(
        support, query, k, query_chunk=query_chunk, support_chunk=support_chunk
    )


# ---------------------------------------------------------------------------
# Pallas engine
# ---------------------------------------------------------------------------


def _knn_kernel(qx_ref, sx_ref, out_i_ref, best_v, best_i, *, k, ts, ns_real):
    """One grid step = one query tile vs the full support (looped in TS tiles).

    qx_ref: [TQ, 128] query xyz lane-padded (x,y,z in lanes 0..2).
    sx_ref: [8, Ns_pad] support xyz sublane-packed (x,y,z in sublanes 0..2) —
    the whole support stays VMEM-resident (8·Ns·4 B ≈ 1.3 MB at Ns=40960,
    vs 21 MB for a lane-padded layout which spills out of VMEM).
    """
    tq = qx_ref.shape[0]
    qx = qx_ref[:, 0:1]
    qy = qx_ref[:, 1:2]
    qz = qx_ref[:, 2:3]

    best_v[:] = jnp.full((tq, k), _NEG_BIG, dtype=jnp.float32)
    best_i[:] = jnp.zeros((tq, k), dtype=jnp.int32)

    num_s_tiles = sx_ref.shape[1] // ts

    def s_tile(si, _):
        start = si * ts
        s = sx_ref[:, pl.ds(start, ts)]       # [8, TS]
        sxr = s[0:1, :]                       # [1, TS]
        syr = s[1:2, :]
        szr = s[2:3, :]
        dx = qx - sxr
        dy = qy - syr
        dz = qz - szr
        neg_d2 = -(dx * dx + dy * dy + dz * dz)
        cand_i = start + jax.lax.broadcasted_iota(jnp.int32, (tq, ts), 1)
        neg_d2 = jnp.where(cand_i < ns_real, neg_d2, _NEG_BIG)
        bv, bi = _extract_merge(neg_d2, cand_i, best_v[:], best_i[:], k)
        best_v[:] = bv
        best_i[:] = bi
        return ()

    jax.lax.fori_loop(0, num_s_tiles, s_tile, (), unroll=False)
    out_i_ref[:] = best_i[:]


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _knn_pallas_single(support, query, k, tq, ts):
    ns, nq = support.shape[0], query.shape[0]
    ns_pad = _round_up(ns, ts)
    nq_pad = _round_up(nq, tq)
    sp = jnp.zeros((8, ns_pad), jnp.float32).at[:3, :ns].set(support.T)
    qp = jnp.zeros((nq_pad, 128), jnp.float32).at[:nq, :3].set(query)

    kernel = functools.partial(_knn_kernel, k=k, ts=ts, ns_real=ns)
    out = pl.pallas_call(
        kernel,
        grid=(nq_pad // tq,),
        in_specs=[
            pl.BlockSpec((tq, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ns_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
    """Exact Pallas-tiled KNN; same contract as knn_xla."""
    return _batched(_knn_pallas_single)(support, query, k, tq=tile_q, ts=tile_s)


def knn(support, query, k, *, engine="xla", **kw):
    """Drop-in equivalent of the reference's DP.knn_search (helper_tool.py:173-183).

    engine: "xla" (exact, default), "approx" (≥99% recall, ~14× faster on
    big clouds — the model-pyramid default), "pallas"."""
    if engine == "xla":
        return knn_xla(support, query, k, **kw)
    if engine == "approx":
        return knn_approx(support, query, k, **kw)
    if engine == "window":
        return knn_window(support, query, k, **kw)
    if engine == "pallas":
        return knn_pallas(support, query, k, **kw)
    raise ValueError(f"unknown knn engine {engine!r}")
