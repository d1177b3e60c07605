"""Windowed neighbor-feature gather as a Pallas MXU kernel.

XLA's general gather on this TPU platform costs ~12 ns per gathered ROW
regardless of row width (measured: [6,40960·16] rows ≈ 48 ms whether C is 8,
32 or 128 lanes, f32 or bf16) — it is the hot op of the RandLA-Net forward
(the reference instead pays this cost on CPU inside tf_map + tf.batch_gather,
SSDR_AL_s3dis/RandLANet.py:561-570).

This kernel exploits the window invariant of the morton-sorted KNN engine
(ops/knn.py): every neighbor index of a sorted query tile lies inside that
tile's search window [start, start+W). The gather then becomes, per tile, a
one-hot × value-slab matmul on the MXU with the slab VMEM-resident:

    out[q, j, :] = onehot(idx[q,j] − start) @ values[start : start+W, :]

Measured on the bench block (B=6, N=40960, k=16, W=4096): ~24 ms vs 48 ms
for the XLA gather — and the cost is shared across all channels gathered in
the same call, so callers should CONCATENATE everything they need per
neighbor (xyz + features) into one call. The one-hot matmul runs in bf16
(rounds gathered values to bfloat16, rel err ≤ 2⁻⁸ — fine for activations;
exact-parity mode uses the XLA gather instead, engine="window_og").

Backward: gather's VJP is a scatter-add of the cotangent into the value rows;
implemented with XLA's scatter (correct everywhere, only training pays it).

The batch dimension is part of the pallas grid (NOT vmap — vmapping a
pallas_call with a whole-array operand re-materializes the output per batch
element on the VMEM stack and OOMs).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Kernel-vs-XLA crossover, shared by every call site (LFA gathers in
# models.randlanet.gather_neighbour_fast AND pool gathers in random_sample):
# the one-hot kernel pays ~W·C_pad·2 FLOP per gathered row vs XLA's flat
# ~12 ns/row. With the matmul-extraction epilogue (1.73× on the old kernel)
# the measured crossover moved from ~300k to ~560k: pool L1 W=4352·C=128
# (WC=557k) → kernel 6.03 vs XLA 6.52 ms. Above it stays XLA — Semantic3D's
# LFA W=4096·C_pad=160 (655k) also VMEM-OOMs the TQ=512 kernel (out block
# [512, 16·160] f32 + f32 y-tiles exceed the 16M scoped limit).
KERNEL_MAX_WC = 560_000

# SSDR_DEBUG_WINDOW_GUARD=1 makes gather_window_auto report clamped indices
# at runtime (jax.debug.print inside jit) instead of clamping silently —
# the spread invariant becomes observable in production, not just in
# tests/bench (window_violations).
DEBUG_WINDOW_GUARD = os.environ.get("SSDR_DEBUG_WINDOW_GUARD", "") == "1"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gather_kernel(start_ref, idx_ref, f_hbm, out_ref, slab, sem,
                   *, k, window, c, tq, fold):
    """One query tile: DMA the window slab HBM→VMEM, then per neighbor a
    GROUP one-hot matmul + lane-block selection.

    The slab is stored FOLDED as [W/F, F·C] (F consecutive points per row) so
    (a) the HBM slice is lane-aligned, and
    (b) the one-hot is built over W/F group columns instead of W — F× less
    VPU work, which is what bounds the flat formulation. The matmul fetches
    the whole F-point group [TQ, FC]; a cheap masked strided sum then picks
    the right C-lane block. F is chosen so the matmul's N dim (F·C lanes) is
    ≥256: at N=128 the bf16 MXU runs at ~22% peak, at N≥256 ~80% (measured,
    see gather_window). All refs stay 2-D (the batch dim is flattened
    into rows by the wrapper — whole-array VMEM residency of batched values
    both overflows VMEM and trips an XLA scoped-vmem placement bug)."""
    i = pl.program_id(0)
    start = pl.multiple_of(start_ref[i], 128)
    wg = window // fold
    dma = pltpu.make_async_copy(
        f_hbm.at[pl.ds(pl.multiple_of(start // fold, 128 // fold), wg), :],
        slab, sem,
    )
    dma.start()
    local = idx_ref[...] - start                                   # [TQ, k]
    group = local // fold                                          # [TQ, k]
    within = local - group * fold
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (tq, wg), 1)
    lane_blk = jax.lax.broadcasted_iota(jnp.int32, (tq, fold * c), 1) // c
    # strided-sum matrix S[l, m] = (l % c == m): after the per-query lane-
    # block mask, ym @ S collapses the fold lane blocks into one C block on
    # the MXU. Replacing the previous `fold`-way [TQ, c] slice-sum (narrow-
    # lane VPU work) with this matmul is exact (ym rows hold one surviving
    # bf16 value per lane) and measured 1.73× on the LFA gather shape
    # (B=6 N=40960 k=16 C=16 W=4096 TQ=512: 14.5 → 8.35 ms).
    s_r = jax.lax.broadcasted_iota(jnp.int32, (fold * c, c), 0) % c
    s_c = jax.lax.broadcasted_iota(jnp.int32, (fold * c, c), 1)
    smat = (s_r == s_c).astype(jnp.bfloat16)
    dma.wait()
    s16 = slab[...]                             # [W/F, FC] bf16 (pre-cast)
    # (stacking several neighbors into one [J·TQ, W/F] matmul was tried to
    # cut VPU↔MXU alternations; Mosaic can't concat [TQ,1] blocks along
    # sublanes — "result/input offset mismatch on non-concat dimension")
    for j in range(k):
        oh = (iota_g == group[:, j][:, None]).astype(jnp.bfloat16)
        y = jnp.dot(oh, s16, preferred_element_type=jnp.float32)   # [TQ, FC]
        ym = y * (lane_blk == within[:, j][:, None]).astype(jnp.float32)
        # bf16 store is LOSSLESS (values were rounded to bf16 at the slab
        # cast; each ym row holds one surviving bf16 value per lane) and
        # halves the [B·Nq, k·C] output write — the gather's cost is
        # output-HBM-bound, not window-bound, at production shapes
        # (W 4096→2048 moved it only 8.35→~7.5 ms; bf16 out is the lever)
        out_ref[:, j * c:(j + 1) * c] = jnp.dot(
            ym.astype(jnp.bfloat16), smat,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def _pick_fold(c: int, window: int) -> int:
    """Points per slab group. Swept fold ∈ {8,16} × tq ∈ {128,256,512} on the
    LFA gather shape (C=16, W=4096/4352): fold=8 wins everywhere (fold=16
    halves the one-hot K dim, which hurts more than the wider N helps);
    window alignment dominates instead — W=4096 (K=512) runs 21% faster
    than W=4352 (K=544) at tq=512."""
    return 8


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gather_window(values, idx, starts, window: int, tq: int = 128):
    """values [B, N, C]; idx [B, Nq, k] row indices with the guarantee
    idx[b, t·tq:(t+1)·tq] ∈ [starts[b,t], starts[b,t]+window); starts
    [B, Nq/tq] int32, 128-aligned. Returns [B, Nq, k, C] bfloat16 (values
    are rounded to bf16 for the MXU one-hot matmul, so the bf16 output is
    exact; it also halves the dominant HBM write).

    N must be a multiple of 128, Nq a multiple of tq, and k·C a multiple
    of 128 (pad C with pad_channels — pad channels ride for free)."""
    return _gather_window_impl(values, idx, starts, window, tq)


def _gather_window_impl(values, idx, starts, window, tq, fold=None):
    b, n, c = values.shape
    _, nq, k = idx.shape
    assert n % 128 == 0 and nq % tq == 0, (n, nq)
    assert c % 16 == 0 and (k * c) % 128 == 0, (k, c)
    # bf16 slab rows pack (16, 128) tiles: the DMA offset (start/fold) and
    # extent (window/fold) must stay 16-sublane aligned
    assert window % 128 == 0, window
    if fold is None:
        fold = _pick_fold(c, window)
    tiles = nq // tq
    # flatten the batch into rows; windows never cross batch boundaries
    # because each start stays within its own batch's [b·n, (b+1)·n) range.
    # Values round to bf16 HERE (not in-kernel): halves the per-tile slab
    # DMA and drops 480×[W/8, FC] in-kernel casts
    values_f = values.astype(jnp.bfloat16).reshape(b * n // fold, fold * c)
    row_off = (jnp.arange(b, dtype=jnp.int32) * n)[:, None]
    idx_f = (idx.reshape(b, nq * k) + row_off).reshape(b * nq, k)
    starts_f = (starts + row_off).reshape(-1)
    kernel = functools.partial(
        _gather_kernel, k=k, window=window, c=c, tq=tq, fold=fold
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * tiles,),
        in_specs=[
            pl.BlockSpec((tq, k), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((tq, k * c), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((window // fold, fold * c), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * nq, k * c), jnp.bfloat16),
    )(starts_f, idx_f, values_f)
    return out.reshape(b, nq, k, c)


def _scatter_kernel(start_ref, idx_ref, idxt_ref, g_ref, out_ref, acc,
                    *, k, window, c, tq, fold, tiles):
    """Transpose of _gather_kernel: scatter-add the cotangent rows back into
    the (folded) value rows via OHᵀ @ G matmuls, accumulating the WHOLE
    batch-element slab in VMEM across its (sequential) grid tiles.

    XLA's scatter-add pays the same flat ~12 ns/row as its gather; this
    kernel pays the gather kernel's own W·C_pad FLOP cost instead — the same
    crossover economics as the forward. idxt (the [k, TQ] transpose of idx)
    is passed separately because building a [wg, TQ] one-hot needs the
    neighbor ids laid along LANES, and Mosaic cannot transpose the [TQ, k]
    block in-kernel (sublane↔lane reshape).
    """
    it = pl.program_id(1)
    start = pl.multiple_of(start_ref[pl.program_id(0) * tiles + it], 128)
    wg = window // fold
    sg = pl.multiple_of(start // fold, 128 // fold)

    @pl.when(it == 0)
    def _zero():
        acc[...] = jnp.zeros_like(acc)

    local_t = idxt_ref[...] - start                    # [k, TQ]
    group_t = local_t // fold
    local = idx_ref[...] - start                       # [TQ, k]
    within = local - (local // fold) * fold
    lane_blk = jax.lax.broadcasted_iota(jnp.int32, (tq, fold * c), 1) // c
    rows_w = jax.lax.broadcasted_iota(jnp.int32, (wg, tq), 0)
    # placement matrix P[r, l] = (l % c == r): g_j @ P tiles g_j into all
    # fold lane blocks (lane-block broadcast via MXU — Mosaic has no cheap
    # lane-tile op)
    p_r = jax.lax.broadcasted_iota(jnp.int32, (c, fold * c), 0)
    p_l = jax.lax.broadcasted_iota(jnp.int32, (c, fold * c), 1) % c
    pmat = (p_r == p_l).astype(jnp.bfloat16)

    a = jnp.zeros((wg, fold * c), jnp.float32)
    for j in range(k):
        g_j = g_ref[:, j * c:(j + 1) * c].astype(jnp.bfloat16)
        t = jnp.dot(g_j, pmat, preferred_element_type=jnp.float32)
        t = t * (lane_blk == within[:, j][:, None]).astype(jnp.float32)
        oht = (rows_w == group_t[j:j + 1, :]).astype(jnp.bfloat16)
        a = a + jnp.dot(oht, t.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    acc[pl.ds(sg, wg), :] += a

    @pl.when(it == tiles - 1)
    def _flush():
        out_ref[...] = acc[...]


def _scatter_window_impl(g, idx, starts, n, window, tq, fold):
    b, nq, k, c = g.shape
    tiles = nq // tq
    g_f = g.reshape(b * nq, k * c)
    idx_f = idx.reshape(b * nq, k)
    idxt_f = jnp.swapaxes(idx, 1, 2).reshape(b * k, nq)
    starts_f = starts.reshape(-1)
    kernel = functools.partial(
        _scatter_kernel, k=k, window=window, c=c, tq=tq, fold=fold,
        tiles=tiles,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec((tq, k), lambda ib, it, s: (ib * tiles + it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tq), lambda ib, it, s: (ib, it),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, k * c), lambda ib, it, s: (ib * tiles + it, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n // fold, fold * c),
                               lambda ib, it, s: (ib, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n // fold, fold * c), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * n // fold, fold * c),
                                       jnp.float32),
    )(starts_f, idx_f, idxt_f, g_f)
    return out.reshape(b, n, c)


def _gather_window_fwd(values, idx, starts, window, tq):
    # zero-size token carries values' static shape+dtype into the bwd rule
    token = jnp.zeros((0,) + values.shape, values.dtype)
    return (_gather_window_impl(values, idx, starts, window, tq),
            (token, idx, starts))


def _scatter_fits_vmem(n: int, c: int, tq: int, k: int) -> bool:
    """The scatter kernel holds the whole batch-element value slab in VMEM
    THREE times (out block + accumulator + the out-write copy) plus
    [tq, k·c] g/t temporaries; at c=128 (pool L1, n=10240) that blows the
    16M scoped limit (measured compile failure), and with the bf16 gather
    output the pool-L0 shape (n=40960, c=32, tq=128) measured 16.86M —
    matching 3·n·c·4 + 4·tq·k·c·4, not the 2· model this gate first used.
    Oversize cases fall back to XLA's scatter-add — the same cost that
    call site paid before the forward flipped to the kernel."""
    return 3 * n * c * 4 + 4 * tq * k * c * 4 <= 13_000_000


def _scatter_parts(n: int, c: int, tq: int, k: int) -> int:
    """Number of contiguous channel slices to split the backward scatter
    into (0 = no split fits → XLA scatter-add fallback). The footprint is
    linear in c (three [n, c] slabs), so an oversize shape can run as
    `parts` narrower launches — each re-pays only the one-hot builds (the
    per-j matmuls shrink with c). Recovers pool-L0 (n=40960, c=32: 16.9M
    whole → 8.6M halved) and pool-L1 (n=10240, c=128: 19.9M → 10.0M at
    c=64) from the fallback."""
    parts = 1
    while not _scatter_fits_vmem(n, c // parts, tq, k):
        nxt = parts * 2
        if (c % nxt or c // nxt < 16 or (k * (c // nxt)) % 128):
            return 0
        parts = nxt
    return parts


def _gather_window_bwd(window, tq, res, g):
    token, idx, starts = res
    _, b, n, c = token.shape
    k = idx.shape[-1]
    parts = _scatter_parts(n, c, tq, k)
    if jax.default_backend() == "tpu" and parts:
        cs = c // parts
        fold = _pick_fold(cs, window)
        dv = jnp.concatenate([
            _scatter_window_impl(
                g[..., i * cs:(i + 1) * cs].astype(jnp.float32),
                idx, starts, n, window, tq, fold,
            )
            for i in range(parts)
        ], axis=-1)
    else:
        # scatter-add the cotangent rows back into the value rows
        flat = idx.reshape(b, -1)
        g2 = g.reshape(b, -1, c)
        dv = jax.vmap(
            lambda i, gg: jnp.zeros((n, c), jnp.float32).at[i].add(gg)
        )(flat, g2)
    return dv.astype(token.dtype), None, None


gather_window.defvjp(_gather_window_fwd, _gather_window_bwd)


def tile_min_starts(idx, n: int, window: int, tq: int):
    """Per-tile 128-aligned window starts derived from the indices' own
    minimum. idx [B, Nq, k] → starts [B, Nq/tq] int32 in [0, n-window]."""
    b, nq, k = idx.shape
    tiles = nq // tq
    mn = jnp.min(idx.reshape(b, tiles, tq * k), axis=-1).astype(jnp.int32)
    return jnp.clip((mn // 128) * 128, 0, max(n - window, 0))


def gather_window_auto(values, idx, window: int, tq: int = 128):
    """gather_window for index sets that are *windowed but whose starts
    aren't carried*: pool and upsample gathers on the sorted fast path
    (models.randlanet). pool_idx rows are neigh rows of the KEPT subset, so
    each tq-query tile's indices span at most (search window + kept-position
    spread); deriving the start from the tile's own min index and adding
    slack to `window` covers that span. Indices are clamped into the derived
    window — a clamp only fires when a tile's index spread exceeds `window`
    (requires a ~10σ density fluctuation of the random kept subset; measured
    zero violations at production sizes, gated in tests/test_knn.py).

    Returns [B, Nq, k, C] bfloat16 (exact for bf16-rounded values, as
    gather_window).
    """
    n = values.shape[1]
    window = min(window, n)
    assert window % 8 == 0, window
    starts = tile_min_starts(idx, n, window, tq)
    lo = jnp.repeat(starts, tq, axis=1)[..., None]
    idx_c = jnp.clip(idx, lo, lo + (window - 1))
    if DEBUG_WINDOW_GUARD:
        bad = jnp.sum(idx_c != idx)
        jax.lax.cond(
            bad > 0,
            lambda: jax.debug.print(
                "gather_window_auto: {} indices clamped (window={} too "
                "narrow for this tile spread — results use wrong neighbors)",
                bad, window),
            lambda: None,
        )
    return gather_window(values, idx_c, starts, window, tq)


def window_violations(idx, window: int, tq: int = 128) -> jax.Array:
    """Count of indices gather_window_auto would clamp (test/bench gate)."""
    b, nq, k = idx.shape
    tiles = nq // tq
    r = idx.reshape(b, tiles, tq * k)
    spread = jnp.max(r, axis=-1) - jnp.min(r, axis=-1)
    # min is 128-aligned down, so the effective span budget shrinks by ≤127
    return jnp.sum(jnp.maximum(spread - (window - 128), 0) > 0)


def pad_channels(x, multiple_of: int = 16, k: int = 16):
    """Pad the channel axis so C is a multiple of 16 (folded-slab lane
    alignment) and k·C a multiple of 128; returns (padded, original_c)."""
    c = x.shape[-1]
    target = _round_up(c, multiple_of)
    while (k * target) % 128:
        target += multiple_of
    if target == c:
        return x, c
    pad = [(0, 0)] * (x.ndim - 1) + [(0, target - c)]
    return jnp.pad(x, pad), c
