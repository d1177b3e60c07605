"""RandLA-Net for TPU: in-graph neighborhoods, fused gather+MLP blocks.

Re-design of the reference TF1 network (SSDR_AL_s3dis/RandLANet.py:140-180 and
its building blocks 505-585) as a flax module. Architectural parity:

  fc0 (6→8, BN, leakyReLU)                          RandLANet.py:144-146
  5 × [dilated_res_block → random_sample]           RandLANet.py:150-157
      dilated_res_block = mlp(d/2) → LFA → mlp(2d) + shortcut, leakyReLU
                                                    RandLANet.py:505-512
      LFA = 2 × [relative_pos_encoding → attentive pooling]
                                                    RandLANet.py:514-535, 572-585
      random_sample = gather(pool_idx) + max over k RandLANet.py:537-548
  bottleneck 1×1 conv                               RandLANet.py:159-161
  5 × [nearest_interpolation → concat skip → 1×1 conv]
                                                    RandLANet.py:164-172
  head fc1(64) → fc2(32)=penultimate → dropout(0.5) → fc(C)
                                                    RandLANet.py:174-180

All 1×1 convs are Dense layers over the channel axis; BN is
momentum 0.99 / eps 1e-6 and every activated layer uses leaky_relu(0.2),
matching helper_tf_util.conv2d:111-166.

The key TPU difference: the reference feeds per-layer KNN / pool / upsample
indices from a CPU DataLoader (`tf_map`, s3dis_dataset.py:156-183 — its hot
preprocessing loop). Here `build_pyramid` computes them **in-graph** with the
on-device KNN kernel, so an entire train step (pyramid + forward + loss +
backward) is one compiled XLA program with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ssdr_al_tpu.config import Config
from ssdr_al_tpu.ops.knn import knn

# Initializers mirroring the reference: conv kernels truncated-normal σ=1e-3
# (helper_tf_util._variable_with_weight_decay, use_xavier=False default),
# dense layers glorot-uniform (tf.layers.dense default).
_CONV_INIT = nn.initializers.truncated_normal(stddev=1e-3)
_DENSE_INIT = nn.initializers.glorot_uniform()

# queries per windowed-gather kernel tile (ops/gather.py); larger tiles
# amortize per-tile DMA/dispatch (measured 22.8→17.3 ms at 512 on the
# bench block) at the cost of a (TQ−256)-wider slab window
_GATHER_TQ = 512


def leaky_relu(x):
    return jax.nn.leaky_relu(x, negative_slope=0.2)


class SharedMLP(nn.Module):
    """1×1 conv (+BN, +leakyReLU) over the channel axis — helper_tf_util.conv2d."""

    features: int
    bn: bool = True
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(self.features, kernel_init=_CONV_INIT, dtype=self.dtype)(x)
        if self.bn:
            x = nn.BatchNorm(
                momentum=0.99, epsilon=1e-6, use_running_average=not train,
                dtype=self.dtype,
            )(x)
        if self.act:
            x = leaky_relu(x)
        return x


def gather_neighbour(pc, neighbor_idx):
    """pc [B, N, C], neighbor_idx [B, M, k] → [B, M, k, C] (RandLANet.py:561-570)."""
    b, m, k = neighbor_idx.shape
    flat = neighbor_idx.reshape(b, m * k)
    out = jnp.take_along_axis(pc, flat[..., None], axis=1)
    return out.reshape(b, m, k, pc.shape[-1])


def gather_neighbour_fast(pc, neighbor_idx, starts, window: int):
    """gather_neighbour through the windowed Pallas MXU kernel when the
    sorted-space window invariant holds (starts per gather tile from the
    KNN search; see ops/gather.py) AND the cost model favors it: the kernel
    pays ~W·C_pad·2 FLOP per gathered row (~40-80 TF/s) vs XLA's flat
    ~12 ns/row, so it wins iff W·C_pad ≲ KERNEL_MAX_WC (shared measured
    crossover, ops/gather.py; e.g. S3DIS L0 both-gather 4096·16=66k →
    2.3× win; Semantic3D's 4096-pt layer at C=144 → 590k, a wash — stay
    on XLA). Values round to bf16 in the kernel."""
    if starts is None:
        return gather_neighbour(pc, neighbor_idx)
    from ssdr_al_tpu.ops.gather import (
        KERNEL_MAX_WC, gather_window, pad_channels,
    )

    c = pc.shape[-1]
    k = neighbor_idx.shape[-1]
    pc_pad, _ = pad_channels(pc, k=k)
    if window * pc_pad.shape[-1] > KERNEL_MAX_WC:
        return gather_neighbour(pc, neighbor_idx)
    out = gather_window(pc_pad, neighbor_idx, starts, window, _GATHER_TQ)
    return out[..., :c]


def relative_pos_encoding(xyz, neigh_idx, neighbor_xyz=None):
    """10-d per-edge geometry: [dist, rel_xyz, xyz, neigh_xyz] (RandLANet.py:529-535).

    neighbor_xyz may be passed in pre-gathered (the fast path gathers xyz and
    features in one fused kernel call)."""
    if neighbor_xyz is None:
        neighbor_xyz = gather_neighbour(xyz, neigh_idx)             # [B,N,k,3]
    xyz_tile = jnp.broadcast_to(
        xyz[:, :, None, :], neighbor_xyz.shape
    )
    relative_xyz = xyz_tile - neighbor_xyz
    relative_dis = jnp.sqrt(
        jnp.maximum(jnp.sum(relative_xyz**2, axis=-1, keepdims=True), 1e-20)
    )
    return jnp.concatenate(
        [relative_dis, relative_xyz, xyz_tile, neighbor_xyz], axis=-1
    )


def random_sample(feature, pool_idx, window: int = 0):
    """Max-pool features of the k neighbors of each kept point (RandLANet.py:537-548).

    feature [B, N, C]; pool_idx [B, N', k] → [B, N', C].

    window > 0 (sorted fast path): pool_idx rows are neigh rows of the kept
    subset, so each 128-query tile's indices span ≤ search-window + kept-
    position spread — gather through the windowed MXU kernel with starts
    derived from the indices themselves (ops/gather.gather_window_auto).

    Engine choice is a measured cost model: the kernel pays W·C_pad·2 MXU
    FLOPs per gathered row vs XLA's flat ~12 ns/row; gate at the shared
    KERNEL_MAX_WC crossover (ops/gather.py; with the matmul-extraction
    epilogue the crossover is ~560k: pool L0 W=6400·C=32 kernel win,
    pool L1 W=4352·C=128 → kernel 6.03 vs XLA 6.52 ms)."""
    n, (n_sub, k) = feature.shape[1], pool_idx.shape[1:]
    if window and n % 128 == 0 and n_sub % 128 == 0:
        from ssdr_al_tpu.ops.gather import (
            KERNEL_MAX_WC, gather_window_auto, pad_channels,
        )

        f_pad, c = pad_channels(feature, k=k)
        w_pool = min(window + 2048, n)
        if w_pool * f_pad.shape[-1] <= KERNEL_MAX_WC:
            pooled = gather_window_auto(f_pad, pool_idx, w_pool)
            return jnp.max(pooled[..., :c], axis=2).astype(feature.dtype)
    pooled = gather_neighbour(feature, pool_idx)
    return jnp.max(pooled, axis=2)


def nearest_interpolation(feature, interp_idx):
    """feature [B, N', C]; interp_idx [B, N, 1] → [B, N, C] (RandLANet.py:550-559).

    Stays on XLA's row gather: at k=1 the windowed MXU kernel's one-hot
    build dominates and loses (measured 4.5 vs 3.0 ms on the 40960-row
    decoder gather)."""
    idx = interp_idx[..., 0]
    return jnp.take_along_axis(feature, idx[..., None], axis=1)


class AttPooling(nn.Module):
    """Attentive pooling over the k neighbors (RandLANet.py:572-585)."""

    d_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_set, train: bool):
        # feature_set [B, N, k, d]
        d = feature_set.shape[-1]
        att = nn.Dense(d, use_bias=False, kernel_init=_DENSE_INIT,
                       dtype=self.dtype)(feature_set)
        scores = jax.nn.softmax(att.astype(jnp.float32), axis=2).astype(
            feature_set.dtype
        )
        agg = jnp.sum(feature_set * scores, axis=2)                 # [B, N, d]
        return SharedMLP(self.d_out, dtype=self.dtype, name="mlp")(agg, train)


class BuildingBlock(nn.Module):
    """Local feature aggregation (RandLANet.py:514-527).

    On the sorted-space fast path (starts is not None) the two per-edge
    gathers go through the windowed Pallas kernel, with xyz and features
    CONCATENATED into one call (the kernel's cost is channel-count-free)."""

    d_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, feature, neigh_idx, train: bool,
                 starts=None, window: int = 0):
        d_in = feature.shape[-1]
        if starts is not None:
            both = gather_neighbour_fast(
                jnp.concatenate([xyz, feature.astype(jnp.float32)], axis=-1),
                neigh_idx, starts, window,
            )
            neighbor_xyz = both[..., :3]
            f_neighbours = both[..., 3:].astype(feature.dtype)
        else:
            neighbor_xyz = None
            f_neighbours = gather_neighbour(feature, neigh_idx)     # [B,N,k,d_in]
        f_xyz10 = relative_pos_encoding(
            xyz, neigh_idx, neighbor_xyz
        ).astype(self.dtype)
        f_xyz = SharedMLP(d_in, dtype=self.dtype, name="mlp1")(f_xyz10, train)
        f_concat = jnp.concatenate([f_neighbours, f_xyz], axis=-1)
        f_pc_agg = AttPooling(self.d_out // 2, dtype=self.dtype,
                              name="att_pooling_1")(f_concat, train)

        f_xyz = SharedMLP(self.d_out // 2, dtype=self.dtype, name="mlp2")(f_xyz, train)
        f_neighbours = gather_neighbour_fast(
            f_pc_agg.astype(jnp.float32), neigh_idx, starts, window
        ).astype(f_pc_agg.dtype)
        f_concat = jnp.concatenate([f_neighbours, f_xyz], axis=-1)
        return AttPooling(self.d_out, dtype=self.dtype,
                          name="att_pooling_2")(f_concat, train)


class DilatedResBlock(nn.Module):
    """RandLANet.py:505-512."""

    d_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature, xyz, neigh_idx, train: bool,
                 starts=None, window: int = 0):
        f_pc = SharedMLP(self.d_out // 2, dtype=self.dtype, name="mlp1")(feature, train)
        f_pc = BuildingBlock(self.d_out, dtype=self.dtype, name="lfa")(
            xyz, f_pc, neigh_idx, train, starts, window)
        f_pc = SharedMLP(2 * self.d_out, act=False, dtype=self.dtype,
                         name="mlp2")(f_pc, train)
        shortcut = SharedMLP(2 * self.d_out, act=False, dtype=self.dtype,
                             name="shortcut")(feature, train)
        return leaky_relu(f_pc + shortcut)


@dataclasses.dataclass
class Pyramid:
    """Per-layer neighborhoods; the in-graph analogue of tf_map's input_list."""

    xyz: List[jax.Array]          # [B, N_i, 3]
    neigh_idx: List[jax.Array]    # [B, N_i, k]
    sub_idx: List[jax.Array]      # [B, N_{i+1}, k]   pool indices
    interp_idx: List[jax.Array]   # [B, N_i, 1]       upsample indices


jax.tree_util.register_pytree_node(
    Pyramid,
    lambda p: ((p.xyz, p.neigh_idx, p.sub_idx, p.interp_idx), None),
    lambda _, c: Pyramid(*c),
)


@dataclasses.dataclass
class SortedPyramid:
    """Pyramid in per-layer MORTON-SORTED space (the TPU fast path).

    Keeping the model in sorted space removes the O(N·k)-row index-unsort
    gathers of the search AND lets the per-edge feature gathers use the
    windowed MXU kernel (ops/gather.py): neigh_idx of tile t is guaranteed
    to lie in [starts[t], starts[t]+window) whenever starts is not None.

    order: [B, N] original→sorted gather permutation (x_sorted = x[order]);
    inv:   [B, N] sorted→original (logits_orig = logits_sorted[inv]).
    Layer i+1's sorted order is layer i's restricted to the kept subset (the
    morton key is shared), so `sub_idx`/`interp_idx` stay window-consistent.
    """

    xyz: List[jax.Array]          # [B, N_i, 3] sorted
    neigh_idx: List[jax.Array]    # [B, N_i, k] into layer-i sorted rows
    starts: List[Any]             # [B, N_i/128] per-gather-tile offsets or None
    sub_idx: List[jax.Array]      # [B, N_{i+1}, k] pool indices (layer-i rows)
    interp_idx: List[jax.Array]   # [B, N_i, 1] into layer-(i+1) sorted rows
    order: jax.Array
    inv: jax.Array
    windows: Any = ()             # static per-layer gather window sizes


jax.tree_util.register_pytree_node(
    SortedPyramid,
    lambda p: ((p.xyz, p.neigh_idx, p.starts, p.sub_idx, p.interp_idx,
                p.order, p.inv), tuple(p.windows)),
    lambda aux, c: SortedPyramid(*c, windows=aux),
)


def _pyramid_window_single(xyz, cfg: Config):
    """Window-engine pyramid for one cloud: each layer is morton-sorted ONCE
    and the sorted view is shared by its self-search, pool indices, and the
    next upsample search (3 argsort+gather passes saved per layer)."""
    from ssdr_al_tpu.ops.knn import knn_approx, knn_window_sorted, sort_cloud

    lo = jnp.min(xyz, axis=0)
    hi = jnp.max(xyz, axis=0)

    def self_window(n):
        return 4096 if n > 16384 else 2048

    xyzs, neighs, subs, interps = [], [], [], []
    cur = xyz
    sorted_cur = None
    for i in range(cfg.num_layers):
        n = cur.shape[0]
        n_sub = n // cfg.sub_sampling_ratio[i]
        use_window = n > 4096
        if use_window:
            if sorted_cur is None:
                sorted_cur = sort_cloud(cur, lo, hi)
            neigh = knn_window_sorted(
                sorted_cur, sorted_cur, cfg.k_n, window=self_window(n),
                self_query=True,
            )
        else:
            from ssdr_al_tpu.ops.knn import knn_xla as _knn_xla

            neigh = _knn_xla(cur, cur, cfg.k_n)
        sub_points = cur[:n_sub]
        pool_i = neigh[:n_sub]
        if n_sub > 2048:
            sorted_sub = sort_cloud(sub_points, lo, hi)
            if sorted_cur is None:
                sorted_cur = sort_cloud(cur, lo, hi)
            up_i = knn_window_sorted(sorted_sub, sorted_cur, 1, window=1024)
        else:
            from ssdr_al_tpu.ops.knn import knn_xla as _knn_xla

            sorted_sub = None
            up_i = _knn_xla(sub_points, cur, 1)
        xyzs.append(cur)
        neighs.append(neigh)
        subs.append(pool_i)
        interps.append(up_i)
        cur = sub_points
        sorted_cur = sorted_sub
    return Pyramid(xyzs, neighs, subs, interps)


def _pyramid_window_sorted_single(xyz, cfg: Config):
    """SortedPyramid for one cloud: ONE morton sort at full resolution; every
    layer's order is its restriction (same key), so no further sorts. Layers
    big enough for the window engine carry per-tile starts for the fused
    gather kernel; smaller layers fall back to approx search + XLA gathers
    (still in sorted space)."""
    from ssdr_al_tpu.ops.knn import (
        CURVES,
        DEFAULT_CURVE,
        SortedCloud,
        _run_window_pallas,
        invert_permutation,
        knn_window_sorted_raw,
        knn_xla,
        sort_by_codes,
    )

    GATHER_TQ = _GATHER_TQ
    lo = jnp.min(xyz, axis=0)
    hi = jnp.max(xyz, axis=0)
    # ONE payload-carrying sort (codes, iota, x, y, z): 0.95 ms vs 5.9 ms for
    # argsort + two O(N)-row gathers at [6,40960] (12 ns/row platform tax;
    # scripts/profile_forward.py --sorts). inv via argsort(order) likewise
    # beats the scatter 0.3 vs 1.6 ms.
    codes = CURVES[getattr(cfg, "curve", None) or DEFAULT_CURVE](xyz, lo, hi)
    cur_c, order, cur_x = sort_by_codes(codes, xyz)    # sorted pos → orig idx
    inv = invert_permutation(order)
    cur_r = order                    # original-layer rank of each sorted row

    xyzs, neighs, starts_l, subs, interps, windows = [], [], [], [], [], []
    for i in range(cfg.num_layers):
        n = cur_x.shape[0]
        n_sub = n // cfg.sub_sampling_ratio[i]
        use_window = n > 4096 and n % 256 == 0
        if use_window:
            # search window sized so the MERGED gather window (w + GATHER_TQ
            # − 256, below) lands exactly on cfg.search_window (/2 for mid
            # layers): the gather kernel's one-hot K dim (W/8) then hits
            # 512/256-aligned matmuls — measured 21% faster than W=4352
            # (K=544) at the same recall class (3840 vs 4096 search:
            # recall −0.003 on uniform scenes)
            sw = getattr(cfg, "search_window", 4096)
            w = (sw if n > 16384 else sw // 2) - max(0, _GATHER_TQ - 256)
            sc = SortedCloud(cur_x, None, cur_c, n)
            neigh, sts = knn_window_sorted_raw(
                sc, sc, cfg.k_n, window=w, self_query=True
            )
            # search tiles are 256 queries; the gather kernel amortizes its
            # per-tile fixed costs over GATHER_TQ-query tiles — a gather tile
            # merges GATHER_TQ/256 consecutive search tiles, so its window
            # widens by their start spread (self-query starts are monotone
            # with step ≤ 256)
            if n % GATHER_TQ == 0 and GATHER_TQ > 256:
                sts = sts[:: GATHER_TQ // 256]
                w_g = w + (GATHER_TQ - 256)
                sts = jnp.minimum(sts, n - w_g)
                w = w_g
            elif GATHER_TQ < 256:
                sts = jnp.repeat(sts, 256 // GATHER_TQ)
        elif n >= 2048 and n % max(512, GATHER_TQ) == 0 and n <= 4096:
            # mid layers: the window can cover the WHOLE sorted cloud — the
            # fused kernel then sees every support point in every tile
            # (exact up to its 12-bit packed-distance tie-breaking; max
            # observed d2 drift 2e-4 vs knn_xla) and is ~4× faster than the
            # knn_xla extraction-merge at these sizes (measured 5.5 → ~1.3 ms
            # at n=2560); all-zero starts double as gather-kernel starts
            sc = SortedCloud(cur_x, None, cur_c, n)
            neigh, _ = knn_window_sorted_raw(
                sc, sc, cfg.k_n, window=n, self_query=True
            )
            sts = jnp.zeros(n // GATHER_TQ, jnp.int32)
            w = n
        else:
            # exact XLA knn: approx_min_k is pathologically slow at these
            # sizes on this platform (n=2560 self-search: 23.5 vs 6.3 ms)
            neigh = knn_xla(cur_x, cur_x, cfg.k_n)
            sts, w = None, 0
        # kept subset = first n_sub points of the ORIGINAL order
        # (s3dis_dataset.py:166-167); their sorted positions, increasing
        kept = cur_r < n_sub
        kept_pos = jnp.sort(
            jnp.where(kept, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
        )[:n_sub]
        nxt_x = cur_x[kept_pos]
        nxt_c = cur_c[kept_pos]
        nxt_r = cur_r[kept_pos]
        pool_i = neigh[kept_pos]
        if n_sub > 2048 and n % 256 == 0 and n_sub % 128 == 0:
            # 1-NN upsample search. The support is the KEPT SUBSET of these
            # very rows, so each query's rank in the sub cloud is an exact
            # cumsum — no searchsorted/median pass (saves ~20 ms/forward)
            up_w = 1024
            ranks = jnp.cumsum(kept.astype(jnp.int32)) - 1        # [n]
            centers = jnp.arange(n // 256, dtype=jnp.int32) * 256 + 128
            starts_up = jnp.clip(ranks[centers] - up_w // 2, 0, n_sub - up_w)
            starts_up = (starts_up // 128) * 128
            rel = _run_window_pallas(nxt_x, cur_x, starts_up, 1, 256, up_w)
            up = jnp.minimum(
                jnp.repeat(starts_up, 256)[:, None] + rel, n_sub - 1
            )
        else:
            up = knn_xla(nxt_x, cur_x, 1)
        xyzs.append(cur_x)
        neighs.append(neigh)
        starts_l.append(sts)
        subs.append(pool_i)
        interps.append(up)
        windows.append(w)
        cur_x, cur_c, cur_r = nxt_x, nxt_c, nxt_r
    return SortedPyramid(xyzs, neighs, starts_l, subs, interps, order, inv,
                         windows=tuple(windows))


def build_pyramid(xyz, cfg: Config, *, engine: str = "window") -> Pyramid:
    """In-graph replacement for tf_map (s3dis_dataset.py:156-183).

    xyz: [B, N, 3], already randomly shuffled by the host sampler — prefix
    slicing therefore implements RandLA-Net's random downsampling, exactly as
    the reference slices the shuffled cloud (s3dis_dataset.py:166-167).

    engine="window" on TPU builds a SortedPyramid (sorted-space fast path:
    fused Pallas search + windowed MXU gathers, gathered values rounded to
    bf16); engine="window_og" keeps the window search but original-order
    indices + exact XLA gathers (parity/debug).
    """
    if engine in ("window", "window_og"):
        if jax.default_backend() == "tpu":
            if engine == "window":
                return jax.vmap(
                    lambda x: _pyramid_window_sorted_single(x, cfg)
                )(xyz)
            return jax.vmap(lambda x: _pyramid_window_single(x, cfg))(xyz)
        engine = "window"
        # non-TPU backends use the XLA window impl through the generic path
    xyzs, neighs, subs, interps = [], [], [], []
    cur = xyz
    for i in range(cfg.num_layers):
        n = cur.shape[1]
        n_sub = n // cfg.sub_sampling_ratio[i]
        neigh = knn(cur, cur, cfg.k_n, engine=engine)               # [B, N, k]
        sub_points = cur[:, :n_sub, :]
        pool_i = neigh[:, :n_sub, :]
        up_i = knn(sub_points, cur, 1, engine=engine)               # [B, N, 1]
        xyzs.append(cur)
        neighs.append(neigh)
        subs.append(pool_i)
        interps.append(up_i)
        cur = sub_points
    return Pyramid(xyzs, neighs, subs, interps)


class RandLANet(nn.Module):
    """Returns (logits [B, N, C], penultimate features [B, N, 32])."""

    cfg: Config

    @nn.compact
    def __call__(self, features, pyramid: Pyramid, train: bool = False,
                 unsort: bool = True):
        """unsort=False (sorted pyramids only) returns logits/penultimate in
        MORTON-SORTED row order, skipping the two [B,N]-row unsort gathers
        (~3 ms each at B=6×40960 on this platform, plus their backward
        scatters). Safe whenever the consumer is order-invariant (the train
        loss averages over points) or gathers its own per-point side inputs
        by pyramid.order instead (train/trainer.py::make_train_step)."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        sorted_mode = isinstance(pyramid, SortedPyramid)
        if sorted_mode:
            # run the whole network in morton-sorted space; un-sort at the
            # head (one N-row gather instead of 2·L·N·k-row unsorts)
            features = jnp.take_along_axis(
                features, pyramid.order[..., None], axis=1
            )
        f = nn.Dense(8, kernel_init=_DENSE_INIT, dtype=dtype, name="fc0")(
            features.astype(dtype)
        )
        f = nn.BatchNorm(
            momentum=0.99, epsilon=1e-6, use_running_average=not train,
            dtype=dtype, name="fc0_bn"
        )(f)
        f = leaky_relu(f)

        # encoder (RandLANet.py:150-157)
        f_encoder_list = []
        for i in range(cfg.num_layers):
            starts = pyramid.starts[i] if sorted_mode else None
            window = pyramid.windows[i] if sorted_mode else 0
            f_enc = DilatedResBlock(cfg.d_out[i], dtype=dtype,
                                    name=f"encoder_{i}")(
                f, pyramid.xyz[i], pyramid.neigh_idx[i], train,
                starts, window,
            )
            f_sampled = random_sample(f_enc, pyramid.sub_idx[i], window)
            f = f_sampled
            if i == 0:
                f_encoder_list.append(f_enc)
            f_encoder_list.append(f_sampled)

        # bottleneck (RandLANet.py:159-161)
        f = SharedMLP(f_encoder_list[-1].shape[-1], dtype=dtype,
                      name="decoder_0")(f, train)

        # decoder (RandLANet.py:164-172)
        for j in range(cfg.num_layers):
            f_interp = nearest_interpolation(f, pyramid.interp_idx[-j - 1])
            skip = f_encoder_list[-j - 2]
            f = SharedMLP(skip.shape[-1], dtype=dtype, name=f"decoder_{j + 1}")(
                jnp.concatenate([skip, f_interp], axis=-1), train
            )

        # head (RandLANet.py:174-180)
        f = SharedMLP(64, dtype=dtype, name="fc1")(f, train)
        f = SharedMLP(32, dtype=dtype, name="fc2")(f, train)
        penultimate = f.astype(jnp.float32)
        f = nn.Dropout(rate=0.5, deterministic=not train, name="dp1")(f)
        logits = nn.Dense(
            cfg.num_classes, kernel_init=_CONV_INIT, name="fc"
        )(f.astype(jnp.float32))
        if sorted_mode and unsort:
            logits = jnp.take_along_axis(
                logits, pyramid.inv[..., None], axis=1
            )
            penultimate = jnp.take_along_axis(
                penultimate, pyramid.inv[..., None], axis=1
            )
        return logits, penultimate


def forward_with_pyramid(model: RandLANet, variables, xyz, features, *,
                         train=False, rngs=None, engine="window",
                         mutable=False):
    """Convenience wrapper: pyramid + forward in one traceable function."""
    pyramid = build_pyramid(xyz, model.cfg, engine=engine)
    return model.apply(
        variables, features, pyramid, train,
        rngs=rngs, mutable=mutable,
    )


def label_reduce_table(num_classes: int, ignored_label_inds: Sequence[int]):
    """Raw-label → training-label lookup (RandLANet.py:66-71 reducing_list)."""
    import numpy as np

    reducing = list(range(num_classes))
    for ign in ignored_label_inds:
        reducing = reducing[:ign] + [0] + reducing[ign:]
    return np.asarray(reducing, dtype=np.int32)


def masked_weighted_ce(
    logits, pseudo, activation, labels, class_weights, ignored_label_inds=(),
    reduce_table=None,
):
    """Activation-masked, class-weighted softmax CE.

    Parity with RandLANet.py:43-74 + get_loss:486-503:
      - points whose TRUE label is in ignored_label_inds are dropped
      - pseudo labels are mapped through the reducing table
      - ce · class_weight[pseudo] · activation, averaged over valid points
    logits [B,N,C]; pseudo/labels [B,N] int; activation [B,N] {0,1}.
    Returns (loss, accuracy) where accuracy is top-1 vs TRUE labels on valid
    points (RandLANet.py:82-83).
    """
    c = logits.shape[-1]
    logits2 = logits.reshape(-1, c)
    pseudo = pseudo.reshape(-1).astype(jnp.int32)
    labels = labels.reshape(-1).astype(jnp.int32)
    activation = activation.reshape(-1).astype(jnp.float32)

    valid = jnp.ones_like(labels, dtype=bool)
    for ign in ignored_label_inds:
        valid &= labels != ign
    if reduce_table is not None:
        table = jnp.asarray(reduce_table)
        pseudo = table[pseudo]
        labels = table[labels]

    logp = jax.nn.log_softmax(logits2, axis=-1)
    ce = -jnp.take_along_axis(logp, pseudo[:, None], axis=1)[:, 0]
    w = jnp.asarray(class_weights)[pseudo]
    weighted = ce * w * activation * valid
    denom = jnp.maximum(jnp.sum(valid), 1)
    loss = jnp.sum(weighted) / denom

    pred = jnp.argmax(logits2, axis=-1)
    acc = jnp.sum((pred == labels) & valid) / denom
    return loss, acc
