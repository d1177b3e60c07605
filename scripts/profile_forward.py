"""Forward-pass profile: pyramid / apply split + op-level microbenches.

Breaks the production forward (B x 40960, bf16) into the stages that the
round-2/3 optimization work targets, with the full-output-consumption timing
method (every pytree leaf is summed into the chained carry — XLA silently
DCEs unconsumed pyramid outputs and the measurement shrinks; CLAUDE.md).

Usage (TPU):  PYTHONPATH=/root/.axon_site python scripts/profile_forward.py
Prints one JSON object per measurement plus a summary block.
"""
from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import time

import numpy as np


def _consume(tree):
    """Scalar f32 that depends on every leaf (cheap: int leaves sum as int)."""
    import jax
    import jax.numpy as jnp

    tot = jnp.float32(0)
    for leaf in jax.tree_util.tree_leaves(tree):
        tot = tot + jnp.sum(leaf).astype(jnp.float32) * 1e-12
    return tot


def timeit(fn, *args, iters=10, label=""):
    """Chain `iters` calls in ONE jit via lax.scan (dispatch ~30 ms on this
    platform); sync once through a host float."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def chain(a0, args):
        def body(acc, _):
            out = fn(*args, acc)
            return _consume(out) + acc * 1e-30, ()

        acc, _ = lax.scan(body, a0, None, length=iters)
        return acc

    a0 = jnp.float32(0)
    float(chain(a0, args))  # compile
    t0 = time.perf_counter()
    float(chain(a0, args))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"op": label, "ms": round(dt, 2)}), flush=True)
    return dt


def profile_layers(cfg, b, iters):
    """Standalone per-layer timings of the APPLY half: encoder DilatedResBlock
    + pool at each layer's production shape, decoder stages, head MLPs.
    Sum ≈ apply (each stage re-inits its own params; BN inference mode)."""
    import jax
    import jax.numpy as jnp

    from ssdr_al_tpu.models.randlanet import (
        _GATHER_TQ,
        DilatedResBlock,
        SharedMLP,
        nearest_interpolation,
        random_sample,
    )

    rng = np.random.RandomState(1)
    dtype = jnp.dtype(cfg.compute_dtype)
    sw = getattr(cfg, "search_window", 4096)

    sizes, cur = [], cfg.num_points
    for i in range(cfg.num_layers):
        sizes.append((cur, cur // cfg.sub_sampling_ratio[i]))
        cur //= cfg.sub_sampling_ratio[i]
    d_in = 8
    for i, (n, n_sub) in enumerate(sizes):
        d_out = cfg.d_out[i]
        if n > 4096:
            w = (sw if n > 16384 else sw // 2)
            sts = jnp.zeros((b, n // _GATHER_TQ), jnp.int32)
        elif n >= 2048:
            w, sts = n, jnp.zeros((b, n // _GATHER_TQ), jnp.int32)
        else:
            w, sts = 0, None
        xyz = jnp.asarray(rng.rand(b, n, 3).astype(np.float32))
        feat = jnp.asarray(rng.rand(b, n, d_in).astype(np.float32)).astype(
            dtype)
        # in-window neighbor indices (uniform within each tile's window)
        if sts is not None:
            base = np.repeat(
                np.zeros((b, n // _GATHER_TQ), np.int32), _GATHER_TQ, 1)
            neigh = jnp.asarray(
                base[..., None]
                + rng.randint(0, w, (b, n, cfg.k_n)).astype(np.int32))
        else:
            neigh = jnp.asarray(
                rng.randint(0, n, (b, n, cfg.k_n)).astype(np.int32))
        blk = DilatedResBlock(d_out, dtype=dtype)
        vs = jax.jit(
            lambda f, x, ni: blk.init(jax.random.PRNGKey(0), f, x, ni,
                                      False, sts, w)
        )(feat, xyz, neigh)

        def enc(f, x, ni, acc, blk=blk, vs=vs, sts=sts, w=w):
            return blk.apply(vs, f + acc * 1e-30, x, ni, False, sts, w)

        timeit(enc, feat, xyz, neigh, iters=iters,
               label=f"encoder_{i} n={n} d={d_in}->{2 * d_out}")
        f_enc = jnp.asarray(
            rng.rand(b, n, 2 * d_out).astype(np.float32)).astype(dtype)
        pool_i = neigh[:, :n_sub]
        timeit(lambda f, pi, acc, w=w: random_sample(f + acc * 1e-30, pi, w),
               f_enc, pool_i, iters=iters,
               label=f"pool_{i} {n}->{n_sub} c={2 * d_out}")
        d_in = 2 * d_out

    # decoder stages: interpolation + concat MLP at each upsample level
    dec_sizes = [(s[1], s[0]) for s in reversed(sizes)]
    d_up = 2 * cfg.d_out[-1]
    for j, (n_from, n_to) in enumerate(dec_sizes):
        d_skip = 2 * cfg.d_out[len(dec_sizes) - 1 - j]
        f = jnp.asarray(
            rng.rand(b, n_from, d_up).astype(np.float32)).astype(dtype)
        skip = jnp.asarray(
            rng.rand(b, n_to, d_skip).astype(np.float32)).astype(dtype)
        up_i = jnp.asarray(
            rng.randint(0, n_from, (b, n_to, 1)).astype(np.int32))
        mlp = SharedMLP(d_skip, dtype=dtype)
        vs = jax.jit(lambda x: mlp.init(jax.random.PRNGKey(0), x, False))(
            jnp.zeros((b, n_to, d_skip + d_up), dtype))

        def dec(f_, skip_, ui, acc, mlp=mlp, vs=vs):
            fi = nearest_interpolation(f_ + acc * 1e-30, ui)
            return mlp.apply(vs, jnp.concatenate([skip_, fi], -1), False)

        timeit(dec, f, skip, up_i, iters=iters,
               label=f"decoder_{j} {n_from}->{n_to} c={d_up}+{d_skip}")
        d_up = d_skip


def profile_lfa(cfg, b, iters, layer=0):
    """Break ONE encoder DilatedResBlock into its LFA stages at production
    shape — which of {windowed gathers, rel-pos encoding, narrow-channel
    MLPs, attentive pooling} bounds the apply half's biggest line item
    (encoder_0 ≈ 20 ms of the ~49 ms apply at B=6 bf16)."""
    import jax
    import jax.numpy as jnp

    from ssdr_al_tpu.models.randlanet import (
        _GATHER_TQ,
        AttPooling,
        SharedMLP,
        gather_neighbour_fast,
        relative_pos_encoding,
    )

    rng = np.random.RandomState(1)
    dtype = jnp.dtype(cfg.compute_dtype)
    sw = getattr(cfg, "search_window", 4096)
    n = cfg.num_points
    for i in range(layer):
        n //= cfg.sub_sampling_ratio[i]
    # DilatedResBlock(d_out=cfg.d_out[layer]): mlp_pre d_in->d_out//2,
    # BuildingBlock(d_out): mlp1 relpos->d_mid, attpool1 -> d_out//2,
    # attpool2 -> d_out, outer mlp2/shortcut -> 2*d_out
    dres_d = cfg.d_out[layer]
    d_in = 8 if layer == 0 else 2 * cfg.d_out[layer - 1]
    d_mid = dres_d // 2      # feature dim inside the building block
    d_half = dres_d // 2     # attpool1 output
    k = cfg.k_n
    w = sw if n > 16384 else sw // 2
    sts = jnp.zeros((b, n // _GATHER_TQ), jnp.int32)
    xyz = jnp.asarray(rng.rand(b, n, 3).astype(np.float32))
    feat = jnp.asarray(rng.rand(b, n, d_mid).astype(np.float32)).astype(dtype)
    neigh = jnp.asarray(rng.randint(0, w, (b, n, k)).astype(np.int32))

    def dep(x, acc):
        return x + (acc * 1e-30).astype(x.dtype)

    # stage 1: fused xyz+feature windowed gather (3 + d_mid channels)
    both0 = jnp.concatenate([xyz, feat.astype(jnp.float32)], -1)
    timeit(lambda bth, acc: gather_neighbour_fast(
        dep(bth, acc), neigh, sts, w),
        both0, iters=iters, label=f"L{layer} gather1 c={3 + d_mid}")
    nb_xyz = jax.jit(lambda: gather_neighbour_fast(
        both0, neigh, sts, w)[..., :3])()

    # stage 2: relative position encoding -> [B,N,k,10]
    timeit(lambda x, nx, acc: relative_pos_encoding(
        dep(x, acc), neigh, nx),
        xyz, nb_xyz, iters=iters, label=f"L{layer} relpos [B,{n},{k},10]")
    f_xyz10 = jax.jit(
        lambda: relative_pos_encoding(xyz, neigh, nb_xyz).astype(dtype))()

    # stage 3: SharedMLP on [B,N,k,10] -> d_mid
    mlp1 = SharedMLP(d_mid, dtype=dtype)
    v1 = jax.jit(lambda x: mlp1.init(jax.random.PRNGKey(0), x, False))(f_xyz10)
    timeit(lambda x, acc: mlp1.apply(v1, dep(x, acc), False),
           f_xyz10, iters=iters, label=f"L{layer} mlp1 10->{d_mid} on k-dim")
    f_xyz = jax.jit(lambda: mlp1.apply(v1, f_xyz10, False))()

    # stage 4: attentive pooling over k at d=2*d_mid
    f_concat = jnp.concatenate(
        [jax.jit(lambda: gather_neighbour_fast(
            both0, neigh, sts, w)[..., 3:].astype(dtype))(), f_xyz], -1)
    ap1 = AttPooling(d_half, dtype=dtype)
    va = jax.jit(lambda x: ap1.init(jax.random.PRNGKey(0), x, False))(f_concat)
    timeit(lambda x, acc: ap1.apply(va, dep(x, acc), False),
           f_concat, iters=iters,
           label=f"L{layer} attpool d={2 * d_mid}->{d_half}")
    f_agg = jax.jit(lambda: ap1.apply(va, f_concat, False))()

    # stage 5: second windowed gather (d_half channels, f32 slab)
    timeit(lambda f, acc: gather_neighbour_fast(
        dep(f, acc).astype(jnp.float32), neigh, sts, w),
        f_agg, iters=iters, label=f"L{layer} gather2 c={d_half}")

    # stage 6: mlp2 on the k-dim rel-pos features
    mlp2 = SharedMLP(d_half, dtype=dtype)
    v2 = jax.jit(lambda x: mlp2.init(jax.random.PRNGKey(0), x, False))(f_xyz)
    timeit(lambda x, acc: mlp2.apply(v2, dep(x, acc), False),
           f_xyz, iters=iters, label=f"L{layer} mlp2 {d_mid}->{d_half} k-dim")

    # stage 7: second att pooling -> dres_d
    f_concat2 = jnp.concatenate(
        [jax.jit(lambda: gather_neighbour_fast(
            f_agg.astype(jnp.float32), neigh, sts, w).astype(dtype))(),
         jax.jit(lambda: mlp2.apply(v2, f_xyz, False))()], -1)
    ap2 = AttPooling(dres_d, dtype=dtype)
    vb = jax.jit(
        lambda x: ap2.init(jax.random.PRNGKey(0), x, False))(f_concat2)
    timeit(lambda x, acc: ap2.apply(vb, dep(x, acc), False),
           f_concat2, iters=iters,
           label=f"L{layer} attpool2 d={2 * d_half}->{dres_d}")

    # stage 8: the block's outer point MLPs (mlp_pre, mlp_post, shortcut)
    f_in = jnp.asarray(rng.rand(b, n, d_in).astype(np.float32)).astype(dtype)
    pre = SharedMLP(d_mid, dtype=dtype)
    vp = jax.jit(lambda x: pre.init(jax.random.PRNGKey(0), x, False))(f_in)
    timeit(lambda x, acc: pre.apply(vp, dep(x, acc), False),
           f_in, iters=iters, label=f"L{layer} outer mlp {d_in}->{d_mid}")
    f_blk = jnp.asarray(
        rng.rand(b, n, dres_d).astype(np.float32)).astype(dtype)
    post = SharedMLP(2 * dres_d, act=False, dtype=dtype)
    vo = jax.jit(lambda x: post.init(jax.random.PRNGKey(0), x, False))(f_blk)
    timeit(lambda x, acc: post.apply(vo, dep(x, acc), False),
           f_blk, iters=iters,
           label=f"L{layer} outer mlp {dres_d}->{2 * dres_d}")


def profile_sorts(b, n, iters):
    """Variants of the pyramid's morton stage (codes→order→sorted xyz + inv):
    where do the 9+ ms go — the sort itself, the row gathers (12 ns/row on
    this platform), or the inv scatter — and does a payload-carrying lax.sort
    beat sort-then-gather?"""
    import jax
    import jax.numpy as jnp

    from ssdr_al_tpu.ops.knn import morton_codes

    rng = np.random.RandomState(0)
    xyz = jnp.asarray((rng.rand(b, n, 3) * 10).astype(np.float32))
    lo = jnp.min(xyz, axis=1)
    hi = jnp.max(xyz, axis=1)
    codes0 = jax.jit(jax.vmap(morton_codes))(xyz, lo, hi)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    perm = jnp.asarray(
        np.stack([rng.permutation(n).astype(np.int32) for _ in range(b)]))

    def _dep(x, acc):
        return x + (acc * 1e-30).astype(x.dtype)

    timeit(lambda c, acc: jnp.argsort(_dep(c, acc), axis=-1),
           codes0, iters=iters, label=f"argsort [B,{n}] int32")
    timeit(lambda c, acc: jax.lax.sort((_dep(c, acc), iota), num_keys=1),
           codes0, iters=iters, label="sort codes + iota payload")
    timeit(lambda c, x, acc: jax.lax.sort(
        (_dep(c, acc), iota, x[..., 0], x[..., 1], x[..., 2]), num_keys=1),
        codes0, xyz, iters=iters, label="sort codes + iota + xyz payloads")
    timeit(lambda x, p, acc: jnp.take_along_axis(
        _dep(x, acc), p[..., None], axis=1),
        xyz, perm, iters=iters, label=f"row gather [B,{n},3]")
    timeit(lambda c, p, acc: jnp.take_along_axis(_dep(c, acc), p, axis=1),
           codes0, perm, iters=iters, label=f"1-col gather [B,{n}]")
    timeit(lambda p, acc: jax.vmap(
        lambda o: jnp.zeros(n, jnp.int32).at[o].set(
            jnp.arange(n, dtype=jnp.int32)))(_dep(p, acc)),
        perm, iters=iters, label=f"inv scatter [B,{n}]")
    timeit(lambda p, acc: jnp.argsort(_dep(p, acc), axis=-1),
           perm, iters=iters, label="inv via argsort(order)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=6)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--layers", action="store_true",
                   help="per-layer apply breakdown only")
    p.add_argument("--micro-only", action="store_true",
                   help="skip the full/pyramid/apply stage timings")
    p.add_argument("--sorts", action="store_true",
                   help="morton-stage variant microbenches only")
    p.add_argument("--lfa", type=int, default=-1, metavar="LAYER",
                   help="encoder-block LFA stage breakdown at this layer")
    args = p.parse_args()
    if args.lfa >= 0:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        from ssdr_al_tpu.config import get_config

        cfg = dataclasses.replace(
            get_config("S3DIS"), compute_dtype="bfloat16")
        profile_lfa(cfg, args.batch, args.iters, layer=args.lfa)
        return
    if args.sorts:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        profile_sorts(args.batch, 40960, args.iters)
        return

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from ssdr_al_tpu.config import get_config
    from ssdr_al_tpu.models.randlanet import RandLANet, build_pyramid
    from ssdr_al_tpu.ops.knn import (
        SortedCloud,
        _run_window_pallas,
        knn_window_sorted_raw,
        knn_xla,
        morton_codes,
    )

    cfg = dataclasses.replace(get_config("S3DIS"), compute_dtype="bfloat16")
    if args.layers:
        profile_layers(cfg, args.batch, args.iters)
        return
    b, n = args.batch, cfg.num_points
    rng = np.random.RandomState(0)
    xyz = jnp.asarray((rng.rand(b, n, 3) * 10).astype(np.float32))
    feats = jnp.concatenate(
        [xyz, jnp.asarray(rng.rand(b, n, 3).astype(np.float32))], -1
    )
    model = RandLANet(cfg)

    @jax.jit
    def _init(key, xyz, feats):
        return model.init({"params": key}, feats, build_pyramid(xyz, cfg), False)

    variables = _init(jax.random.PRNGKey(0), xyz, feats)

    # ---- stage splits (perturb xyz by the carry so nothing is CSE-cached) --
    def full(xyz_, feats_, acc):
        x = xyz_ + acc * 1e-30
        pyr = build_pyramid(x, cfg)
        return model.apply(variables, feats_, pyr, False)

    def pyramid_only(xyz_, acc):
        return build_pyramid(xyz_ + acc * 1e-30, cfg)

    pyr0 = jax.jit(lambda x: build_pyramid(x, cfg))(xyz)

    def apply_only(feats_, acc):
        return model.apply(variables, feats_ + acc * 1e-30, pyr0, False)

    t_full = t_pyr = t_apply = 0.0
    if not args.micro_only:
        t_full = timeit(full, xyz, feats, iters=args.iters,
                        label="full_forward")
        t_pyr = timeit(pyramid_only, xyz, iters=args.iters, label="pyramid")
        t_apply = timeit(apply_only, feats, iters=args.iters, label="apply")

    # ---- pyramid op-level microbenches (model shapes, vmapped over B) -----
    lo = jnp.min(xyz, axis=1)
    hi = jnp.max(xyz, axis=1)

    from ssdr_al_tpu.ops.knn import invert_permutation, sort_by_codes

    def msort(x, l, h, acc):
        codes = morton_codes(x + acc * 1e-30, l, h)
        cs, order, xs = sort_by_codes(codes, x)
        return xs, cs, order, invert_permutation(order)

    timeit(jax.vmap(msort, in_axes=(0, 0, 0, None)), xyz, lo, hi,
           iters=args.iters, label="morton payload-sort + inv (L0)")

    # per-layer kept-subset compaction (the jnp.sort in the pyramid)
    def kept_sort(r, acc, *, n_sub):
        nn_ = r.shape[0]
        kept = (r + (acc * 1e-30).astype(jnp.int32)) < n_sub
        return jnp.sort(
            jnp.where(kept, jnp.arange(nn_, dtype=jnp.int32), jnp.int32(nn_))
        )[:n_sub]

    sizes = []
    cur = n
    for i in range(cfg.num_layers):
        sizes.append((cur, cur // cfg.sub_sampling_ratio[i]))
        cur //= cfg.sub_sampling_ratio[i]
    orders = [jnp.asarray(
        np.stack([rng.permutation(s).astype(np.int32) for _ in range(b)]))
        for s, _ in sizes]
    for (s, s_sub), o in zip(sizes, orders):
        timeit(jax.vmap(functools.partial(kept_sort, n_sub=s_sub),
                        in_axes=(0, None)), o,
               iters=args.iters, label=f"kept_pos sort n={s}")

    # L0/L1 window searches at the model's shapes
    sw = getattr(cfg, "search_window", 4096)
    from ssdr_al_tpu.models.randlanet import _GATHER_TQ

    for (nl, _), tag in zip(sizes, ["L0", "L1"]):
        if nl <= 4096:
            break
        w = (sw if nl > 16384 else sw // 2) - max(0, _GATHER_TQ - 256)
        xs = jnp.sort(jnp.asarray(rng.rand(b, nl, 3).astype(np.float32)), 1)

        def search(x, acc, w=w, nl=nl):
            sc = SortedCloud(x + acc * 1e-30, None,
                             jnp.arange(nl, dtype=jnp.int32), nl)
            return knn_window_sorted_raw(sc, sc, cfg.k_n, window=w,
                                         self_query=True)

        timeit(jax.vmap(search, in_axes=(0, None)), xs,
               iters=args.iters, label=f"window search {tag} n={nl} w={w}")

    # small-layer exact searches
    for nl, n_sub in sizes:
        if 2048 <= nl <= 4096:
            xs = jnp.asarray(rng.rand(b, nl, 3).astype(np.float32))
            timeit(jax.vmap(lambda x, acc, nl=nl: knn_window_sorted_raw(
                SortedCloud(x + acc * 1e-30, None,
                            jnp.arange(nl, dtype=jnp.int32), nl),
                SortedCloud(x, None, jnp.arange(nl, dtype=jnp.int32), nl),
                cfg.k_n, window=nl, self_query=True), in_axes=(0, None)),
                xs, iters=args.iters, label=f"whole-window search n={nl}")
        elif nl < 2048:
            xs = jnp.asarray(rng.rand(b, nl, 3).astype(np.float32))
            timeit(jax.vmap(lambda x, acc: knn_xla(
                x + acc * 1e-30, x, cfg.k_n), in_axes=(0, None)),
                xs, iters=args.iters, label=f"knn_xla n={nl}")

    # upsample 1-NN windowed searches (layers with n_sub > 2048)
    for nl, n_sub in sizes:
        if n_sub > 2048:
            xs = jnp.sort(jnp.asarray(rng.rand(b, nl, 3).astype(np.float32)), 1)
            sub = xs[:, :n_sub]

            def up(x, s, acc, nl=nl, n_sub=n_sub):
                starts = jnp.clip(
                    (jnp.arange(nl // 256, dtype=jnp.int32) * 256 * n_sub)
                    // nl - 512, 0, n_sub - 1024)
                starts = (starts // 128) * 128
                return _run_window_pallas(s, x + acc * 1e-30, starts, 1,
                                          256, 1024)

            timeit(jax.vmap(up, in_axes=(0, 0, None)), xs, sub,
                   iters=args.iters, label=f"upsample 1nn n={nl}->{n_sub}")

    print(json.dumps({
        "summary": {"full_ms": round(t_full, 2), "pyramid_ms": round(t_pyr, 2),
                    "apply_ms": round(t_apply, 2),
                    "batch": b, "points": n}}), flush=True)


if __name__ == "__main__":
    main()
