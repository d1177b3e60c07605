"""Farthest-point / farthest-feature sampling as compiled on-device loops.

Replaces the reference's numpy greedy loops:
  - `farthest_features_sample` (fps_gcn_cpu.py:119-147): greedy FPS in feature
    space over GCN-propagated region features.
  - `farthest_superpoint_sample` (sampler2.py:49-80): FPS over superpoints with
    distance = centroid Euclidean distance + pairwise chamfer distance (edcd
    branch); here the caller supplies the precomputed extra distance matrix.

Each step is argmax + a running min-distance update — a `lax.fori_loop` whose
body is one row of a pairwise-distance matmul, so the entire selection runs in
one XLA program instead of sample_number round-trips through numpy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e10  # matches the reference's init (fps_gcn_cpu.py:135)


@functools.partial(jax.jit, static_argnums=(2,))
def farthest_feature_sample(features, start_idx, sample_number, valid_mask=None):
    """Greedy FPS in feature space.

    features: [N, D] float; start_idx: scalar int (the reference seeds with a
    random index, fps_gcn_cpu.py:133 — pass one in for determinism);
    valid_mask: optional [N] bool, invalid rows are never selected.
    Returns [sample_number] int32 selected indices.

    Matches fps_gcn_cpu.py:119-147: distance = squared L2; at each step pick
    argmax of min-distance-to-selected.
    """
    n = features.shape[0]
    features = jnp.asarray(features, jnp.float32)
    if valid_mask is None:
        valid_mask = jnp.ones((n,), bool)

    def body(i, carry):
        centroids, distance = carry
        cur = features[centroids[i]]
        d = jnp.sum((features - cur) ** 2, axis=-1)
        distance = jnp.minimum(distance, d)
        nxt = jnp.argmax(jnp.where(valid_mask, distance, -1.0))
        centroids = centroids.at[i + 1].set(nxt.astype(jnp.int32))
        return centroids, distance

    centroids = jnp.zeros((sample_number,), jnp.int32).at[0].set(start_idx)
    distance = jnp.full((n,), _BIG, jnp.float32)
    centroids, _ = jax.lax.fori_loop(0, sample_number - 1, body, (centroids, distance))
    return centroids


@functools.partial(jax.jit, static_argnums=(3,))
def farthest_superpoint_sample(centroids_xyz, extra_dist, trigger_idx, sample_number):
    """FPS over superpoints: step distance = ED² (centroids) + extra_dist row.

    centroids_xyz: [S, 3] bbox centers; extra_dist: [S, S] precomputed pairwise
    chamfer distances (ops.chamfer.chamfer_pairwise); trigger_idx: first pick.
    Matches sampler2.py:49-80 (euclidean_dist is *squared* there, chamfer is not).
    """
    s = centroids_xyz.shape[0]
    centroids_xyz = jnp.asarray(centroids_xyz, jnp.float32)

    def body(i, carry):
        sel, distance = carry
        cur = sel[i]
        ed = jnp.sum((centroids_xyz - centroids_xyz[cur]) ** 2, axis=-1)
        d = ed + extra_dist[cur]
        distance = jnp.minimum(distance, d)
        nxt = jnp.argmax(distance).astype(jnp.int32)
        sel = sel.at[i + 1].set(nxt)
        return sel, distance

    sel = jnp.zeros((sample_number,), jnp.int32).at[0].set(trigger_idx)
    distance = jnp.full((s,), _BIG, jnp.float32)
    sel, _ = jax.lax.fori_loop(0, sample_number - 1, body, (sel, distance))
    return sel
