"""k-Center-Greedy core-set selection on device.

Replaces the reference's sklearn-based `kCenterGreedy.select_batch_`
(kcenterGreedy.py:84-128): greedily pick the point maximizing its minimum
distance to the already-selected set, updating the running min-distances with
one pairwise-distance row per step. The reference pays a full
`sklearn.metrics.pairwise_distances` call per pick on the host; here the whole
selection is one compiled program — a chunked pairwise-distance init followed
by a `lax.fori_loop` whose body is a single [N,D]×[D] matvec.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnums=(2, 3))
def kcenter_greedy(features, already_selected_mask, batch_size, chunk=1024):
    """features: [N, D]; already_selected_mask: [N] bool (the labeled set);
    returns [batch_size] int32 indices of newly selected points.

    Distance metric is Euclidean, matching kcenterGreedy.py:77. Selected and
    labeled points have min_distance 0 and are never re-picked (the reference
    asserts this, kcenterGreedy.py:118).
    """
    features = jnp.asarray(features, jnp.float32)
    n, d = features.shape
    n_pad = _round_up(n, chunk)
    feats = jnp.pad(features, ((0, n_pad - n), (0, 0)))
    mask = jnp.pad(already_selected_mask, (0, n_pad - n))
    sq = jnp.sum(feats * feats, axis=-1)

    # --- init: min distance from every point to the labeled set, chunked ---
    def init_body(carry, ci):
        min_d = carry
        start = ci * chunk
        centers = jax.lax.dynamic_slice_in_dim(feats, start, chunk, axis=0)
        c_sq = jax.lax.dynamic_slice_in_dim(sq, start, chunk, axis=0)
        c_mask = jax.lax.dynamic_slice_in_dim(mask, start, chunk, axis=0)
        d2 = sq[:, None] + c_sq[None, :] - 2.0 * jnp.dot(feats, centers.T, precision=jax.lax.Precision.HIGHEST)  # [Np, chunk]
        dist = jnp.sqrt(jnp.maximum(d2, 0.0))
        dist = jnp.where(c_mask[None, :], dist, jnp.inf)
        return jnp.minimum(min_d, jnp.min(dist, axis=1)), None

    min_d, _ = jax.lax.scan(
        init_body, jnp.full((n_pad,), jnp.inf), jnp.arange(n_pad // chunk)
    )
    valid = jnp.arange(n_pad) < n
    min_d = jnp.where(mask, 0.0, min_d)
    min_d = jnp.where(valid, min_d, -jnp.inf)  # padded rows never picked

    # --- greedy picks ---
    def body(t, carry):
        sel, min_d = carry
        pick = jnp.argmax(jnp.where(mask, -1.0, min_d)).astype(jnp.int32)
        sel = sel.at[t].set(pick)
        d2 = sq + sq[pick] - 2.0 * jnp.dot(feats, feats[pick], precision=jax.lax.Precision.HIGHEST)
        dist = jnp.sqrt(jnp.maximum(d2, 0.0))
        min_d = jnp.minimum(min_d, jnp.where(valid, dist, -jnp.inf))
        return sel, min_d

    sel = jnp.zeros((batch_size,), jnp.int32)
    sel, _ = jax.lax.fori_loop(0, batch_size, body, (sel, min_d))
    return sel
