"""Static-shape segment reductions for ragged superpoints.

The reference stores each cloud's oversegmentation as a ragged list of
per-superpoint point-index lists (`components`, partition/compute_superpoint.py:63-68)
and loops over them in Python (sampler2.py:612-631). On TPU, ragged structures
become a dense segment-id map `in_component: [N] int32` plus reductions with a
static `num_segments` — every per-superpoint statistic (uncertainty sums,
dominant labels, centroids) is one fused segment reduction instead of a Python
loop over thousands of superpoints.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def segment_count(seg_ids, num_segments):
    """Points per segment. seg_ids [N] → [S] int32. Padded points use id ≥ S."""
    return jax.ops.segment_sum(
        jnp.ones_like(seg_ids, dtype=jnp.int32), seg_ids, num_segments=num_segments
    )


def segment_sum(values, seg_ids, num_segments):
    """values [N, ...], seg_ids [N] → [S, ...]."""
    return jax.ops.segment_sum(values, seg_ids, num_segments=num_segments)


def segment_mean(values, seg_ids, num_segments):
    s = segment_sum(values, seg_ids, num_segments)
    c = segment_count(seg_ids, num_segments).astype(s.dtype)
    c = jnp.maximum(c, 1)
    return s / c.reshape((-1,) + (1,) * (s.ndim - 1))


def segment_max(values, seg_ids, num_segments):
    return jax.ops.segment_max(values, seg_ids, num_segments=num_segments)


def segment_min(values, seg_ids, num_segments):
    return jax.ops.segment_min(values, seg_ids, num_segments=num_segments)


@functools.partial(jax.jit, static_argnums=(2, 3))
def segment_label_histogram(labels, seg_ids, num_segments, num_classes):
    """Per-segment class histogram. labels [N] int → [S, C] int32."""
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=jnp.int32)
    return segment_sum(one_hot, seg_ids, num_segments)


def segment_majority(labels, seg_ids, num_segments, num_classes):
    """Per-segment dominant label and dominance rate.

    Matches `_dominant_label` (sampler2.py:102-106): argmax of the class
    histogram (ties → lowest class id, same as np.argmax) and
    max_count / segment_size. Empty segments get rate 0.
    """
    hist = segment_label_histogram(labels, seg_ids, num_segments, num_classes)
    dominant = jnp.argmax(hist, axis=1).astype(jnp.int32)
    count = jnp.sum(hist, axis=1)
    rate = jnp.max(hist, axis=1) / jnp.maximum(count, 1)
    return dominant, rate.astype(jnp.float32)
