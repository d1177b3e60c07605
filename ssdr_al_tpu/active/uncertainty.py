"""Point and region uncertainty scoring + class-balance reweighting.

Vectorized, device-friendly re-implementation of sampler2.py:12-47 and
257-266. The reference loops over superpoints in Python, recomputing numpy
reductions per region (the HOT loop flagged in SURVEY.md §3.1); here every
mode is one batched segment reduction over a whole cloud.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ssdr_al_tpu.ops.segment import (
    segment_count,
    segment_label_histogram,
    segment_majority,
    segment_sum,
)


def point_uncertainty(prob_logits, mode: str):
    """prob_logits [N, C] softmax probabilities → [N] uncertainty.

    Modes (sampler2.py:28-47):
      lc      : 1 − max prob
      entropy : −Σ p·log2(p)   (0·log 0 := 0, sampler2.py:247-255)
      sb      : second-best / best
    """
    p = jnp.asarray(prob_logits)
    if mode == "lc":
        return 1.0 - jnp.max(p, axis=-1)
    if mode == "entropy":
        logp = jnp.where(p > 0, jnp.log2(jnp.maximum(p, 1e-38)), 0.0)
        return -jnp.sum(p * logp, axis=-1)
    if mode == "sb":
        top2, _ = jax.lax.top_k(p, 2)
        return top2[..., 1] / top2[..., 0]
    raise ValueError(f"unknown point_uncertainty mode {mode!r}")


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def region_uncertainty(point_unc, point_class, seg_ids, num_segments,
                       num_classes, mode: str):
    """Per-superpoint uncertainty from per-point scores.

    Modes (sampler2.py:12-26):
      mean       : mean point uncertainty
      sum_weight : Σ w_i·u_i with w_i = in-region frequency of point i's class
      WetSU      : Σ_{dominant} u − Σ_{non-dominant} u
    Returns [S] float32 (empty segments → 0).
    """
    point_unc = jnp.asarray(point_unc, jnp.float32)
    counts = segment_count(seg_ids, num_segments)
    safe = jnp.maximum(counts, 1).astype(jnp.float32)

    if mode == "mean":
        s = segment_sum(point_unc, seg_ids, num_segments)
        return s / safe

    if mode == "sum_weight":
        hist = segment_label_histogram(point_class, seg_ids, num_segments, num_classes)
        freq = hist.astype(jnp.float32) / safe[:, None]          # [S, C]
        w = freq[seg_ids, point_class]                           # per-point weight
        return segment_sum(w * point_unc, seg_ids, num_segments)

    if mode == "WetSU":
        dominant, _ = segment_majority(point_class, seg_ids, num_segments, num_classes)
        is_dom = (point_class == dominant[seg_ids]).astype(jnp.float32)
        dom_sum = segment_sum(point_unc * is_dom, seg_ids, num_segments)
        other_sum = segment_sum(point_unc * (1.0 - is_dom), seg_ids, num_segments)
        return dom_sum - other_sum

    raise ValueError(f"unknown region uncertainty mode {mode!r}")


def _class_frequency_weights(class_list, num_classes):
    """weights_percentage (sampler2.py:92-100): per-element frequency of its class."""
    class_list = np.asarray(class_list, np.int64)
    dist = np.bincount(class_list, minlength=num_classes).astype(np.float64)
    dist = dist / max(len(class_list), 1)
    return dist[class_list]


def add_classbal(num_classes, region_class, region_unc):
    """u · exp(−freq(region's class)) (sampler2.py:257-260)."""
    w = _class_frequency_weights(region_class, num_classes)
    return np.asarray(region_unc) * np.exp(-w)


def add_clsbal(num_classes, region_class, region_unc, selected_class_list):
    """Like classbal but the frequency also counts previously-selected
    regions' classes (sampler2.py:262-266)."""
    combined = list(np.asarray(region_class)) + list(selected_class_list)
    w = _class_frequency_weights(combined, num_classes)[: len(region_unc)]
    return np.asarray(region_unc) * np.exp(-w)
