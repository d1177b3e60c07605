"""Trainable GCN diversity reasoning (coreGCN / uncertainGCN branch).

Parity port of gcn.py:16-263 in JAX/flax + optax:
  adjacency  A = D⁻¹(S−I)+I, S = ⟨v̂_i, v̂_j⟩ · exp(−(ED+CD))   (create_adj:116-191)
  model      gc1 → ReLU → dropout(0.3) → gc3 → sigmoid          (GCN.forward:74-78;
             gc2 is defined but unused in the reference too)
  loss       BCEAdjLoss: −mean log s_labeled − λ·mean log(1−s_unlabeled), λ=1.2
                                                                 (:80-86, 219-226)
  training   Adam lr 1e-3, weight decay 5e-4, 20000 steps        (:213-226)
  selection  coreGCN: kCenterGreedy over concat(feat, score)     (:235-249)
             uncertainGCN: |score − 0.1| margin ranking          (:251-255)

The adjacency is block-diagonal by cloud (region_graph.py), so every layer is
a batched per-block matmul; the 20000-step fit runs as one jitted
lax.scan-free python loop over a jitted step (fast enough: each step is tiny).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ssdr_al_tpu.active.region_graph import (
    RegionGraph,
    blocks_to_flat,
    flat_to_blocks,
)
from ssdr_al_tpu.ops.kcenter import kcenter_greedy

NHID = 128  # gcn.py:208


@jax.jit
def _latent_adjacency(ed_cd, mask, feats):
    """create_adj (gcn.py:176-190): S = (V̂ V̂ᵀ)·exp(−(ED+CD)), A = (S−I)D⁻¹+I.

    feats: [C, S, D] padded block features (pre-normalization).
    The reference's adj_diag uses column sums (gcn.py:185) — S is symmetric so
    they equal row sums; we keep row sums."""
    norm = jnp.linalg.norm(feats, axis=-1, keepdims=True)
    vhat = feats / jnp.maximum(norm, 1e-12)
    latent = jnp.einsum(
        "cid,cjd->cij", vhat, vhat, precision=jax.lax.Precision.HIGHEST
    )
    s = latent * jnp.exp(-ed_cd)
    pair_mask = mask[:, :, None] & mask[:, None, :]
    s = jnp.where(pair_mask, s, 0.0)
    eye = jnp.eye(s.shape[-1], dtype=s.dtype)[None]
    adj = s - eye * mask[:, :, None]
    col_sum = jnp.sum(adj, axis=1)                       # [C, S] column sums
    d_inv = jnp.where(col_sum != 0, 1.0 / col_sum, 0.0)
    adj = adj * d_inv[:, None, :]
    adj = adj + eye * mask[:, :, None]
    return adj, vhat


def _init_gcn_params(rng, nfeat):
    """Uniform(−1/√fan_out) init matching GraphConvolution.reset_parameters
    (gcn.py:32-36) and nn.Linear default."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)

    def u(key, shape, bound):
        return jax.random.uniform(key, shape, jnp.float32, -bound, bound)

    return {
        "gc1_w": u(k1, (nfeat, NHID), 1.0 / np.sqrt(NHID)),
        "gc1_b": u(k1, (NHID,), 1.0 / np.sqrt(NHID)),
        "gc3_w": u(k2, (NHID, 1), 1.0),
        "gc3_b": u(k2, (1,), 1.0),
        "lin_w": u(k3, (1, 1), 1.0),
        "lin_b": u(k4, (1,), 1.0),
    }


def _gcn_forward(params, adj, x, mask, dropout_rng=None, dropout=0.3):
    """scores, hidden = GCN(x, adj) (gcn.py:74-78)."""
    h = jnp.einsum("cij,cjd->cid", adj, x @ params["gc1_w"],
                   precision=jax.lax.Precision.HIGHEST) + params["gc1_b"]
    h = jax.nn.relu(h)
    feat = h
    if dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout, h.shape)
        feat = jnp.where(keep, h / (1.0 - dropout), 0.0)
    out = jnp.einsum("cij,cjd->cid", adj, feat @ params["gc3_w"],
                     precision=jax.lax.Precision.HIGHEST) + params["gc3_b"]
    scores = jax.nn.sigmoid(out)
    return scores, h  # (hidden pre-dropout returned as `feat` in eval)


def gcn_sampling(
    graph: RegionGraph,
    features: np.ndarray,
    unlabeled_flags: np.ndarray,
    sampling_batch: int,
    *,
    core_gcn: bool = True,
    num_steps: int = 20000,
    lr: float = 1e-3,
    weight_decay: float = 5e-4,
    lam: float = 1.2,
    s_margin: float = 0.1,
    seed: int = 0,
) -> Dict[str, List[int]]:
    """GCN_sampling (gcn.py:193-263). Returns {cloud_name: [sp_idx]}."""
    n = graph.num_regions
    feats_flat = np.asarray(features, np.float32)
    blocks = jnp.asarray(flat_to_blocks(graph, feats_flat))
    mask = jnp.asarray(graph.mask)
    adj, vhat = _latent_adjacency(jnp.asarray(graph.ed_cd), mask, blocks)

    lbl_blocks = jnp.asarray(
        flat_to_blocks(graph, (~unlabeled_flags).astype(np.float32)[:, None])
    )[..., 0]                                             # [C, S] 1=labeled
    valid = mask
    n_lbl = jnp.maximum(jnp.sum(lbl_blocks * valid), 1.0)
    n_unl = jnp.maximum(jnp.sum((1 - lbl_blocks) * valid), 1.0)

    rng = jax.random.PRNGKey(seed)
    params = _init_gcn_params(rng, feats_flat.shape[1])
    tx = optax.adamw(lr, weight_decay=weight_decay)

    def step(carry, i):
        params, opt_state = carry
        key = jax.random.fold_in(rng, i)

        def loss_fn(p):
            scores, _ = _gcn_forward(p, adj, vhat, mask, dropout_rng=key)
            s = jnp.clip(scores[..., 0], 1e-7, 1 - 1e-7)
            lnl = jnp.sum(jnp.log(s) * lbl_blocks * valid) / n_lbl
            lnu = jnp.sum(jnp.log(1 - s) * (1 - lbl_blocks) * valid) / n_unl
            return -lnl - lam * lnu

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @jax.jit
    def fit(params):
        # the full 20000-step fit runs as ONE device program (a Python loop
        # of jitted steps would pay this platform's per-dispatch round-trip
        # 20000 times)
        opt_state = tx.init(params)
        (params, _), losses = jax.lax.scan(
            step, (params, opt_state), jnp.arange(num_steps)
        )
        return params, losses

    params, losses = fit(params)

    scores, hidden = _gcn_forward(params, adj, vhat, mask, dropout_rng=None)
    scores_flat = blocks_to_flat(graph, np.asarray(scores))[:, 0]
    hidden_flat = blocks_to_flat(graph, np.asarray(hidden))

    unl_idx = np.where(unlabeled_flags)[0]
    sampling_batch = min(sampling_batch, len(unl_idx))

    if core_gcn:
        # feat = concat(hidden, raw score logits→sigmoid) (gcn.py:78, 237-249)
        feat = np.concatenate([hidden_flat, scores_flat[:, None]], axis=1)
        feat = np.nan_to_num(feat.astype(np.float64), nan=1e-10,
                             posinf=1e10, neginf=-1e10).astype(np.float32)
        labeled_mask = ~unlabeled_flags
        sel = np.asarray(
            kcenter_greedy(jnp.asarray(feat), jnp.asarray(labeled_mask),
                           int(sampling_batch))
        )
        chosen = sel
    else:
        # uncertainGCN (gcn.py:251-255): smallest |score − margin| last
        margin = np.abs(scores_flat[unl_idx] - s_margin)
        order = np.argsort(-margin)
        chosen = unl_idx[order[-sampling_batch:]]

    file_list: Dict[str, List[int]] = {}
    for i in chosen:
        ref = graph.refs[int(i)]
        if not ref.is_labeled:
            file_list.setdefault(ref.cloud_name, []).append(ref.sp_idx)
    return file_list
