"""Trainable coreGCN tests (active/gcn.py vs gcn.py:16-263 semantics)."""

import jax.numpy as jnp
import numpy as np

from ssdr_al_tpu.active.gcn import (
    _gcn_forward,
    _init_gcn_params,
    _latent_adjacency,
    gcn_sampling,
)
from ssdr_al_tpu.active.region_graph import build_region_graph


def make_graph(rng, n_regions=12, labeled_from=9):
    xyz = rng.randn(600, 3).astype(np.float32)
    comps = [np.arange(i * 50, (i + 1) * 50) for i in range(n_regions)]
    regions = {
        "c0": [(i, i >= labeled_from, comps[i][:6]) for i in range(n_regions)]
    }
    graph = build_region_graph(regions, {"c0": xyz}, {"c0": comps})
    feats = rng.randn(n_regions, 16).astype(np.float32)
    unl = np.array([i < labeled_from for i in range(n_regions)])
    return graph, feats, unl


class TestAdjacency:
    def test_latent_adjacency_matches_reference(self, rng):
        """Oracle: gcn.py:176-190 with a single cloud block."""
        graph, feats, _ = make_graph(rng)
        from ssdr_al_tpu.active.region_graph import flat_to_blocks

        blocks = flat_to_blocks(graph, feats)
        adj, vhat = _latent_adjacency(
            jnp.asarray(graph.ed_cd), jnp.asarray(graph.mask),
            jnp.asarray(blocks),
        )
        s = len(graph.refs)   # valid regions (blocks are pad-bucketed)
        adj = np.asarray(adj)[0][:s, :s]
        # numpy oracle
        v = feats / np.linalg.norm(feats, axis=1, keepdims=True)
        latent = v @ v.T
        m = latent * np.exp(-graph.ed_cd[0][:s, :s])
        m += -np.eye(s)
        col = m.sum(0)
        want = m @ np.diag(1.0 / col) + np.eye(s)
        np.testing.assert_allclose(adj, want, rtol=1e-3, atol=1e-4)


class TestGCNTraining:
    def test_loss_decreases_and_selection_valid(self, rng):
        graph, feats, unl = make_graph(rng)
        out = gcn_sampling(graph, feats, unl, sampling_batch=3,
                           num_steps=200, seed=0)
        sel = [s for v in out.values() for s in v]
        assert 1 <= len(sel) <= 3
        assert len(set(sel)) == len(sel)
        labeled_sps = {graph.refs[i].sp_idx for i in range(len(unl)) if not unl[i]}
        assert not (set(sel) & labeled_sps)

    def test_uncertain_gcn_branch(self, rng):
        graph, feats, unl = make_graph(rng)
        out = gcn_sampling(graph, feats, unl, sampling_batch=3,
                           num_steps=100, core_gcn=False, seed=0)
        sel = [s for v in out.values() for s in v]
        assert len(sel) == 3

    def test_forward_shapes(self, rng):
        graph, feats, unl = make_graph(rng)
        from ssdr_al_tpu.active.region_graph import flat_to_blocks

        import jax

        blocks = jnp.asarray(flat_to_blocks(graph, feats))
        mask = jnp.asarray(graph.mask)
        adj, vhat = _latent_adjacency(jnp.asarray(graph.ed_cd), mask, blocks)
        params = _init_gcn_params(jax.random.PRNGKey(0), feats.shape[1])
        scores, hidden = _gcn_forward(params, adj, vhat, mask)
        # block dims are pad-bucketed (region_graph.py): C → 8s, S → 16s
        assert scores.shape == graph.mask.shape + (1,)
        assert hidden.shape == graph.mask.shape + (128,)
        assert (np.asarray(scores) >= 0).all() and (np.asarray(scores) <= 1).all()
