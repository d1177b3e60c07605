"""Production-shape regression gates — run on the real TPU (SSDR_TEST_TPU=1).

VERDICT r2 #5: what the bench previously only *recorded* is gated here:
  (a) window-KNN recall at the production 40960-pt block shape
      (>=0.90 engine default / >=0.93 at the model's L0 search window);
  (b) a bf16-vs-f32 AL-loop trajectory regression (the recommended TPU
      config is bfloat16 activations — its mIoU trajectory must track f32).

These auto-skip off-TPU: the window engine's Pallas kernels are unusable in
CPU interpret mode on this host (CLAUDE.md), and the recall numbers are
device-measured properties.
"""

import argparse
import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="production-shape gates run on the real TPU (SSDR_TEST_TPU=1)",
)


class TestWindowRecallProduction:
    def test_recall_at_40960(self, rng):
        """Recall vs exact XLA KNN at the bench's production block shape on
        UNIFORM data (the engine's worst case; scene data runs ~0.95+).
        Floors: measured values minus noise margin — 0.9048 engine default /
        0.9302 at the legacy w=3840 (BENCH_r02) / 0.9005 at the production
        w=1792 (the search_window=2048 default; model-quality evidence for
        that default in scripts/bench_window_quality.py + config.py)."""
        import jax.numpy as jnp

        from ssdr_al_tpu.config import ConfigS3DIS
        from ssdr_al_tpu.models.randlanet import _GATHER_TQ
        from ssdr_al_tpu.ops.knn import knn

        n, k = 40960, 16
        xyz = (rng.rand(1, n, 3) * 10).astype(np.float32)
        x = jnp.asarray(xyz)
        exact = np.asarray(knn(x, x, k, engine="xla"))[0]

        def recall(idx):
            hits = 0
            rows = range(0, n, 37)
            for i in rows:
                hits += len(np.intersect1d(idx[i], exact[i]))
            return hits / (len(rows) * k)

        r_default = recall(np.asarray(knn(x, x, k, engine="window"))[0])
        r_legacy = recall(
            np.asarray(knn(x, x, k, engine="window", window=3840))[0]
        )
        w_model = ConfigS3DIS.search_window - max(0, _GATHER_TQ - 256)
        r_model = recall(
            np.asarray(knn(x, x, k, engine="window", window=w_model))[0]
        )
        assert r_default >= 0.90, f"engine-default recall {r_default:.4f}"
        assert r_legacy >= 0.93, f"w=3840 recall {r_legacy:.4f}"
        assert r_model >= 0.885, (
            f"production-window (w={w_model}) recall {r_model:.4f}")

    def test_recall_at_65536_semantic3d(self, rng):
        """Semantic3D production shape (65536-pt blocks, ConfigSemantic3D's
        search_window) on uniform data. Exact neighbors are computed for a
        SAMPLED query subset against the full support (a full 65536² exact
        self-search wedges this platform's worker). Floor: measured 0.895
        uniform minus noise margin. Trained-model evidence for the window
        default lives in config.py (agreement 0.9967, mIoU parity —
        scripts/bench_window_quality.py --dataset Semantic3D)."""
        import jax.numpy as jnp

        from ssdr_al_tpu.config import ConfigSemantic3D
        from ssdr_al_tpu.models.randlanet import _GATHER_TQ
        from ssdr_al_tpu.ops.knn import knn

        n, k = 65536, 16
        xyz = (rng.rand(1, n, 3) * 10).astype(np.float32)
        x = jnp.asarray(xyz)
        w_model = ConfigSemantic3D.search_window - max(0, _GATHER_TQ - 256)
        idx = np.asarray(knn(x, x, k, engine="window", window=w_model))[0]
        rows = np.arange(0, n, 53)
        exact = np.asarray(
            knn(x, x[:, rows], k, engine="xla"))[0]
        hits = sum(
            len(np.intersect1d(idx[r], exact[i]))
            for i, r in enumerate(rows))
        recall = hits / (len(rows) * k)
        assert recall >= 0.885, (
            f"Semantic3D production-window (w={w_model}) recall {recall:.4f}")


class TestSortedLossPath:
    def test_sorted_loss_equals_unsorted(self, rng):
        """The trainer's sorted fast path (consume logits in morton-sorted
        order, permute the 1-column labels/masks by pyramid.order instead of
        unsorting 13+32 channels — make_train_step) must be EXACTLY the same
        loss as unsorting the same logits via pyramid.inv: one apply, two
        loss computations, no dropout redraw."""
        import dataclasses

        import jax.numpy as jnp

        from ssdr_al_tpu.config import ConfigS3DIS
        from ssdr_al_tpu.models.randlanet import (
            RandLANet,
            SortedPyramid,
            build_pyramid,
            masked_weighted_ce,
        )

        cfg = dataclasses.replace(
            ConfigS3DIS, num_points=8192, num_classes=8,
            ignored_label_inds=(), compute_dtype="float32")
        b, n = 2, cfg.num_points
        xyz = jnp.asarray((rng.rand(b, n, 3) * 10).astype(np.float32))
        feats = jnp.concatenate(
            [xyz, jnp.asarray(rng.rand(b, n, 3).astype(np.float32))], -1)
        pseudo = jnp.asarray(rng.randint(0, 8, (b, n)).astype(np.int32))
        labels = jnp.asarray(rng.randint(0, 8, (b, n)).astype(np.int32))
        act = jnp.asarray((rng.rand(b, n) > 0.3).astype(np.float32))
        weights = np.ones(8, np.float32)
        model = RandLANet(cfg)

        @jax.jit
        def both_losses(key, xyz, feats, pseudo, labels, act):
            pyr = build_pyramid(xyz, cfg)
            assert isinstance(pyr, SortedPyramid)
            v = model.init({"params": key}, feats, pyr, False)
            logits_sorted, _ = model.apply(v, feats, pyr, False, unsort=False)
            loss_sorted, acc_sorted = masked_weighted_ce(
                logits_sorted,
                jnp.take_along_axis(pseudo, pyr.order, axis=1),
                jnp.take_along_axis(act, pyr.order, axis=1),
                jnp.take_along_axis(labels, pyr.order, axis=1),
                weights)
            logits_orig = jnp.take_along_axis(
                logits_sorted, pyr.inv[..., None], axis=1)
            loss_orig, acc_orig = masked_weighted_ce(
                logits_orig, pseudo, act, labels, weights)
            return loss_sorted, loss_orig, acc_sorted, acc_orig

        ls, lo, as_, ao = both_losses(
            jax.random.PRNGKey(0), xyz, feats, pseudo, labels, act)
        np.testing.assert_allclose(float(ls), float(lo), rtol=1e-5)
        np.testing.assert_allclose(float(as_), float(ao), rtol=1e-5)


def _al_args(tmp_path, dtype):
    return argparse.Namespace(
        dataset="S3DIS", data_root=os.path.join(str(tmp_path), dtype, "data"),
        test_area=5, reg_strength=0.05, synthetic=True, synthetic_rooms=3,
        synthetic_points=4000, num_points=512, max_epoch=3, train_steps=8,
        knn_engine="xla", seed_percent=0.08, num_devices=1,
        sampler="T", round=2, rounds=4, classbal=2, edcd=0, gcn=0, gcn_fps=1,
        gcn_number=1, gcn_top=0, uncertainty_mode="WetSU",
        point_uncertainty_mode="sb", oracle_mode="NAIL", threshold=0.9,
        min_size=1, t=0, sp_batch_size=40, compute_dtype=dtype,
        search_window=0, chamfer_cap=512,
    )


class TestBf16Trajectory:
    def test_bf16_al_loop_tracks_f32(self, tmp_path):
        """6-round-scale synthetic AL regression: the bfloat16 config's
        per-round mIoU must track float32 (identical seeds/flags; only the
        activation dtype differs). A real bf16 breakage (wrong rounding in
        the gather kernels, loss-scale issues) sends mIoU toward chance and
        trips the bound; ordinary seed-level noise does not (measured
        spread of this tiny config ~0.03-0.06)."""
        from ssdr_al_tpu.cli.al_loop import run_al_loop
        from ssdr_al_tpu.cli.common import setup_experiment
        from ssdr_al_tpu.cli.seed import run_seed
        from ssdr_al_tpu.partition.superpoint import compute_superpoints

        cwd = os.getcwd()
        results = {}
        try:
            for dtype in ("float32", "bfloat16"):
                d = tmp_path / dtype
                d.mkdir(exist_ok=True)
                os.chdir(d)
                args = _al_args(tmp_path, dtype)
                exp = setup_experiment(args)
                state = exp.make_state([])
                compute_superpoints(
                    exp.train_clouds, state, args.reg_strength,
                    knn_backend="host", k_geof=20, log=lambda *a: None,
                )
                run_seed(args)
                results[dtype] = run_al_loop(args)
        finally:
            os.chdir(cwd)

        f32 = np.asarray([m for m, _ in results["float32"]])
        bf16 = np.asarray([m for m, _ in results["bfloat16"]])
        assert len(f32) == len(bf16) >= 3
        diffs = np.abs(f32 - bf16)
        assert diffs.mean() <= 0.10, (f32, bf16)
        assert abs(f32[-1] - bf16[-1]) <= 0.12, (f32, bf16)
        # bf16 must actually learn, not merely stay near f32's early rounds
        assert bf16[-1] >= bf16[0] - 0.05, bf16


class TestSortedEvalPath:
    def test_sorted_eval_equals_unsorted_after_reindex(self, rng):
        """make_eval_step(sorted_outputs=True) on the real window engine:
        probs reindexed by the returned order must equal the unsorted
        eval_step EXACTLY (the unsort gather and the host reindex are the
        same permutation of identical rows). penult is compared at bf16
        tolerance: XLA places the bf16→f32 output cast differently with vs
        without the trailing unsort gather (measured ~1.5e-3 relative, one
        bf16 ulp)."""
        import dataclasses

        import jax.numpy as jnp

        from ssdr_al_tpu.config import ConfigS3DIS
        from ssdr_al_tpu.models.randlanet import RandLANet
        from ssdr_al_tpu.train.trainer import create_train_state, make_eval_step

        cfg = dataclasses.replace(
            ConfigS3DIS, num_points=8192, num_classes=8,
            ignored_label_inds=(), compute_dtype="bfloat16")
        b, n = 2, cfg.num_points
        batch = {
            "xyz": jnp.asarray((rng.rand(b, n, 3) * 10).astype(np.float32)),
            "features": jnp.asarray(rng.rand(b, n, 6).astype(np.float32)),
        }
        model = RandLANet(cfg)
        state = create_train_state(
            model, cfg, jax.random.PRNGKey(0),
            {"xyz": batch["xyz"][:1], "features": batch["features"][:1]}, 500)
        plain = make_eval_step(model, cfg)
        srt = make_eval_step(model, cfg, sorted_outputs=True)
        probs_p, pen_p = plain(state, batch)
        probs_s, pen_s, order = srt(state, batch)
        order = np.asarray(order)
        inv = np.argsort(order, axis=1)
        probs_s, pen_s = np.asarray(probs_s), np.asarray(pen_s)
        np.testing.assert_array_equal(
            np.take_along_axis(probs_s, inv[..., None], axis=1),
            np.asarray(probs_p))
        pen_p = np.asarray(pen_p)
        np.testing.assert_allclose(
            np.take_along_axis(pen_s, inv[..., None], axis=1),
            pen_p, rtol=2e-2, atol=float(np.abs(pen_p).max()) * 1e-4)


class TestChamferKernel:
    def test_kernel_matches_exact_production_shape(self, rng):
        """Fused MXU chamfer kernel (real Mosaic compile) vs the exact VPU
        path at a production-class shape (8 blocks x S=256 x P=512 — the
        same (S, P) rung family the Semantic3D diversity phase dispatches;
        the interpret-mode parity for ragged/empty cases lives in
        tests/test_ops.py). The gate is the studied bf16x3 tolerance plus
        pick-relevant equality: identical argmin-neighbor per row."""
        import jax.numpy as jnp

        from ssdr_al_tpu.ops.chamfer import (
            chamfer_pairwise_blocks,
            chamfer_pairwise_blocks_pallas,
            chamfer_supports_pallas,
        )

        c, s, p = 8, 256, 512
        assert chamfer_supports_pallas(s, p)
        pts = (rng.randn(c, s, p, 3)
               * rng.uniform(0.05, 0.6, (c, s, 1, 3))).astype(np.float32)
        msk = np.ones((c, s, p), bool)
        msk[:, :, int(p * 0.8):] = False
        pts[~msk[..., None].repeat(3, -1).reshape(c, s, p, 3)] = 0.0
        e = np.asarray(chamfer_pairwise_blocks(
            jnp.asarray(pts), jnp.asarray(msk), 8, False))
        k = np.asarray(chamfer_pairwise_blocks_pallas(
            jnp.asarray(pts), jnp.asarray(msk)))
        off = ~np.eye(s, dtype=bool)[None].repeat(c, 0)
        rel = np.abs(k - e)[off] / np.maximum(e[off], 1e-9)
        assert rel.max() < 5e-4, rel.max()
        # nearest-neighbor structure (what FPS/adjacency consume) intact:
        # compare off-diagonal argmins with the diagonal masked out
        big = np.where(off, 0.0, 1e18)
        assert (np.argmin(e + big, axis=-1) == np.argmin(k + big, axis=-1)
                ).mean() > 0.999

    def test_chunked_kernel_matches_unchunked(self, rng, monkeypatch):
        """Block-axis sub-chunking (VERDICT r4 #2: over-cap ladder rungs
        keep kernel coverage) under a real Mosaic compile: with the
        live-buffer cap lowered so C=8 splits into 4-block sub-dispatches,
        the chunked wrapper must reproduce the one-dispatch result
        bitwise — blocks are independent and the per-block program is
        identical."""
        import jax.numpy as jnp

        import ssdr_al_tpu.ops.chamfer as ch

        c, s, p = 8, 256, 512
        pts = (rng.randn(c, s, p, 3)
               * rng.uniform(0.05, 0.6, (c, s, 1, 3))).astype(np.float32)
        msk = np.ones((c, s, p), bool)
        msk[:, :, int(p * 0.8):] = False
        pts[~msk[..., None].repeat(3, -1).reshape(c, s, p, 3)] = 0.0
        full = np.asarray(ch.chamfer_pairwise_blocks_pallas(
            jnp.asarray(pts), jnp.asarray(msk)))
        monkeypatch.setattr(ch, "_CSP_CAP", 4 * s * p)
        assert ch._subchunk(c, s, p) == 4
        got = np.asarray(ch.chamfer_pairwise_blocks_pallas_chunked(
            jnp.asarray(pts), jnp.asarray(msk)))
        np.testing.assert_array_equal(got, full)
        # gathered-slab chunked variant: the slab is the flattened
        # [C*S, P] superpoint store, idx [C, S] the per-group row picks.
        # Compare against the UNCHUNKED gathered form (fusing the gather
        # into the operand packing shifts low bits vs the direct form —
        # ~3e-5 rel, measured; chunking itself must be exact)
        slab_p = jnp.asarray(pts.reshape(c * s, p, 3))
        slab_m = jnp.asarray(msk.reshape(c * s, p))
        idx = jnp.arange(c * s, dtype=jnp.int32).reshape(c, s)
        monkeypatch.setattr(ch, "_CSP_CAP", 5_242_880)
        g_full = np.asarray(ch.chamfer_pairwise_blocks_gathered_pallas(
            slab_p, slab_m, idx))
        rel = (np.abs(g_full - full)
               / np.maximum(np.abs(full), 1e-9)).max()
        assert rel < 2e-4, rel  # gather-fusion low-bit shift only
        monkeypatch.setattr(ch, "_CSP_CAP", 4 * s * p)
        g = np.asarray(ch.chamfer_pairwise_blocks_gathered_pallas_chunked(
            slab_p, slab_m, idx))
        np.testing.assert_array_equal(g, g_full)
