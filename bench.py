"""Benchmark: S3DIS block pipeline (KNN pyramid + RandLA-Net forward) on TPU.

BASELINE.json config (1): "S3DIS Area-5 single 40960-pt block: grid-subsample
+ KNN preproc + RandLA-Net forward". The reference runs the per-layer KNN on
CPU workers (DP.knn_search via the nanoflann C++ extension, the pipeline's
documented bottleneck — SURVEY.md §3.2) and the TF1 forward on one GPU; here
both are one fused XLA program on one TPU chip.

vs_baseline (honest framing, VERDICT round-1 #4): ratio against the
reference's host-side tf_map (s3dis_dataset.py:156-183) re-executed with
scipy's C cKDTree (the same algorithmic class as nanoflann) and credited
LINEAR SCALING ACROSS THE REFERENCE'S 6 DataLoader WORKERS
(RandLANet.py:226) — i.e. baseline = 6 × the fastest observed single-worker
throughput, even though this host has one core. The reference's GPU forward
time is still NOT charged to the baseline, keeping the ratio a lower bound.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "points/s/chip", "vs_baseline": N,
   "extras": {train-step points/s, 1-worker/6-worker host baselines,
              window-KNN recall, AL selection-round wall-clock}}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REF_WORKERS = 6  # the reference's DataLoader(num_workers=6), RandLANet.py:226


def _sync(x):
    """block_until_ready is unreliable on the axon TPU platform — force
    completion by pulling a reduction back to the host."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


def measure_tpu(batch_size: int, iters: int = 10, dataset: str = "S3DIS"):
    import dataclasses

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from ssdr_al_tpu.config import get_config
    from ssdr_al_tpu.models.randlanet import RandLANet, build_pyramid

    # bfloat16 activations: the recommended TPU inference config
    # (--compute_dtype bfloat16). Measured vs float32 on the bench block:
    # pred agreement 0.9986, max rel logit diff 0.9%.
    cfg = dataclasses.replace(get_config(dataset), compute_dtype="bfloat16")
    model = RandLANet(cfg)
    rng = np.random.RandomState(0)
    xyz = (rng.rand(batch_size, cfg.num_points, 3) * 10).astype(np.float32)
    feats = np.concatenate(
        [xyz, rng.rand(batch_size, cfg.num_points, 3).astype(np.float32)], -1
    )
    xyz_d, feats_d = jnp.asarray(xyz), jnp.asarray(feats)

    @jax.jit
    def _init(key, xyz, feats):
        return model.init({"params": key}, feats, build_pyramid(xyz, cfg), False)

    variables = _init(jax.random.PRNGKey(0), xyz_d, feats_d)

    def fwd(xyz, feats):
        pyr = build_pyramid(xyz, cfg)
        logits, _ = model.apply(variables, feats, pyr, False)
        return logits

    @jax.jit
    def fwd_chain(xyz, feats):
        # `iters` forwards chained on device: measures steady-state device
        # throughput. A per-call host sync would add this platform's ~30 ms
        # dispatch round-trip to every iteration (production training enqueues
        # steps back-to-back, so that latency is pipelined away).
        def body(x, _):
            logits = fwd(x, feats)
            x = x + logits[0, 0, 0] * 1e-12  # data dependence between iters
            return x, ()
        x, _ = jax.lax.scan(body, xyz, None, length=iters)
        return x

    _sync(fwd_chain(xyz_d, feats_d))  # compile
    t0 = time.perf_counter()
    _sync(fwd_chain(xyz_d, feats_d))
    dt = (time.perf_counter() - t0) / iters
    return batch_size * cfg.num_points / dt


def measure_train_step(batch_size: int, iters: int = 8):
    """Full training step (pyramid + forward + loss + backward + Adam),
    chained on device — the production training-loop throughput."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from ssdr_al_tpu.config import ConfigS3DIS, class_weights
    from ssdr_al_tpu.models.randlanet import RandLANet
    from ssdr_al_tpu.train.trainer import create_train_state, make_train_step

    cfg = ConfigS3DIS
    model = RandLANet(cfg)
    rng = np.random.RandomState(0)
    b, n = batch_size, cfg.num_points
    batch = {
        "xyz": (rng.rand(b, n, 3) * 10).astype(np.float32),
        "features": rng.rand(b, n, 6).astype(np.float32),
        "labels": rng.randint(0, cfg.num_classes, (b, n)).astype(np.int32),
        "activation": np.ones((b, n), np.float32),
        "pseudo": rng.randint(0, cfg.num_classes, (b, n)).astype(np.int32),
    }
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(0),
        {"xyz": batch["xyz"], "features": batch["features"]},
        steps_per_epoch=500,
    )
    train_step = make_train_step(model, cfg, class_weights("S3DIS"))
    batch_d = {k: jnp.asarray(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(1)

    state, metrics = train_step(state, batch_d, key)  # compile
    _sync(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):  # steps chain through `state` on device
        state, metrics = train_step(state, batch_d, key)
    _sync(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    return b * n / dt


def measure_window_recall(n: int = 40960, k: int = 16):
    """Recall of the window KNN engine vs exact XLA KNN on one block
    (regression gate for the Pallas/window kernel, VERDICT round-1 #7).
    Returns (engine-default recall, recall at the model's L0 search window
    3840 — the recall the RandLA-Net pyramid actually runs at)."""
    import jax.numpy as jnp

    from ssdr_al_tpu.ops.knn import knn

    rng = np.random.RandomState(0)
    xyz = (rng.rand(1, n, 3) * 10).astype(np.float32)
    x = jnp.asarray(xyz)
    idx_e = np.asarray(knn(x, x, k, engine="xla"))[0]

    def recall(idx_w):
        hits = 0
        for i in range(0, n, 37):  # sampled rows (row-set comparison)
            hits += len(np.intersect1d(idx_w[i], idx_e[i]))
        return hits / (len(range(0, n, 37)) * k)

    r_default = recall(np.asarray(knn(x, x, k, engine="window"))[0])
    r_model = recall(
        np.asarray(knn(x, x, k, engine="window", window=3840))[0])
    return r_default, r_model


def measure_reference_tfmap(batch_size: int = 1):
    """Reference host-side tf_map re-execution (s3dis_dataset.py:156-183):
    per layer, KNN(k=16) self-search + 1-NN upsample search. Backend is
    scipy's C cKDTree — the same algorithmic class as the reference's
    nanoflann (utils/nearest_neighbors/knn_.h)."""
    from scipy.spatial import cKDTree

    from ssdr_al_tpu.config import ConfigS3DIS

    cfg = ConfigS3DIS
    rng = np.random.RandomState(0)
    xyz = (rng.rand(batch_size, cfg.num_points, 3) * 10).astype(np.float32)

    t0 = time.perf_counter()
    cur = xyz
    for i in range(cfg.num_layers):
        n = cur.shape[1]
        n_sub = n // cfg.sub_sampling_ratio[i]
        for b in range(batch_size):
            tree = cKDTree(cur[b])
            tree.query(cur[b], k=cfg.k_n)                 # neighbour_idx
        sub = cur[:, :n_sub, :]
        for b in range(batch_size):
            tree = cKDTree(sub[b])
            tree.query(cur[b], k=1)                       # up_i
        cur = sub
    dt = time.perf_counter() - t0
    return batch_size * cfg.num_points / dt


def measure_selection_round(num_rooms=4, points=20000, budget=60):
    """BASELINE config (3): full AL selection round wall-clock — chunked
    inference over all training clouds, per-superpoint uncertainty scoring,
    FPS-GCN diversity reasoning, NAIL oracle labeling — on synthetic scenes.

    Returns (wall_seconds, clouds, points)."""
    import shutil
    import tempfile

    import jax

    from ssdr_al_tpu.active.samplers import SeedSampler, TSampler, TSamplerArgs
    from ssdr_al_tpu.active.state import ALState, RoundStats
    from ssdr_al_tpu.config import ConfigS3DIS
    from ssdr_al_tpu.data.synthetic import make_dataset, NUM_SYNTH_CLASSES
    from ssdr_al_tpu.models.randlanet import RandLANet
    from ssdr_al_tpu.partition.superpoint import compute_superpoints
    from ssdr_al_tpu.train.trainer import create_train_state, make_eval_step
    import dataclasses

    cfg = dataclasses.replace(
        ConfigS3DIS, num_points=4096, num_classes=NUM_SYNTH_CLASSES,
        compute_dtype="bfloat16",  # same recommended config as the pipeline
    )
    work = tempfile.mkdtemp(prefix="bench_sel_")
    try:
        train, _ = make_dataset(num_train=num_rooms, num_points=points)
        state = ALState(work, ["t0", "sb", "clsbal", "gcn_fps", "WetSU",
                               "NAIL", "0.9", "1", "1", "0"])
        compute_superpoints(train, state, 0.03, log=lambda *a: None)
        total = state.load_registry()
        # the seed round lives under its own sampler-args dir, as in the CLI
        seed_state = ALState(work, ["seed"])
        seeder = SeedSampler(seed_state, train, total["sp_num"])
        seeder.sampling(max(1, total["sp_num"] // 20), 0, RoundStats())

        model = RandLANet(cfg)
        rng = np.random.RandomState(0)
        sample = {
            "xyz": (rng.rand(1, cfg.num_points, 3) * 6).astype(np.float32),
            "features": rng.rand(1, cfg.num_points, 6).astype(np.float32),
        }
        mstate = create_train_state(
            model, cfg, jax.random.PRNGKey(0), sample, 500
        )
        eval_step = make_eval_step(model, cfg)
        sampler = TSampler(
            state, train, cfg,
            TSamplerArgs(diversity="gcn_fps", oracle_mode="NAIL",
                         class_balance="clsbal"),
            total["sp_num"],
        )
        # warm the compiled paths, then measure a full round
        sampler.sampling(eval_step, mstate, budget, 1, RoundStats())
        t0 = time.perf_counter()
        sampler.sampling(eval_step, mstate, budget, 2, RoundStats())
        dt = time.perf_counter() - t0
        return dt, num_rooms, num_rooms * points
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--config", default="pipeline",
                   choices=["pipeline", "selection"])
    p.add_argument("--skip_selection", action="store_true",
                   help="omit the AL selection-round extra (saves ~1 min)")
    args = p.parse_args()

    if args.config == "selection":
        dt, clouds, pts = measure_selection_round()
        result = {
            "metric": "al_selection_round_wall_clock",
            "value": round(dt, 2),
            "unit": f"s ({clouds} clouds, {pts} points)",
            "vs_baseline": 0.0,  # reference wall-clock not measurable here
        }
        print(json.dumps(result))
        return

    batch = 6  # ConfigS3DIS.batch_size (helper_tool.py:53)
    tpu_pps = measure_tpu(batch)
    train_pps = measure_train_step(batch)
    recall, recall_model = measure_window_recall()
    # best-of-2 single-worker host tf_map, then credit the reference its
    # 6 DataLoader workers with ideal linear scaling (see module docstring)
    host_1w = max(measure_reference_tfmap(1) for _ in range(2))
    host_6w = host_1w * REF_WORKERS

    # Semantic3D block config (65536 pts × batch 4, helper_tool.py:77-117):
    # the second dataset family's forward on the same fast path
    sem3d_pps = measure_tpu(4, iters=6, dataset="Semantic3D")

    extras = {
        "semantic3d_block_pipeline_points_per_sec_per_chip": round(
            sem3d_pps, 1),
        "train_step_points_per_sec_per_chip": round(train_pps, 1),
        "host_tfmap_1worker_points_per_sec": round(host_1w, 1),
        "host_tfmap_6worker_points_per_sec": round(host_6w, 1),
        "knn_window_recall_at_16": round(recall, 4),
        "knn_window_recall_at_16_model_w3840": round(recall_model, 4),
    }
    if not args.skip_selection:
        dt, clouds, pts = measure_selection_round()
        extras["al_selection_round_s"] = round(dt, 2)
        extras["al_selection_round_workload"] = f"{clouds} clouds, {pts} points"
    result = {
        "metric": "s3dis_block_pipeline_points_per_sec_per_chip",
        "value": round(tpu_pps, 1),
        "unit": "points/s/chip",
        "vs_baseline": round(tpu_pps / host_6w, 2),
        "extras": extras,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
