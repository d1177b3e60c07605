"""REAL training-loop throughput: fresh host batches every step.

bench.py's train-step number reuses ONE device-resident batch, which measures
the device compute floor but hides the per-step host→device payload — and the
tunnel moves ~35 MB/s each way (measured), so a full-width fresh batch
(48 B/point) costs more than the device step itself. This script measures the
production pattern (TrainingPipeline prefetch → train_step per fresh batch):

  wide    — float32/int32 batches (48 B/point)
  narrow  — shrink_train_batch(quantize=False): bf16 features, u8
            labels/pseudo/activation (27 B/point)
  quant   — shrink_train_batch(quantize=True): u16 xyz/feat-xyz grids,
            u8 colors/labels/pseudo/activation (18 B/point)
  resident— same device batch every step (bench.py's compute floor)
  pool    — DeviceTrainPool: clouds resident on device, blocks extracted
            on device per step (host uploads ~100 B of ids/picks)

Usage: PYTHONPATH=/root/.axon_site:. python scripts/bench_train_loop.py
       [--batch 6] [--steps 10] [--rooms 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=6)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--rooms", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from ssdr_al_tpu.config import ConfigS3DIS, class_weights
    from ssdr_al_tpu.data.cloud import Cloud
    from ssdr_al_tpu.data.dataset import TrainingPipeline
    from ssdr_al_tpu.models.randlanet import RandLANet
    from ssdr_al_tpu.train.trainer import (
        create_train_state,
        make_train_step,
        shrink_train_batch,
    )

    cfg = ConfigS3DIS
    model = RandLANet(cfg)
    rng = np.random.RandomState(0)
    n_cloud = 120_000
    clouds = [
        Cloud(name=f"c{i}",
              xyz=(rng.rand(n_cloud, 3) * 10).astype(np.float32),
              colors=rng.rand(n_cloud, 3).astype(np.float32),
              labels=rng.randint(0, cfg.num_classes, n_cloud).astype(np.int32))
        for i in range(args.rooms)
    ]
    pseudo = {
        c.name: np.stack([
            (rng.rand(n_cloud) > 0.5).astype(np.float32),
            rng.randint(0, cfg.num_classes, n_cloud).astype(np.float32),
        ])
        for c in clouds
    }
    pipe = TrainingPipeline(clouds, cfg, pseudo_gt=pseudo, seed=0)
    sample = pipe.sample_batch(args.batch)
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(0),
        {"xyz": sample["xyz"], "features": sample["features"]}, 500)
    train_step = make_train_step(model, cfg, class_weights("S3DIS"))
    key = jax.random.PRNGKey(1)
    pts = args.batch * cfg.num_points

    def shrink(mode, b):
        if mode.startswith("narrow"):
            return shrink_train_batch(b, cfg, quantize=False)
        if mode.startswith("quant"):
            return shrink_train_batch(b, cfg, quantize=True)
        return b

    from ssdr_al_tpu.train.device_pool import DeviceTrainPool
    from ssdr_al_tpu.train.trainer import make_pooled_train_step

    pool = DeviceTrainPool(clouds, cfg, pseudo_gt=pseudo, seed=0)
    pooled_step = make_pooled_train_step(model, cfg, class_weights("S3DIS"),
                                         window=pool.window)

    def run(mode):
        nonlocal state
        if mode == "pool":
            ids, picks = pool.sample_indices(args.batch)
            pa = pool.device_args()
            s2, m = pooled_step(state, pa, ids, picks, key)
            float(m["loss"])
            t0 = time.perf_counter()
            for _ in range(args.steps):
                ids, picks = pool.sample_indices(args.batch)
                s2, m = pooled_step(s2, pa, ids, picks, key)
            float(m["loss"])
            return (time.perf_counter() - t0) / args.steps
        # compile + warm
        b = shrink(mode, pipe.sample_batch(args.batch))
        s2, m = train_step(state, b, key)
        float(m["loss"])
        if mode == "resident":
            bd = {k: jnp.asarray(v) for k, v in b.items()}
            t0 = time.perf_counter()
            for _ in range(args.steps):
                s2, m = train_step(s2, bd, key)
            float(m["loss"])
            return (time.perf_counter() - t0) / args.steps
        # (a shrink+device_put on the prefetch worker thread was measured
        # SLOWER — transfers serialize with device compute on this platform
        # and the extra thread contends; see the commit note)
        gen = pipe.batches(args.steps, args.batch, prefetch=2)
        t0 = time.perf_counter()
        for b in gen:
            b = shrink(mode, b)
            s2, m = train_step(s2, b, key)
        float(m["loss"])
        return (time.perf_counter() - t0) / args.steps

    for mode in ("resident", "quant", "pool",
                 "quant", "pool", "pool", "pool"):
        dt = run(mode)
        print(f"{mode:9s}: {dt * 1e3:7.1f} ms/step  "
              f"{pts / dt / 1e6:6.3f} M pts/s", flush=True)


if __name__ == "__main__":
    main()
