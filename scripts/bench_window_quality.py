"""search_window A/B: model QUALITY + train/forward cost vs the L0 window.

CLAUDE.md notes the window-search kernel is at its algorithmic floor and
"further gains need fewer distance computations (smaller window), which the
0.93 recall gate blocks". But 0.93 is an ENGINE-recall regression floor, not
a model-quality requirement — RandLA-Net's aggregation randomizes its
neighborhoods everywhere, so lower neighbor recall may be statistically
invisible (ops/knn.py docstring). This script measures the thing that
actually matters: a model TRAINED at each search_window on 40960-pt blocks
(the production shape), its val mIoU, and its prediction agreement against
an exact-KNN evaluation of the same parameters — plus the train-step and
forward wall-clock at each window.

    PYTHONPATH=/root/.axon_site:. python scripts/bench_window_quality.py \
        --windows 4096,3072,2048 --steps 60 --epochs 3

One JSON line per window with {miou, agreement_vs_exact, fwd_ms, step_ms}.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--windows", default="4096,3072,2048")
    p.add_argument("--dataset", default="S3DIS",
                   choices=["S3DIS", "Semantic3D"],
                   help="block geometry: S3DIS = 40960-pt blocks, "
                        "Semantic3D = 65536-pt blocks (VERDICT r4 #5: the "
                        "sw=2048 default needs per-dataset evidence)")
    p.add_argument("--rooms", type=int, default=2)
    p.add_argument("--room_points", type=int, default=120000)
    p.add_argument("--batch", type=int, default=3)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from ssdr_al_tpu.config import get_config
    from ssdr_al_tpu.data.dataset import TrainingPipeline
    from ssdr_al_tpu.data.synthetic import (
        NUM_SYNTH_CLASSES_HARD,
        make_dataset,
    )
    from ssdr_al_tpu.models.randlanet import RandLANet
    from ssdr_al_tpu.train.evaluator import simple_evaluate
    from ssdr_al_tpu.train.trainer import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )

    train, val = make_dataset(num_train=args.rooms, num_val=1,
                              num_points=args.room_points, hard=True)
    # dataset block geometry (num_points / d_out / sub ratios) with
    # synthetic-hard labels; ignored labels cleared (synthetic GT has none)
    base = dataclasses.replace(
        get_config(args.dataset), num_classes=NUM_SYNTH_CLASSES_HARD,
        ignored_label_inds=(),
        batch_size=args.batch, val_batch_size=args.batch,
        train_steps=args.steps, max_epoch=args.epochs,
        compute_dtype="bfloat16",
    )
    weights = np.ones(base.num_classes, np.float32)

    def _sync(x):
        return float(jnp.sum(x[0]) if isinstance(x, tuple) else jnp.sum(x))

    def val_batches(cfg, seed=7, num=6):
        pipe = TrainingPipeline(val, cfg, seed=seed)
        return [pipe.sample_batch(cfg.val_batch_size) for _ in range(num)]

    vbatches = val_batches(base)
    results = []
    for sw in [int(w) for w in args.windows.split(",")]:
        cfg = dataclasses.replace(base, search_window=sw)
        model = RandLANet(cfg)
        pipe = TrainingPipeline(train, cfg, seed=2)
        sample = pipe.sample_batch(cfg.batch_size)
        state = create_train_state(
            model, cfg, jax.random.PRNGKey(0), sample, cfg.train_steps)
        train_step = make_train_step(model, cfg, weights)
        key = jax.random.PRNGKey(1)
        t_steps = []
        for ep in range(cfg.max_epoch):
            for i, batch in enumerate(
                    pipe.batches(cfg.train_steps, cfg.batch_size)):
                bd = {k: jnp.asarray(v) for k, v in batch.items()}
                t0 = time.perf_counter()
                state, metrics = train_step(state, bd, key)
                if ep == cfg.max_epoch - 1:
                    _sync(metrics["loss"])
                    t_steps.append(time.perf_counter() - t0)
        step_ms = float(np.median(t_steps) * 1e3)

        eval_w = make_eval_step(model, cfg)
        eval_exact = make_eval_step(model, cfg, knn_engine="xla")
        miou, oa = simple_evaluate(
            eval_w, state, vbatches, cfg.num_classes)
        # prediction agreement of the SAME trained params: window pyramid
        # vs exact-KNN pyramid on the val blocks
        agree, tot = 0, 0
        for batch in vbatches[:2]:
            bd = {k: jnp.asarray(v) for k, v in batch.items()}
            pw, _ = eval_w(state, bd)
            pe, _ = eval_exact(state, bd)
            a = np.asarray(jnp.argmax(pw, -1))
            b_ = np.asarray(jnp.argmax(pe, -1))
            agree += int((a == b_).sum())
            tot += a.size
        rec = {"search_window": sw, "miou": round(float(miou), 4),
               "oa": round(float(oa), 4),
               "agreement_vs_exact": round(agree / tot, 4),
               "train_step_ms": round(step_ms, 1)}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    if args.out:
        with open(args.out, "w") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
