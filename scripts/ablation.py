"""Sampler-ablation benchmark: does the SSDR method beat random selection?

The reference's core claim is that uncertainty + class-balance + diversity
reasoning (sb + clsbal + WetSU + gcn_fps + NAIL) reaches higher mIoU than
random region selection at the SAME click budget (ssdr_main_S3DIS2.py:138-152
protocol, run_sota_comparison.sh sweeps). This script reproduces that
comparison on HARD synthetic scenes (8 classes, confusable geometry, rare
classes, boundary label noise — data/synthetic.py:make_room_hard), where
random selection does not saturate.

    PYTHONPATH=/root/.axon_site:. python scripts/ablation.py \
        --rounds 6 --clicks 40 --out ABLATION.md

Writes one JSON line per (sampler, round) to stdout and a markdown summary.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import shutil
import tempfile
import time

import numpy as np


def run_config(tag, sampler_kind, workdir, train, val, cfg, total_sp,
               seed_percent, rounds, clicks, log, t=0, start_round=2,
               use_pool=False):
    import jax

    from ssdr_al_tpu.active.samplers import (
        RandomSampler,
        SeedSampler,
        TSampler,
        TSamplerArgs,
    )
    from ssdr_al_tpu.active.state import ALState, RoundStats
    from ssdr_al_tpu.data.dataset import TrainingPipeline
    from ssdr_al_tpu.train.evaluator import Evaluator
    from ssdr_al_tpu.train.trainer import Trainer, make_train_step

    state = ALState(workdir, [tag, f"t{t}"])
    seed_state = ALState(workdir, ["seed"])

    # device-resident training pool (--pool): blocks sampled on device,
    # per-step host upload ~100 B — the fresh-batch step runs at the
    # device floor (train/device_pool.py). Block-sampling RNG is a
    # different (equidistributed) stream than TrainingPipeline's, so pool
    # and non-pool studies are comparable but not bit-identical.
    pool = None
    if use_pool:
        from ssdr_al_tpu.train.device_pool import DeviceTrainPool

        pool = DeviceTrainPool(train, cfg, seed=1)
        if not pool.available:
            pool = None

    trainer = Trainer(
        cfg, "S3DIS",
        save_dir=os.path.join(workdir, "saver", f"{tag}_t{t}", "snapshots"),
        seed_save_dir=os.path.join(workdir, "saver", "seed", "snapshots"),
        log_fn=lambda *_: None,
    )
    trainer.weights = np.ones(cfg.num_classes, np.float32)
    trainer.train_step = make_train_step(trainer.model, cfg, trainer.weights)
    evaluate = Evaluator(cfg, val, max_epochs=6)

    # ---- seed round (shared labeling, per-config training for fairness of
    # the trainer state path; the seed SELECTION is identical across configs
    # because SeedSampler is seeded identically) ----
    if not os.path.exists(os.path.join(
            workdir, "saver", "seed", "snapshots", "snap-1")):
        seeder = SeedSampler(seed_state, train, total_sp, seed=0)
        seeder.sampling(max(1, int(total_sp * seed_percent)), 0, RoundStats())
        round_dir = seed_state.round_dir(1)
        pseudo = {c.name: seed_state.load_pseudo_gt(round_dir, c.name)
                  for c in train}
        pipe = TrainingPipeline(train, cfg, pseudo_gt=pseudo, seed=1)
        seed_trainer = Trainer(
            cfg, "S3DIS",
            save_dir=os.path.join(workdir, "saver", "seed", "snapshots"),
            log_fn=lambda *_: None,
        )
        seed_trainer.weights = trainer.weights
        seed_trainer.train_step = trainer.train_step
        seed_trainer.init_state(pipe.sample_batch(cfg.batch_size))
        if pool is not None:
            pool.update_pseudo_gt(pseudo)
            pool.reseed(1)
        miou, oa = seed_trainer.train_round(
            1, lambda e: pipe.batches(cfg.train_steps, cfg.batch_size),
            evaluate, device_pool=pool,
        )
        log({"sampler": "seed", "round": 1, "miou": round(miou, 4),
             "oa": round(oa, 4)})

    # ---- sampler ----
    if sampler_kind == "random":
        sampler = RandomSampler(state, train, total_sp, min_size=1,
                                oracle_mode="dominant", seed=t)
    else:
        sampler = TSampler(state, train, cfg, sampler_kind, total_sp, seed=t)

    trainer.init_state(
        TrainingPipeline(train, cfg, seed=2).sample_batch(cfg.batch_size)
    )

    curve = []
    for r in range(start_round, rounds + 1):
        trainer.restore_model(r - 1)
        stats = RoundStats()
        t0 = time.time()
        if sampler_kind == "random":
            sampler.sampling(clicks, r - 1, stats)
        else:
            sampler.sampling(trainer.eval_step, trainer.state, clicks,
                             r - 1, stats)
        sel_t = time.time() - t0

        round_dir = state.round_dir(r)
        pseudo = {c.name: state.load_pseudo_gt(round_dir, c.name)
                  for c in train}
        pipe = TrainingPipeline(train, cfg, pseudo_gt=pseudo,
                                seed=1000 * t + 100 + r)
        t0 = time.time()
        if pool is not None:
            pool.update_pseudo_gt(pseudo)
            pool.reseed(1000 * t + 100 + r)
        miou, oa = trainer.train_round(
            r, lambda e: pipe.batches(cfg.train_steps, cfg.batch_size),
            evaluate, device_pool=pool,
        )
        # pseudo-label quality: accuracy of the activated pseudo labels vs
        # true GT, and labeled coverage — discriminates "oracle produced bad
        # labels" from "training variance" when curves dip
        pg_hit = pg_n = act_n = tot_n = 0
        for c in train:
            pg = pseudo[c.name]
            act = pg[0] > 0
            pg_hit += int((pg[1][act].astype(np.int64) == c.labels[act]).sum())
            pg_n += int(act.sum())
            act_n += int(act.sum())
            tot_n += c.num_points
        rec = {"sampler": tag, "round": r, "miou": round(miou, 4),
               "oa": round(oa, 4), "labeled_sp": stats.sp_num,
               "labeled_pts": stats.p_num + stats.sub_p_num,
               "pseudo_acc": round(pg_hit / max(pg_n, 1), 4),
               "coverage": round(act_n / max(tot_n, 1), 4),
               "sel_s": round(sel_t, 1), "train_s": round(time.time() - t0, 1)}
        log(rec)
        curve.append(rec)
    return curve


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from ssdr_al_tpu.active.samplers import TSamplerArgs
    from ssdr_al_tpu.config import ConfigS3DIS
    from ssdr_al_tpu.data.synthetic import (
        NUM_SYNTH_CLASSES_HARD,
        make_dataset,
    )
    from ssdr_al_tpu.partition.superpoint import compute_superpoints

    p = argparse.ArgumentParser()
    p.add_argument("--rounds", type=int, default=6)
    p.add_argument("--clicks", type=int, default=40)
    p.add_argument("--rooms", type=int, default=4)
    p.add_argument("--points", type=int, default=20000)
    p.add_argument("--seed_percent", type=float, default=0.01)
    p.add_argument("--reg_strength", type=float, default=0.03)
    p.add_argument("--out", default="ABLATION.md")
    p.add_argument("--workdir", default="")
    p.add_argument("--t", type=int, default=0,
                   help="trial seed: varies sampler + training-pipeline RNG")
    p.add_argument("--configs", default="random,sb_mean,ssdr_full",
                   help="comma-separated subset of: random, sb_mean, "
                        "ssdr_full, ssdr_dom, ssdr_gcn, ssdr_edcd "
                        "('' = all)")
    p.add_argument("--train_steps", type=int, default=30,
                   help="steps per epoch (reference: 500, helper_tool.py:52)")
    p.add_argument("--max_epoch", type=int, default=3,
                   help="epochs per AL round (reference: 30)")
    p.add_argument("--start_round", type=int, default=2,
                   help="resume a crashed run: first AL round to execute "
                        "(requires --workdir with rounds < start_round on "
                        "disk; the AL state protocol is round-resumable)")
    p.add_argument("--pool", action="store_true",
                   help="device-resident training pool: fresh-batch steps "
                        "at the device floor (~1.6 M pts/s vs ~1.2 host "
                        "pipeline) — use for high-fidelity studies")
    args = p.parse_args()

    cfg = dataclasses.replace(
        ConfigS3DIS,
        num_points=4096, num_classes=NUM_SYNTH_CLASSES_HARD,
        batch_size=4, val_batch_size=4, train_steps=args.train_steps,
        val_steps=10, max_epoch=args.max_epoch, eval_start_frac=0.5,
    )
    work = args.workdir or tempfile.mkdtemp(prefix="ablation_")
    os.makedirs(work, exist_ok=True)

    def log(rec):
        print(json.dumps(rec), flush=True)

    try:
        train, val = make_dataset(num_train=args.rooms, num_val=1,
                                  num_points=args.points, hard=True)
        from ssdr_al_tpu.active.state import ALState

        state = ALState(work, ["partition"])
        if os.path.exists(os.path.join(state.superpoint_dir, "total.pkl")):
            # shared --workdir across seed invocations: partition (and the
            # seed round, below) are seed-independent — reuse them
            total = state.load_registry()
        else:
            total = compute_superpoints(train, state, args.reg_strength,
                                        log=lambda *a: None)
        total_sp = total["sp_num"]
        log({"event": "setup", "total_sp": total_sp,
             "clicks_per_round": args.clicks, "rounds": args.rounds})

        all_configs = [
            ("random", "random"),
            ("sb_mean", TSamplerArgs(
                point_uncertainty_mode="sb", uncertainty_mode="mean",
                oracle_mode="dominant", class_balance="", diversity="")),
            ("ssdr_full", TSamplerArgs(
                point_uncertainty_mode="sb", uncertainty_mode="WetSU",
                oracle_mode="NAIL", class_balance="clsbal",
                diversity="gcn_fps")),
            # full diversity stack with the dominant oracle: isolates NAIL's
            # split-budget cost (at tiny click budgets the splits eat budget;
            # the reference runs at 10000 clicks/round where they amortize)
            ("ssdr_dom", TSamplerArgs(
                point_uncertainty_mode="sb", uncertainty_mode="WetSU",
                oracle_mode="dominant", class_balance="clsbal",
                diversity="gcn_fps")),
            # trainable-coreGCN diversity branch (gcn.py:235-263): the
            # 20000-step GCN fit + kCenterGreedy selection — quality
            # evidence that the branch selects sanely end-to-end
            ("ssdr_gcn", TSamplerArgs(
                point_uncertainty_mode="sb", uncertainty_mode="WetSU",
                oracle_mode="NAIL", class_balance="clsbal",
                diversity="gcn")),
            # edcd diversity branch (sampler2.py:693-706): superpoint FPS
            # over centroid-ED + chamfer-CD on the top-2B candidate pool
            ("ssdr_edcd", TSamplerArgs(
                point_uncertainty_mode="sb", uncertainty_mode="WetSU",
                oracle_mode="NAIL", class_balance="clsbal",
                diversity="edcd")),
        ]
        wanted = [c for c in args.configs.split(",") if c]
        unknown = set(wanted) - {name for name, _ in all_configs}
        if unknown:
            raise SystemExit(
                f"unknown --configs {sorted(unknown)}; "
                f"choose from {[name for name, _ in all_configs]}"
            )
        configs = [c for c in all_configs if not wanted or c[0] in wanted]
        curves = {}
        for tag, kind in configs:
            curves[tag] = run_config(
                tag, kind, work, train, val, cfg, total_sp,
                args.seed_percent, args.rounds, args.clicks, log, t=args.t,
                start_round=args.start_round, use_pool=args.pool,
            )

        if args.start_round > 2:
            # resumed run: curves are partial — the caller assembles the
            # summary from the concatenated JSONL instead
            final = {t: curves[t][-1]["miou"] for t, _ in configs}
            log({"event": "done", "final_miou": final, "resumed": True})
            return

        # markdown summary
        lines = [
            "# Sampler ablation (hard synthetic scenes)", "",
            f"{args.rooms} rooms x {args.points} pts, "
            f"{NUM_SYNTH_CLASSES_HARD} classes, {total_sp} superpoints, "
            f"seed {args.seed_percent:.0%}, {args.clicks} clicks/round.", "",
            "| round | " + " | ".join(t for t, _ in configs) + " |",
            "|---| " + " | ".join("---" for _ in configs) + " |",
        ]
        for i in range(args.rounds - 1):
            row = [str(curves[t][i]["round"]) for t, _ in configs][:1]
            row += [f"{curves[t][i]['miou']:.4f}" for t, _ in configs]
            lines.append("| " + " | ".join(row) + " |")
        final = {t: curves[t][-1]["miou"] for t, _ in configs}
        lines += ["",
                  f"Final-round mIoU: {json.dumps(final)}", ""]
        with open(args.out, "w") as f:
            f.write("\n".join(lines))
        log({"event": "done", "final_miou": final, "out": args.out})
    finally:
        if not args.workdir:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
