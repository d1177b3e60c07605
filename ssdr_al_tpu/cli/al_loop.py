"""The closed-loop AL driver: restore → select → label → retrain, per round.

Flag parity with ssdr_main_S3DIS2.py:10-157 (sampler, point_uncertainty_mode,
uncertainty_mode, oracle_mode, classbal, edcd, gcn, gcn_fps, gcn_number,
gcn_top, threshold, min_size, t, reg_strength, round). The full SSDR method is
    --sampler T --point_uncertainty_mode sb --classbal 2 \
    --uncertainty_mode WetSU --oracle_mode NAIL --gcn_fps 1
(run_sota_comparison.sh:14).
"""

from __future__ import annotations

import argparse
import time

from ssdr_al_tpu.active.samplers import RandomSampler, TSampler, TSamplerArgs
from ssdr_al_tpu.active.state import RoundStats
from ssdr_al_tpu.cli.common import (
    add_common_args,
    log_out,
    make_evaluator,
    make_record_file,
    make_trainer,
    make_training_pipeline,
    pseudo_gt_for_round,
    setup_experiment,
)

def build_sampler_args(args) -> list:
    """The experiment-ID list (ssdr_main_S3DIS2.py:91-127)."""
    t = f"t{args.t}"
    if args.sampler == "random":
        return [t, "random", args.oracle_mode, str(args.threshold),
                str(args.min_size), str(args.gcn_number), str(args.gcn_top)]
    sa = [t, args.point_uncertainty_mode]
    if args.classbal == 1:
        sa.append("classbal")
    elif args.classbal == 2:
        sa.append("clsbal")
    if args.edcd:
        sa.append("edcd")
    if args.gcn:
        sa.append("gcn")
    if args.gcn_fps:
        sa.append("gcn_fps")
    sa += [args.uncertainty_mode, args.oracle_mode, str(args.threshold),
           str(args.min_size), str(args.gcn_number), str(args.gcn_top)]
    return sa


def run_al_loop(args):
    exp = setup_experiment(args)
    sampler_args = build_sampler_args(args)
    state = exp.make_state(sampler_args)
    record = make_record_file(args, sampler_args)

    total_obj = state.load_registry()
    total_sp_num = total_obj["sp_num"]
    log_out(f"total_sp_num {total_sp_num}", record)

    diversity = ""
    if args.edcd:
        diversity = "edcd"
    elif args.gcn:
        diversity = "gcn"
    elif args.gcn_fps:
        diversity = "gcn_fps"

    trainer = make_trainer(exp, sampler_args, args.knn_engine,
                           num_devices=args.num_devices)
    if args.sampler == "random":
        sampler = RandomSampler(
            state, exp.train_clouds, total_sp_num, args.min_size,
            oracle_mode=args.oracle_mode, seed=args.t,
        )
    else:
        # selection inference shares the trainer's data-parallel mesh: the
        # stacked chunk axis is sharded over chips (InferenceRunner)
        sampler = TSampler(
            state, exp.train_clouds, exp.cfg,
            TSamplerArgs(
                point_uncertainty_mode=args.point_uncertainty_mode,
                uncertainty_mode=args.uncertainty_mode,
                oracle_mode=args.oracle_mode,
                class_balance={0: "", 1: "classbal", 2: "clsbal"}[args.classbal],
                diversity=diversity,
                threshold=args.threshold,
                min_size=args.min_size,
                gcn_number=args.gcn_number,
                gcn_top=args.gcn_top,
                chamfer_cap=getattr(args, "chamfer_cap", 512),
                chamfer_mxu={-1: None, 0: False, 1: True}[
                    getattr(args, "chamfer_mxu", -1)],
            ),
            total_sp_num, seed=args.t, mesh=trainer.mesh,
        )
    pipe0 = make_training_pipeline(exp)
    trainer.init_state(pipe0.sample_batch(exp.cfg.batch_size))
    # device-resident training pool: fresh-batch steps at the device floor
    # (train/device_pool.py). S3DIS-family random-block sampling only (the
    # Semantic3D possibility schedule is a host feedback loop) and single
    # device (the dp mesh shards host batches instead); falls back silently
    # if the clouds exceed the SSDR_TRAIN_POOL_MB budget.
    pool = None
    if getattr(args, "pool", 0):
        if exp.dataset_name == "semantic3d":
            # possibility-scheduled pool (the train2 generator on device);
            # its batch scan is sequential — single-device only
            if trainer.mesh is None:
                from ssdr_al_tpu.train.possibility_pool import (
                    PossibilityDevicePool,
                )

                pool = PossibilityDevicePool(exp.train_clouds, exp.cfg,
                                             seed=args.t)
            else:
                # surface the silent fallback (ADVICE r4): dp vs single
                # Semantic3D runs would otherwise differ in training-data
                # stream (pool RNG vs host pipeline RNG) with no trace
                log_out(
                    "possibility pool is single-device only; host "
                    "pipeline under dp", record)
        else:
            # dp-compatible: trainer replicates the slab and shards the
            # per-step ids/picks over the mesh
            from ssdr_al_tpu.train.device_pool import DeviceTrainPool

            pool = DeviceTrainPool(exp.train_clouds, exp.cfg, seed=args.t)
        if pool is not None and not pool.available:
            log_out("device pool over budget; host pipeline", record)
            pool = None
        if pool is not None and args.round > 2:
            # the pool's block-sampling RNG is an equidistributed but
            # DIFFERENT stream than TrainingPipeline's — resuming a run
            # that trained earlier rounds on the host pipeline switches
            # streams mid-curve; surface it so a trajectory kink isn't
            # misread as a sampler effect
            log_out(
                f"resuming at round {args.round} with the device pool: "
                "block-sampling RNG differs from the host pipeline "
                "(pass --pool 0 to keep the original stream)", record)
    evaluate = make_evaluator(exp, mesh=trainer.mesh)

    sp_batch_size = args.sp_batch_size or exp.cfg.sp_batch_size
    last = args.rounds if args.rounds else exp.cfg.al_rounds[1]

    results = []
    for r in range(args.round, last + 1):
        trainer.restore_model(r - 1)
        t0 = time.time()
        stats = RoundStats()
        if args.sampler == "random":
            sampler.sampling(sp_batch_size, r - 1, stats,
                             threshold=args.threshold)
        else:
            sampler.sampling(trainer.eval_step, trainer.state, sp_batch_size,
                             r - 1, stats)
        regions = max(stats.sp_num + stats.split_sp_num, 1)
        points = stats.p_num + stats.sub_p_num
        log_out(
            f"round= {r} | labeling mean point={points / regions:.1f}, "
            f"{stats}, costTime={time.time() - t0:.1f}",
            record,
        )

        t0 = time.time()
        round_dir = state.round_dir(r)
        pseudo = pseudo_gt_for_round(state, round_dir, exp.train_clouds)
        pipe = make_training_pipeline(exp, pseudo_gt=pseudo, seed=r)
        if pool is not None:
            pool.update_pseudo_gt(pseudo)
            pool.reseed(r)
            if hasattr(pool, "reset_possibility"):
                pool.reset_possibility(r)
        miou, oa = trainer.train_round(
            r, lambda epoch: pipe.batches(exp.cfg.train_steps, exp.cfg.batch_size),
            evaluate, device_pool=pool,
        )
        log_out(
            f"round= {r} | best_miou= {miou:.4f}, best_OA= {oa:.4f}, "
            f"costTime={time.time() - t0:.1f}",
            record,
        )
        results.append((miou, oa))
    record.close()
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description="active-learning loop")
    add_common_args(p)
    p.add_argument("--sampler", type=str, default="T", choices=["random", "T"])
    p.add_argument("--round", type=int, default=2)
    p.add_argument("--rounds", type=int, default=0,
                   help="last round (0 = dataset default 33)")
    p.add_argument("--classbal", type=int, default=0, choices=[0, 1, 2])
    p.add_argument("--edcd", type=int, default=0, choices=[0, 1])
    p.add_argument("--gcn", type=int, default=0, choices=[0, 1])
    p.add_argument("--gcn_fps", type=int, default=0, choices=[0, 1])
    p.add_argument("--gcn_number", type=int, default=1)
    p.add_argument("--gcn_top", type=int, default=0)
    p.add_argument("--uncertainty_mode", type=str, default="mean",
                   choices=["mean", "sum_weight", "WetSU"])
    p.add_argument("--point_uncertainty_mode", type=str, default="entropy",
                   choices=["lc", "sb", "entropy"])
    p.add_argument("--oracle_mode", type=str, default="dominant",
                   choices=["dominant", "NAIL"])
    p.add_argument("--threshold", type=float, default=0.9)
    p.add_argument("--chamfer_cap", type=int, default=512,
                   help="padded superpoint size cap for pairwise chamfer "
                        "(0 = exact parity, unbounded)")
    p.add_argument("--chamfer_mxu", type=int, default=-1, choices=[-1, 0, 1],
                   help="chamfer distance build on the MXU (bf16x3 cross "
                        "term; picks identical to exact f32 — "
                        "scripts/bench_chamfer_mxu.py). -1 = platform "
                        "default (SSDR_CHAMFER_MXU)")
    p.add_argument("--min_size", type=int, default=1)
    p.add_argument("--pool", type=int, default=1, choices=[0, 1],
                   help="device-resident training pool (fresh-batch steps "
                        "at the device floor; Semantic3D uses the "
                        "possibility-scheduled variant); auto-falls back "
                        "to the host pipeline off-budget / under dp")
    p.add_argument("--t", type=int, default=0)
    p.add_argument("--sp_batch_size", type=int, default=0,
                   help="clicks per round (0 = dataset default)")
    args = p.parse_args(argv)
    run_al_loop(args)


if __name__ == "__main__":
    main()
