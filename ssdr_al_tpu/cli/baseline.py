"""Fully-supervised baseline: label every superpoint precisely, train once.

Parity with ssdr_create_baseline.py (precise labels for all superpoints via
the seed path with 100% budget)."""

from __future__ import annotations

import argparse

from ssdr_al_tpu.active.samplers import SeedSampler
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

def run_baseline(args):
    exp = setup_experiment(args)
    sampler_args = ["baseline"]
    state = exp.make_state(sampler_args)
    record = make_record_file(args, sampler_args)

    total_obj = state.load_registry()
    total_sp_num = total_obj["sp_num"]
    sampler = SeedSampler(state, exp.train_clouds, total_sp_num)
    stats = RoundStats()
    sampler.sampling(total_sp_num, last_round=0, stats=stats)
    log_out(f"baseline: labeled {stats.sp_num} superpoints "
            f"({stats.p_num} points)", record)

    trainer = make_trainer(exp, sampler_args, args.knn_engine,
                           num_devices=args.num_devices)
    round_dir = state.round_dir(1)
    pipe = make_training_pipeline(exp, pseudo_gt=pseudo_gt_for_round(state, round_dir, exp.train_clouds),)
    trainer.init_state(pipe.sample_batch(exp.cfg.batch_size))
    evaluate = make_evaluator(exp, mesh=trainer.mesh)
    miou, oa = trainer.train_round(
        1, lambda epoch: pipe.batches(exp.cfg.train_steps, exp.cfg.batch_size),
        evaluate,
    )
    log_out(f"baseline | best_miou= {miou:.4f}, best_OA= {oa:.4f}", record)
    record.close()
    return miou, oa


def main(argv=None):
    p = argparse.ArgumentParser(description="fully-supervised baseline")
    add_common_args(p)
    args = p.parse_args(argv)
    run_baseline(args)


if __name__ == "__main__":
    main()
