"""Dominant-label upper bound: label ALL superpoints with their dominant
ground-truth label, train once.

Parity with ssdr_max_dominant.py (AllSampler with an unlimited budget)."""

from __future__ import annotations

import argparse

from ssdr_al_tpu.active.samplers import AllSampler
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

def run_max_dominant(args):
    exp = setup_experiment(args)
    sampler_args = ["max_dominant"]
    state = exp.make_state(sampler_args)
    record = make_record_file(args, sampler_args)

    total_obj = state.load_registry()
    total_sp_num = total_obj["sp_num"]
    sampler = AllSampler(state, exp.train_clouds, total_sp_num,
                         oracle_mode="dominant")
    stats = RoundStats()
    sampler.sampling(total_sp_num, last_round=1, stats=stats)
    log_out(f"max_dominant: labeled {stats.sp_num} superpoints "
            f"({stats.p_num} points)", record)

    trainer = make_trainer(exp, sampler_args, args.knn_engine,
                           num_devices=args.num_devices)
    round_dir = state.round_dir(2)
    pipe = make_training_pipeline(exp, pseudo_gt=pseudo_gt_for_round(state, round_dir, exp.train_clouds),)
    trainer.init_state(pipe.sample_batch(exp.cfg.batch_size))
    evaluate = make_evaluator(exp, mesh=trainer.mesh)
    miou, oa = trainer.train_round(
        2, lambda epoch: pipe.batches(exp.cfg.train_steps, exp.cfg.batch_size),
        evaluate,
    )
    log_out(f"max_dominant | best_miou= {miou:.4f}, best_OA= {oa:.4f}", record)
    record.close()
    return miou, oa


def main(argv=None):
    p = argparse.ArgumentParser(description="dominant-label upper bound")
    add_common_args(p)
    args = p.parse_args(argv)
    run_max_dominant(args)


if __name__ == "__main__":
    main()
