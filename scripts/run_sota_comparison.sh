#!/bin/bash
# SOTA-comparison sweep: superpoint -> seed -> baseline -> 6 sampler configs.
# Mirrors the reference run_sota_comparison.sh:1-16 (the last line is the full
# SSDR method). On TPU the experiments run sequentially on one chip; on a pod
# slice, launch one per host.
set -e
reg_strength=${REG_STRENGTH:-0.008}
seed_percent=${SEED_PERCENT:-0.005}
common="--dataset S3DIS --reg_strength ${reg_strength}"

python -m ssdr_al_tpu.cli.superpoint ${common}
python -m ssdr_al_tpu.cli.seed ${common} --seed_percent ${seed_percent}
python -m ssdr_al_tpu.cli.baseline ${common}
python -m ssdr_al_tpu.cli.max_dominant ${common}

# random baseline
python -m ssdr_al_tpu.cli.al_loop ${common} --round 2 --sampler random --oracle_mode dominant --threshold 0.9 --min_size 1
# uncertainty-only baselines
python -m ssdr_al_tpu.cli.al_loop ${common} --round 2 --sampler T --point_uncertainty_mode lc --classbal 0 --uncertainty_mode mean --oracle_mode dominant
python -m ssdr_al_tpu.cli.al_loop ${common} --round 2 --sampler T --point_uncertainty_mode entropy --classbal 0 --uncertainty_mode mean --oracle_mode dominant
python -m ssdr_al_tpu.cli.al_loop ${common} --round 2 --sampler T --point_uncertainty_mode sb --classbal 0 --uncertainty_mode mean --oracle_mode dominant
# + class balance
python -m ssdr_al_tpu.cli.al_loop ${common} --round 2 --sampler T --point_uncertainty_mode sb --classbal 2 --uncertainty_mode WetSU --oracle_mode dominant
# full SSDR: sb + clsbal + WetSU + gcn_fps + NAIL
python -m ssdr_al_tpu.cli.al_loop ${common} --round 2 --sampler T --point_uncertainty_mode sb --classbal 2 --uncertainty_mode WetSU --oracle_mode NAIL --gcn_fps 1
