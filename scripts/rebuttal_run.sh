#!/bin/bash
# Rebuttal sweep: unbounded budget (t=10000000), min_size 5, reg 0.008.
# Mirrors the reference rebuttal_run.sh:1-16 — seed at 0.005, then 5 baseline
# samplers + the full SSDR method, all with the huge per-round click budget.
# On TPU the experiments run sequentially on one chip; on a pod slice, launch
# one per host.
set -e
reg_strength=${REG_STRENGTH:-0.008}
t=10000000
common="--dataset S3DIS --reg_strength ${reg_strength} --t ${t} --round 2 --min_size 5"

python -m ssdr_al_tpu.cli.seed --dataset S3DIS --reg_strength ${reg_strength} --seed_percent 0.005

python -m ssdr_al_tpu.cli.al_loop ${common} --sampler random --oracle_mode dominant
python -m ssdr_al_tpu.cli.al_loop ${common} --sampler T --point_uncertainty_mode entropy --classbal 0 --uncertainty_mode mean --oracle_mode dominant --threshold 0.9
python -m ssdr_al_tpu.cli.al_loop ${common} --sampler T --point_uncertainty_mode lc --classbal 0 --uncertainty_mode mean --oracle_mode dominant --threshold 0.9
python -m ssdr_al_tpu.cli.al_loop ${common} --sampler T --point_uncertainty_mode sb --classbal 0 --uncertainty_mode mean --oracle_mode dominant --threshold 0.9
python -m ssdr_al_tpu.cli.al_loop ${common} --sampler T --point_uncertainty_mode sb --classbal 2 --uncertainty_mode mean --oracle_mode dominant --threshold 0.9
# full SSDR: sb + clsbal + WetSU + gcn_fps + NAIL
python -m ssdr_al_tpu.cli.al_loop ${common} --sampler T --point_uncertainty_mode sb --classbal 2 --uncertainty_mode WetSU --gcn_fps 1 --oracle_mode NAIL --threshold 0.9
