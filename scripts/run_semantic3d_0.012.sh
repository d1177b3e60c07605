#!/bin/bash
# Semantic3D budget-schedule sweep at reg_strength 0.012, t=4.
# Mirrors the reference run_semantic3d_0.012.sh:1-16: superpoint ->
# fully-supervised baseline (50 epochs, lr decay 0.90; reference comment:
# mIoU 0.725) -> seed at 0.008 (reference comment: 4468 superpoints) ->
# 5 baseline samplers + the full SSDR method, all min_size 5.
set -e
reg_strength=${REG_STRENGTH:-0.012}
ds="--dataset semantic3d --reg_strength ${reg_strength}"
common="${ds} --t 4 --round 2 --min_size 5"

python -m ssdr_al_tpu.cli.superpoint ${ds}
python -m ssdr_al_tpu.cli.baseline ${ds} --max_epoch 50
python -m ssdr_al_tpu.cli.seed ${ds} --seed_percent 0.008

python -m ssdr_al_tpu.cli.al_loop ${common} --sampler random --oracle_mode dominant
python -m ssdr_al_tpu.cli.al_loop ${common} --sampler T --point_uncertainty_mode entropy --classbal 0 --uncertainty_mode mean --oracle_mode dominant --threshold 0.9
python -m ssdr_al_tpu.cli.al_loop ${common} --sampler T --point_uncertainty_mode lc --classbal 0 --uncertainty_mode mean --oracle_mode dominant --threshold 0.9
python -m ssdr_al_tpu.cli.al_loop ${common} --sampler T --point_uncertainty_mode sb --classbal 0 --uncertainty_mode mean --oracle_mode dominant --threshold 0.9
python -m ssdr_al_tpu.cli.al_loop ${common} --sampler T --point_uncertainty_mode sb --classbal 2 --uncertainty_mode mean --oracle_mode dominant --threshold 0.9
# full SSDR (reference comment: ~19 GB GPU memory for the GCN branch there;
# here the block-diagonal region graph keeps selection on the same chip)
python -m ssdr_al_tpu.cli.al_loop ${common} --sampler T --point_uncertainty_mode sb --classbal 2 --gcn_fps 1 --uncertainty_mode WetSU --oracle_mode NAIL --threshold 0.9
