#!/bin/bash
# Semantic3D pipeline (reference run_semantic3d_0.012.sh:1-16): superpoint ->
# seed (0.008 => ~4468 superpoints) -> full SSDR AL loop, sp budget 3000.
set -e
reg_strength=${REG_STRENGTH:-0.012}
common="--dataset semantic3d --reg_strength ${reg_strength}"
python -m ssdr_al_tpu.cli.superpoint ${common}
python -m ssdr_al_tpu.cli.seed ${common} --seed_percent 0.008
python -m ssdr_al_tpu.cli.al_loop ${common} --round 2 --sampler T \
  --point_uncertainty_mode sb --classbal 2 --uncertainty_mode WetSU \
  --oracle_mode NAIL --gcn_fps 1 --min_size 5
