#!/bin/bash
# gcn_number x gcn_top sweep (reference run_graph_reasoning_analysis.sh:1-13).
set -e
reg_strength=${REG_STRENGTH:-0.008}
common="--dataset S3DIS --reg_strength ${reg_strength} --round 2 --sampler T \
  --point_uncertainty_mode sb --classbal 2 --uncertainty_mode WetSU \
  --oracle_mode NAIL --gcn_fps 1"
for gcn_number in 1 2 3; do
  for gcn_top in 0 5 10; do
    python -m ssdr_al_tpu.cli.al_loop ${common} --gcn_number ${gcn_number} --gcn_top ${gcn_top}
  done
done
