#!/bin/bash
# NAIL threshold sweep 0.6-1.0 (reference run_threshold_analysis.sh:1-11).
set -e
reg_strength=${REG_STRENGTH:-0.008}
for threshold in 0.6 0.7 0.8 0.9 1.0; do
  python -m ssdr_al_tpu.cli.al_loop --dataset S3DIS --reg_strength ${reg_strength} \
    --round 2 --sampler T --point_uncertainty_mode sb --classbal 2 \
    --uncertainty_mode WetSU --oracle_mode NAIL --gcn_fps 1 --threshold ${threshold}
done
