#!/bin/bash
# Repeated-run study (reference run_add_t200.sh): t=200/201 run ids, lc/sb
# uncertainty, dominant oracle, min_size 5.
set -e
reg_strength=${REG_STRENGTH:-0.012}
for t in 200 201; do
  for unc in lc sb; do
    python -m ssdr_al_tpu.cli.al_loop --dataset semantic3d --reg_strength ${reg_strength} \
      --t ${t} --round 2 --sampler T --point_uncertainty_mode ${unc} --classbal 0 \
      --uncertainty_mode mean --oracle_mode dominant --threshold 0.9 --min_size 5
  done
done
