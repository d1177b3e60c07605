"""Superpoint partition CLI — the offline preprocessing entry point.

Flag parity with partition/compute_superpoint.py:118-131:
  python -m ssdr_al_tpu.cli.superpoint --dataset S3DIS --reg_strength 0.008 \
      --k_nn_geof 45 --k_nn_adj 10 --lambda_edge_weight 1.0 --test_area 5
"""

from __future__ import annotations

import argparse

from ssdr_al_tpu.cli.common import add_common_args, setup_experiment
from ssdr_al_tpu.partition.superpoint import (
    compute_superpoints,
    superpoint_size_distribution,
)


def main(argv=None):
    p = argparse.ArgumentParser(description="superpoint partition")
    add_common_args(p)
    p.add_argument("--k_nn_geof", type=int, default=45)
    p.add_argument("--k_nn_adj", type=int, default=10)
    p.add_argument("--lambda_edge_weight", type=float, default=1.0)
    p.add_argument("--knn_backend", type=str, default="auto",
                   choices=["auto", "device", "host"])
    args = p.parse_args(argv)

    exp = setup_experiment(args)
    state = exp.make_state([])
    # synthetic scenes are dense & small: cap the geof neighborhood
    k_geof = min(args.k_nn_geof, max(8, min(c.num_points for c in exp.train_clouds) - 1))
    compute_superpoints(
        exp.train_clouds, state, args.reg_strength,
        k_adj=args.k_nn_adj, k_geof=k_geof,
        lambda_edge_weight=args.lambda_edge_weight,
        knn_backend=args.knn_backend,
    )
    dist = superpoint_size_distribution(
        state, [c.name for c in exp.train_clouds]
    )
    print(f"superpoint distribution: sp_count={dist['sp_count']} "
          f"mean_size={dist['mean_size']:.1f}")


if __name__ == "__main__":
    main()
