"""Standalone evaluation: run a saved snapshot on the validation clouds,
write per-cloud prediction PLYs, and report OA/mIoU.

Covers the reference's offline evaluation tooling (evaluate_test_* plus the
prediction-PLY export consumed by utils/6_fold_cv.py and
partition/write_Semantic3d.py):

  python -m ssdr_al_tpu.cli.evaluate --synthetic --reg_strength 0.05 \
      --snapshot data/S3DIS/0.05/saver/seed/snapshots/snap-1 --out preds/
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ssdr_al_tpu.cli.common import add_common_args, setup_experiment
from ssdr_al_tpu.data.dataset import SamplingPipeline
from ssdr_al_tpu.models.randlanet import RandLANet
from ssdr_al_tpu.train.cross_val import score_prediction_plys
from ssdr_al_tpu.train.trainer import (
    create_train_state,
    make_eval_step,
    restore_checkpoint,
)
from ssdr_al_tpu.utils.visualize import (
    export_semantic3d_labels,
    write_prediction_ply,
)


def run_evaluate(args):
    import jax

    exp = setup_experiment(args)
    cfg = exp.cfg
    model = RandLANet(cfg)
    rng = np.random.RandomState(0)
    sample = {
        "xyz": (rng.rand(1, cfg.num_points, 3) * 6).astype(np.float32),
        "features": rng.rand(1, cfg.num_points, 6).astype(np.float32),
    }
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), sample, 500)
    state = restore_checkpoint(args.snapshot, state)
    eval_step = make_eval_step(model, cfg, args.knn_engine)

    os.makedirs(args.out, exist_ok=True)
    pipe = SamplingPipeline(exp.val_clouds, cfg)
    for cloud in exp.val_clouds:
        probs_sum = np.zeros((cloud.num_points, cfg.num_classes), np.float32)
        pending = []
        for batch, idx, valid in pipe.cloud_chunks(cloud):
            probs, _ = eval_step(state, batch)
            pending.append((idx, valid, probs))
        for idx, valid, probs in pending:
            probs_sum[idx[:valid]] += np.asarray(probs)[0][:valid]

        if cloud.proj_idx is not None:
            # reproject sub-cloud votes to the full-resolution points
            # (RandLANet.py:375-419; write_Semantic3d.py interpolate step):
            # predictions and metrics below are FULL resolution
            pred = probs_sum[cloud.proj_idx].argmax(axis=1)
            gt = cloud.full_labels
            xyz = _full_res_xyz(exp.input_path, cloud.name)
            if xyz is None:  # original_ply absent: keep sub xyz per point via proj
                xyz = cloud.xyz[cloud.proj_idx]
            proj = cloud.proj_idx
        else:
            pred = probs_sum.argmax(axis=1)
            gt = cloud.labels
            xyz = cloud.xyz
            proj = np.arange(cloud.num_points)
        write_prediction_ply(
            os.path.join(args.out, cloud.name + ".ply"), xyz, pred, gt,
        )
        if args.export_labels:
            export_semantic3d_labels(
                os.path.join(args.out, cloud.name + ".labels"),
                probs_sum, proj,
                label_values=np.arange(1, cfg.num_classes + 1),
            )
    result = score_prediction_plys(args.out, cfg.num_classes)
    print(f"OA={result['oa']:.4f} mIoU={result['miou']:.4f} "
          f"IoU={['%.3f' % x for x in result['iou']]}")
    return result


def _full_res_xyz(input_path: str, name: str):
    """xyz of the original (full-resolution) cloud, if the prep step kept it
    (data/prepare.py writes original_ply/ next to input_<grid>/)."""
    from ssdr_al_tpu.data.ply import read_ply

    path = os.path.join(os.path.dirname(input_path), "original_ply",
                        name + ".ply")
    if not os.path.exists(path):
        return None
    data = read_ply(path)
    return np.vstack((data["x"], data["y"], data["z"])).T.astype(np.float32)


def main(argv=None):
    p = argparse.ArgumentParser(description="standalone evaluation")
    add_common_args(p)
    p.add_argument("--snapshot", required=True)
    p.add_argument("--out", default="./predictions")
    p.add_argument("--export_labels", action="store_true",
                   help="also write Semantic3D-style .labels files")
    args = p.parse_args(argv)
    run_evaluate(args)


if __name__ == "__main__":
    main()
