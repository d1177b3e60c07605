"""Shared CLI plumbing: experiment setup, data loading, logging.

The reference keys every on-disk path by the sampler-args string
(base_op.get_sampler_args_str) under data/<ds>/<reg_strength>/ — config IS the
directory layout (SURVEY.md §5). This module reproduces that layout and adds a
`--synthetic` mode that generates scenes on the fly (real S3DIS/Semantic3D
archives are not shipped in this environment).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import List

import numpy as np

from ssdr_al_tpu.active.state import ALState
from ssdr_al_tpu.config import Config, get_config
from ssdr_al_tpu.data.cloud import Cloud, load_clouds
from ssdr_al_tpu.data.ply import write_ply
from ssdr_al_tpu.data.synthetic import (
    NUM_SYNTH_CLASSES,
    NUM_SYNTH_CLASSES_HARD,
    make_dataset,
)


def log_out(msg: str, f=None):
    """Append+flush+print (RandLANet.py:13-16)."""
    if f is not None:
        f.write(msg + "\n")
        f.flush()
    print(msg)


def add_common_args(p: argparse.ArgumentParser):
    p.add_argument("--dataset", type=str, default="S3DIS",
                   choices=["S3DIS", "semantic3d", "SemanticKITTI"])
    p.add_argument("--data_root", type=str, default="./data")
    p.add_argument("--test_area", type=int, default=5)
    p.add_argument("--reg_strength", type=float, default=0.008)
    p.add_argument("--synthetic", action="store_true",
                   help="use generated scenes instead of a real dataset")
    p.add_argument("--synthetic_rooms", type=int, default=4)
    p.add_argument("--synthetic_points", type=int, default=20000)
    p.add_argument("--synthetic_easy", action="store_true",
                   help="legacy easy scenes (8 well-separated classes; "
                        "mIoU saturates ~0.999 by round 4). Default is the "
                        "HARD generator (confusable geometry, rare classes, "
                        "boundary noise — data/synthetic.py:make_room_hard) "
                        "so the flagship record_round curve differentiates "
                        "samplers instead of saturating")
    p.add_argument("--num_points", type=int, default=0,
                   help="override cfg.num_points (0 = dataset default)")
    p.add_argument("--max_epoch", type=int, default=0,
                   help="override cfg.max_epoch (0 = dataset default)")
    p.add_argument("--train_steps", type=int, default=0,
                   help="override cfg.train_steps (0 = dataset default)")
    p.add_argument("--val_steps", type=int, default=0,
                   help="override cfg.val_steps (0 = dataset default; the "
                        "synthetic default 8 is a smoke-test size — eval "
                        "mIoU over 16 random 4096-pt crops swings ±0.15 "
                        "round-to-round; use ≥40 for record_round curves "
                        "meant to compare samplers)")
    p.add_argument("--batch_size", type=int, default=0,
                   help="override cfg.batch_size (0 = dataset default)")
    p.add_argument("--knn_engine", type=str, default="window",
                   choices=["window", "window_og", "approx", "xla", "pallas"])
    p.add_argument("--compute_dtype", type=str, default="",
                   choices=["", "float32", "bfloat16"],
                   help="activation dtype ('' = config default float32; "
                        "bfloat16 recommended on TPU — measured 0.9986 pred "
                        "agreement vs float32 on 40960-pt blocks)")
    p.add_argument("--search_window", type=int, default=0,
                   help="morton search window for big pyramid layers "
                        "(0 = config default 2048; multiple of 512 in "
                        "[1024, 4096]; speed/recall knob — see "
                        "Config.search_window)")
    p.add_argument("--num_devices", type=int, default=1,
                   help="data-parallel chips (batch_size must be divisible)")


@dataclasses.dataclass
class Experiment:
    cfg: Config
    dataset_name: str
    data_path: str          # data/<ds>/<reg_strength>
    input_path: str         # data/<ds>/input_<grid>
    train_clouds: List[Cloud]
    val_clouds: List[Cloud]
    class_weight_name: str  # key for config.class_weights, or "" for flat

    def make_state(self, sampler_args) -> ALState:
        return ALState(self.data_path, sampler_args)

    def save_dir(self, sampler_args) -> str:
        from ssdr_al_tpu.active.state import sampler_args_str

        return os.path.join(
            self.data_path, "saver", sampler_args_str(sampler_args), "snapshots"
        )


def setup_experiment(args) -> Experiment:
    cfg = get_config(args.dataset)
    overrides = {}
    synth_hard = args.synthetic and not getattr(args, "synthetic_easy", False)
    if args.synthetic:
        overrides.update(
            num_classes=(NUM_SYNTH_CLASSES_HARD if synth_hard
                         else NUM_SYNTH_CLASSES),
            num_points=args.num_points or 4096,
            batch_size=2,
            val_batch_size=2,
            train_steps=args.train_steps or 8,
            val_steps=8,
            max_epoch=args.max_epoch or 4,
            sub_grid_size=0.0,
        )
    else:
        if args.num_points:
            overrides["num_points"] = args.num_points
        if args.max_epoch:
            overrides["max_epoch"] = args.max_epoch
        if args.train_steps:
            overrides["train_steps"] = args.train_steps
    # --val_steps / --batch_size apply to BOTH real and synthetic configs
    # (placed after the synthetic block so they override its smoke defaults)
    if getattr(args, "val_steps", 0):
        overrides["val_steps"] = args.val_steps
    if getattr(args, "batch_size", 0):
        overrides["batch_size"] = args.batch_size
    if getattr(args, "compute_dtype", ""):
        overrides["compute_dtype"] = args.compute_dtype
    if getattr(args, "search_window", 0):
        sw = args.search_window
        # mid pyramid layers search at sw//2 − (_GATHER_TQ−256) (randlanet
        # build_pyramid): sw=512 would make that 0 and crash the Pallas
        # window kernel grid; sw must also keep 512-aligned merged windows
        if sw % 512 or not (1024 <= sw <= 4096):
            raise ValueError(
                f"--search_window {sw} invalid: must be a multiple of 512 "
                f"in [1024, 4096]"
            )
        overrides["search_window"] = sw
    cfg = dataclasses.replace(cfg, **overrides)

    ds_dir = os.path.join(args.data_root, args.dataset)
    data_path = os.path.join(ds_dir, str(args.reg_strength))
    os.makedirs(data_path, exist_ok=True)

    if args.synthetic:
        input_path = os.path.join(
            ds_dir, "input_synth_hard" if synth_hard else "input_synth")
        if not os.path.isdir(input_path) or not os.listdir(input_path):
            os.makedirs(input_path, exist_ok=True)
            train, val = make_dataset(
                num_train=args.synthetic_rooms, num_val=1,
                num_points=args.synthetic_points, hard=synth_hard,
            )
            for c in train + val:
                write_ply(
                    os.path.join(input_path, c.name + ".ply"),
                    [c.xyz, c.colors, c.labels.astype(np.int32)],
                    ["x", "y", "z", "red", "green", "blue", "class"],
                )
        train_clouds = load_clouds(input_path, include="train")
        val_clouds = load_clouds(input_path, include="val")
        cw_name = ""
    else:
        input_path = os.path.join(
            ds_dir, "input_{:.3f}".format(cfg.sub_grid_size)
        )
        val_split = f"Area_{args.test_area}"
        train_clouds = load_clouds(input_path, exclude=val_split)
        val_clouds = load_clouds(input_path, include=val_split)
        cw_name = args.dataset if args.dataset != "semantic3d" else "Semantic3D"

    return Experiment(
        cfg=cfg,
        dataset_name=args.dataset,
        data_path=data_path,
        input_path=input_path,
        train_clouds=train_clouds,
        val_clouds=val_clouds,
        class_weight_name=cw_name,
    )


def experiment_class_weights(exp: Experiment) -> np.ndarray:
    if exp.class_weight_name:
        from ssdr_al_tpu.config import class_weights

        return class_weights(exp.class_weight_name)
    return np.ones(exp.cfg.num_classes, np.float32)


def make_trainer(exp: Experiment, sampler_args, knn_engine="window",
                 num_devices=1):
    """Trainer wired to this experiment's snapshot dir + class weights."""
    from ssdr_al_tpu.train.trainer import Trainer

    mesh = None
    if num_devices > 1:
        from ssdr_al_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(num_devices)
        if exp.cfg.batch_size % num_devices:
            raise ValueError(
                f"batch_size {exp.cfg.batch_size} not divisible by "
                f"{num_devices} devices"
            )
    trainer = Trainer(
        exp.cfg, exp.dataset_name,
        save_dir=exp.save_dir(sampler_args),
        seed_save_dir=exp.save_dir(["seed"]),
        knn_engine=knn_engine,
        mesh=mesh,
    )
    trainer.weights = experiment_class_weights(exp)
    from ssdr_al_tpu.train.trainer import make_train_step

    trainer.train_step = make_train_step(
        trainer.model, exp.cfg, trainer.weights, knn_engine
    )
    return trainer


def make_evaluator(exp: Experiment, mesh=None, **kw):
    """Evaluator over the validation clouds. Full-resolution reprojection
    (val_proj/val_labels from `<cloud>_proj.pkl`) is picked up automatically
    when every val cloud carries it (RandLANet.py:375-419 protocol); `mesh`
    shards the eval batch axis over chips."""
    from ssdr_al_tpu.train.evaluator import Evaluator

    return Evaluator(exp.cfg, exp.val_clouds, mesh=mesh, **kw)


def make_record_file(args, sampler_args, suffix="") -> "os.PathLike":
    from ssdr_al_tpu.active.state import sampler_args_str

    os.makedirs("record_round", exist_ok=True)
    path = os.path.join(
        "record_round",
        f"{args.dataset}_{args.test_area}_{sampler_args_str(sampler_args)}"
        f"_{args.reg_strength}{suffix}.txt",
    )
    return open(path, "a")


def pseudo_gt_for_round(state: ALState, round_dir: str, clouds) -> dict:
    return {c.name: state.load_pseudo_gt(round_dir, c.name) for c in clouds}


def make_training_pipeline(exp: Experiment, pseudo_gt=None, seed=0):
    """Dataset-appropriate training pipeline: Semantic3D uses the
    possibility-scheduled, augmented generator (train2 path,
    SSRD_AL_semantic3d/RandLANet.py:260-331); everything else the random
    spatially-regular sampler."""
    from ssdr_al_tpu.data.dataset import (
        PossibilityTrainingPipeline,
        TrainingPipeline,
    )

    if exp.dataset_name == "semantic3d":
        return PossibilityTrainingPipeline(
            exp.train_clouds, exp.cfg, pseudo_gt=pseudo_gt, seed=seed
        )
    return TrainingPipeline(
        exp.train_clouds, exp.cfg, pseudo_gt=pseudo_gt, seed=seed
    )
