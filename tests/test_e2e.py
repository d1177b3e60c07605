"""End-to-end AL loop on synthetic scenes (CPU, tiny config).

Exercises the full stack: partition → seed → AL round (TSampler with
gcn_fps + NAIL) → retraining, with the reference's on-disk round protocol.
"""

import argparse
import os

import numpy as np
import pytest


def make_args(tmp_path, **over):
    base = dict(
        dataset="S3DIS", data_root=os.path.join(str(tmp_path), "data"),
        test_area=5, reg_strength=0.05, synthetic=True, synthetic_rooms=2,
        synthetic_points=3000, num_points=512, max_epoch=2, train_steps=3,
        knn_engine="xla", seed_percent=0.1,
        num_devices=1,
        sampler="T", round=2, rounds=2, classbal=2, edcd=0, gcn=0, gcn_fps=1,
        gcn_number=1, gcn_top=0, uncertainty_mode="WetSU",
        point_uncertainty_mode="sb", oracle_mode="NAIL", threshold=0.9,
        min_size=1, t=0, sp_batch_size=10,
    )
    base.update(over)
    return argparse.Namespace(**base)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    cwd = os.getcwd()
    os.chdir(d)
    yield d
    os.chdir(cwd)


@pytest.mark.e2e
def test_full_al_loop(workdir):
    from ssdr_al_tpu.cli.common import setup_experiment
    from ssdr_al_tpu.cli.seed import run_seed
    from ssdr_al_tpu.cli.al_loop import run_al_loop
    from ssdr_al_tpu.partition.superpoint import compute_superpoints

    args = make_args(workdir)

    # 1. partition
    exp = setup_experiment(args)
    state = exp.make_state([])
    total = compute_superpoints(
        exp.train_clouds, state, args.reg_strength, knn_backend="host",
        k_geof=20, log=lambda *a: None,
    )
    assert total["sp_num"] > 10
    assert os.path.exists(
        os.path.join(exp.data_path, "superpoint", "total.pkl")
    )

    # 2. seed round
    miou, oa = run_seed(args)
    assert 0 <= miou <= 1 and 0 <= oa <= 1
    seed_snap = os.path.join(
        exp.data_path, "saver", "seed", "snapshots", "snap-1"
    )
    assert os.path.exists(seed_snap)

    # 3. one AL round (full SSDR config)
    run_al_loop(args)
    sa = "t0-sb-clsbal-gcn_fps-WetSU-NAIL-0.9-1-1-0"
    round2 = os.path.join(exp.data_path, "sampling", sa, "round_2")
    assert os.path.exists(os.path.join(round2, "total.pkl"))

    # AL invariants across rounds: labeled points grew, unlabeled shrank
    import pickle

    with open(os.path.join(exp.data_path, "superpoint", "total.pkl"), "rb") as f:
        t0 = pickle.load(f)
    with open(os.path.join(round2, "total.pkl"), "rb") as f:
        t2 = pickle.load(f)
    n_unl0 = sum(len(v) for v in t0["unlabeled"].values())
    n_unl2 = sum(len(v) for v in t2["unlabeled"].values())
    assert n_unl2 < n_unl0

    # pseudo-gt activation monotone vs the seed round
    sa_seed_dir = os.path.join(exp.data_path, "sampling", "seed", "round_1")
    for cloud in exp.train_clouds:
        import pickle as pkl

        with open(os.path.join(sa_seed_dir, cloud.name + ".gt"), "rb") as f:
            g1 = np.asarray(pkl.load(f))
        with open(os.path.join(round2, cloud.name + ".gt"), "rb") as f:
            g2 = np.asarray(pkl.load(f))
        assert (g2[0] >= g1[0]).all(), "activation must be monotone"

    # snapshot for round 2 exists
    assert os.path.exists(
        os.path.join(exp.data_path, "saver", sa, "snapshots", "snap-2")
    )


def test_cli_overrides_plumb(tmp_path):
    """--compute_dtype / --search_window reach the Config (cli/common.py)."""
    from ssdr_al_tpu.cli.common import setup_experiment

    args = make_args(tmp_path, compute_dtype="bfloat16", search_window=4096)
    exp = setup_experiment(args)
    assert exp.cfg.compute_dtype == "bfloat16"
    assert exp.cfg.search_window == 4096

    args = make_args(tmp_path)  # defaults untouched
    exp = setup_experiment(args)
    assert exp.cfg.compute_dtype == "float32"
    assert exp.cfg.search_window == 2048

    # --val_steps/--batch_size override the synthetic smoke defaults (8/2):
    # record_round curves need ≥40 eval crops for sub-±0.15 mIoU noise
    args = make_args(tmp_path, val_steps=40, batch_size=4)
    exp = setup_experiment(args)
    assert exp.cfg.val_steps == 40
    assert exp.cfg.batch_size == 4
    exp = setup_experiment(make_args(tmp_path))
    assert (exp.cfg.val_steps, exp.cfg.batch_size) == (8, 2)
