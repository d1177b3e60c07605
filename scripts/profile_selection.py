"""Profile the AL selection phase at production cloud-count scale.

The reference's sampling pass covers every S3DIS training cloud (~200,
sampler2.py:589-598) with a 10000-click budget (ssdr_main_S3DIS2.py:134).
This script measures one full TSampler selection round (inference + scoring +
gcn_fps diversity + NAIL oracle) at that scale, with per-phase wall-clock,
and optionally the reference's OWN numpy selection path (AST-executed from
/root/reference) on the same clouds/superpoints.

Partition setup uses the O(N) voxel partitioner (data/synthetic.py
grid_superpoints) — partition cost is offline in both systems and excluded.

Usage (repo root):
  PYTHONPATH=/root/.axon_site:. python scripts/profile_selection.py \
      --clouds 200 --points 4096 --budget 10000 [--reference]
Prints one JSON line per measurement.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: workload + reference loaders)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clouds", type=int, default=200)
    p.add_argument("--points", type=int, default=4096)
    p.add_argument("--budget", type=int, default=10000)
    p.add_argument("--target_sp", type=int, default=256)
    p.add_argument("--rounds", type=int, default=1,
                   help="number of measured rounds after the warm round "
                        "(steady-state check: drifting shapes recompile)")
    p.add_argument("--seed_div", type=int, default=20,
                   help="seed labels sp_num/seed_div superpoints")
    p.add_argument("--reference", action="store_true",
                   help="also run the reference numpy selection (slow: "
                        "dense N^2 adjacency + KDTree chamfer, single core)")
    p.add_argument("--reference_only", action="store_true",
                   help="skip our (TPU) round; run ONLY the reference numpy "
                        "selection against the seed-round registry — lets "
                        "the CPU-bound reference measurement run while the "
                        "TPU is busy elsewhere")
    p.add_argument("--keep", action="store_true",
                   help="keep the workload directory")
    args = p.parse_args()

    import jax

    if args.reference_only:
        # CPU-bound measurement: don't grab the TPU (the axon plugin
        # overrides JAX_PLATFORMS at startup — force it back post-import)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from ssdr_al_tpu.active.state import RoundStats

    work = tempfile.mkdtemp(prefix="profile_sel_")
    try:
        t0 = time.perf_counter()
        train, state, total = bench._build_selection_workload(
            work, args.clouds, args.points, fast_partition=True,
            target_sp=args.target_sp, seed_div=args.seed_div,
        )
        setup_s = time.perf_counter() - t0
        print(json.dumps({
            "event": "setup", "clouds": args.clouds, "points": args.points,
            "sp_num": total["sp_num"], "setup_s": round(setup_s, 2),
        }), flush=True)

        if args.reference_only:
            # same labeled/unlabeled split the measured rounds see (the
            # seed round's registry); round_num=3 matches the measured
            # round's (round-1)*1000 anchor cap
            seed_round = os.path.join(work, "sampling", "seed", "round_1")
            ref = bench.measure_reference_selection(
                work, train, state, seed_round, args.budget, round_num=3,
            )
            print(json.dumps({
                "event": "reference_numpy",
                "phases": {k: round(v, 2) for k, v in ref.items()},
                "note": "reference GPU forward + DataLoader + oracle "
                        "credited as free (lower bound)",
            }), flush=True)
            return

        sampler, eval_step, mstate = bench._make_selection_sampler(
            train, state, total)
        t0 = time.perf_counter()
        sampler.sampling(eval_step, mstate, args.budget, 1, RoundStats())
        warm_s = time.perf_counter() - t0
        print(json.dumps({
            "event": "warm_round", "wall_s": round(warm_s, 2),
            "phases": {k: round(v, 2) for k, v in sampler.phase_times.items()},
        }), flush=True)

        for r in range(2, 2 + args.rounds):
            t0 = time.perf_counter()
            stats = RoundStats()
            sampler.sampling(eval_step, mstate, args.budget, r, stats)
            dt = time.perf_counter() - t0
            print(json.dumps({
                "event": "measured_round", "round": r, "wall_s": round(dt, 2),
                "phases": {k: round(v, 2)
                           for k, v in sampler.phase_times.items()},
                "stats": stats.as_dict(),
            }), flush=True)

        if args.reference:
            ref = bench.measure_reference_selection(
                work, train, state, state.round_dir(2), args.budget,
                round_num=3,
            )
            print(json.dumps({
                "event": "reference_numpy",
                "phases": {k: round(v, 2) for k, v in ref.items()},
                "speedup": round(ref["total_s"] / dt, 2),
                "note": "reference GPU forward + DataLoader + oracle "
                        "credited as free (lower bound)",
            }), flush=True)
    finally:
        if args.keep:
            print(json.dumps({"event": "kept", "dir": work}))
        else:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
