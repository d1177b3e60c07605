"""chunk_batch sweep for the selection prediction phase.

InferenceRunner groups `chunk_batch` fixed-size cloud chunks into one device
call; at 200-cloud scale the prediction phase is dispatch/host-bound, so
bigger groups mean fewer dispatches but a bigger per-call compile shape and
more padding waste on stragglers. This sweeps cb on the bench's 200-cloud
selection workload and reports the prediction-phase wall per setting.

    PYTHONPATH=/root/.axon_site:. python scripts/bench_chunk_batch.py
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from ssdr_al_tpu.active import samplers as S
    from ssdr_al_tpu.active.state import RoundStats

    work = tempfile.mkdtemp(prefix="bench_cb_")
    try:
        train, state, total = bench._build_selection_workload(
            work, 200, 4096, fast_partition=True, target_sp=256)
        sampler, eval_step, mstate = bench._make_selection_sampler(
            train, state, total)
        orig_init = S.InferenceRunner.__init__
        rnd = 1
        for cb in (8, 16, 32):
            def patched(self, cfg, clouds, es, st, mode, seed=0,
                        chunk_batch=8, mesh=None, _cb=cb):
                orig_init(self, cfg, clouds, es, st, mode, seed=seed,
                          chunk_batch=_cb, mesh=mesh)
            S.InferenceRunner.__init__ = patched
            # warm (compile at this group shape), then measure
            sampler.sampling(eval_step, mstate, 2000, rnd, RoundStats())
            rnd += 1
            t0 = time.perf_counter()
            sampler.sampling(eval_step, mstate, 2000, rnd, RoundStats())
            rnd += 1
            dt = time.perf_counter() - t0
            print(json.dumps({"chunk_batch": cb, "round_s": round(dt, 2),
                              "phases": {k: round(v, 2) for k, v in
                                         sampler.phase_times.items()}}),
                  flush=True)
        S.InferenceRunner.__init__ = orig_init
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
