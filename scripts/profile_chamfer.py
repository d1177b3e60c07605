"""Wall-clock A/B of the chamfer distance build: exact VPU broadcast-sub vs
MXU bf16x3 (ops/chamfer.chamfer_pairwise mxu flag), at synthetic shapes up
to the Semantic3D production dispatch (8 blocks x S=1024 x P=512 — the 38 s
phase of the 52 s selection round, STATUS round 4).

Timing per CLAUDE.md platform rules: block_until_ready does not block here,
so each measurement dispatches the full jit and syncs via float(jnp.sum()).
Starts SMALL to smoke-test the DEFAULT-precision K=9 bf16 matmul codegen
before committing the worker to production shapes (the HIGHEST K=3 einsum
faulted the worker on this platform; each fault costs ~40 min).

  PYTHONPATH=/root/.axon_site python scripts/profile_chamfer.py [--full]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def measure(fn, reps=3):
    import jax.numpy as jnp

    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="include the production 8x1024x512 dispatch")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssdr_al_tpu.ops.chamfer import (
        chamfer_pairwise_blocks,
        chamfer_pairwise_blocks_pallas,
        chamfer_supports_pallas,
    )

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)

    shapes = [(2, 64, 128), (8, 256, 512)]
    if args.full:
        shapes.append((8, 1024, 512))

    rng = np.random.RandomState(0)
    for (c, s, p) in shapes:
        pts = (rng.randn(c, s, p, 3) * 0.3).astype(np.float32)
        msk = np.ones((c, s, p), bool)
        msk[:, :, int(p * 0.8):] = False  # ragged tails
        ptsd, mskd = jnp.asarray(pts), jnp.asarray(msk)

        row = {"shape": f"{c}x{s}x{p}"}
        # the XLA mxu form is known 9x SLOWER than exact (min-reductions
        # can't fuse into the matmul producer; measured 3.28 s vs 0.37 s at
        # 8x256x512) — skip it at the production shape, it would burn ~4
        # min of exclusive TPU re-proving a settled negative
        modes = (False,) if (c, s, p) == (8, 1024, 512) else (False, True)
        for mxu in modes:
            # warm (compile) then measure
            out = chamfer_pairwise_blocks(ptsd, mskd, 8, mxu)
            float(jnp.sum(out))
            t = measure(lambda: chamfer_pairwise_blocks(ptsd, mskd, 8, mxu),
                        args.reps)
            row["mxu_s" if mxu else "exact_s"] = round(t, 4)
        if chamfer_supports_pallas(s, p):
            out = chamfer_pairwise_blocks_pallas(ptsd, mskd)
            float(jnp.sum(out))
            t = measure(lambda: chamfer_pairwise_blocks_pallas(ptsd, mskd),
                        args.reps)
            row["pallas_s"] = round(t, 4)
            k = np.asarray(chamfer_pairwise_blocks_pallas(ptsd, mskd))
        # parity spot-check at this shape
        e = np.asarray(chamfer_pairwise_blocks(ptsd, mskd, 8, False))
        off = ~np.eye(s, dtype=bool)[None].repeat(c, 0)
        if "mxu_s" in row:
            m = np.asarray(chamfer_pairwise_blocks(ptsd, mskd, 8, True))
            rel = np.abs(m - e)[off] / np.maximum(e[off], 1e-9)
            row["rel_err_max"] = float(np.round(rel.max(), 7))
            row["speedup"] = round(row["exact_s"] / row["mxu_s"], 2)
        if "pallas_s" in row:
            relk = np.abs(k - e)[off] / np.maximum(e[off], 1e-9)
            row["pallas_rel_err_max"] = float(np.round(relk.max(), 7))
            row["pallas_speedup"] = round(row["exact_s"] / row["pallas_s"], 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
