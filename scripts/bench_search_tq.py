"""Window-search kernel query-tile sweep at the L0 production shape.

Hypothesis test: the kernel's insensitivity to the extraction fold AND to an
MXU distance build (both measured negative) suggests a per-TILE fixed cost
dominates. If ms scales with tile count (TQ=128 2x slower than 256), bigger
tiles win until VMEM caps; if ms/query is TQ-invariant, the kernel is truly
arithmetic-bound and the remaining lever is the window size itself.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_search_tq.py
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from ssdr_al_tpu.ops.knn import _run_window_pallas, morton_codes

    rng = np.random.RandomState(0)
    B, n, w, k = 6, 40960, 3840, 16
    xyz = (rng.rand(B, n, 3) * 10).astype(np.float32)
    xs = []
    for bi in range(B):
        x = xyz[bi]
        codes = np.asarray(morton_codes(
            jnp.asarray(x), jnp.asarray(x.min(0)), jnp.asarray(x.max(0))))
        xs.append(x[np.argsort(codes)])
    xs = jnp.asarray(np.stack(xs))

    for tq in (64, 128, 256, 512):
        starts = jnp.clip(
            (jnp.arange(n // tq, dtype=jnp.int32) * tq + tq // 2 - w // 2)
            // 128 * 128, 0, n - w)
        starts_b = jnp.broadcast_to(starts, (B, n // tq))

        @jax.jit
        def chain(x, st, tq=tq):
            def body(a, _):
                out = jax.vmap(
                    lambda xi, s: _run_window_pallas(
                        xi, xi + a * 1e-30, s, k, tq, w)
                )(x, st)
                return a + jnp.sum(out).astype(jnp.float32) * 1e-30, ()
            a, _ = jax.lax.scan(body, jnp.float32(0), None, length=10)
            return a

        try:
            float(chain(xs, starts_b))
            t0 = time.perf_counter()
            float(chain(xs, starts_b))
            dt = (time.perf_counter() - t0) / 10 * 1e3
            print(json.dumps({"tq": tq, "ms": round(dt, 2),
                              "tiles": B * n // tq}), flush=True)
        except Exception as e:  # VMEM OOM at big TQ is an expected outcome
            print(json.dumps({"tq": tq, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
