"""Window-search kernel: VPU broadcast-subtraction vs MXU matmul distance
build, at the model's production shapes (L0 n=40960 W=3840, L1 n=10240
W=1792, upsample k=1 W=1024). Reports per-search ms and exact-KNN recall for
both variants (TPU only).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_knn_mxu.py
"""
from __future__ import annotations

import json
import time

import numpy as np


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from ssdr_al_tpu.ops.knn import (
        _run_window_pallas,
        knn_xla,
        morton_codes,
    )

    rng = np.random.RandomState(0)
    B = 6

    for n, w, k in [(40960, 3840, 16), (10240, 1792, 16), (40960, 1024, 1)]:
        xyz = (rng.rand(B, n, 3) * 10).astype(np.float32)
        # morton-sort each cloud (the engine's operating regime)
        xs = []
        for bi in range(B):
            x = xyz[bi]
            lo, hi = x.min(0), x.max(0)
            codes = np.asarray(morton_codes(jnp.asarray(x), jnp.asarray(lo),
                                            jnp.asarray(hi)))
            xs.append(x[np.argsort(codes)])
        xs = jnp.asarray(np.stack(xs))
        tq = 256
        starts = jnp.clip(
            (jnp.arange(n // tq, dtype=jnp.int32) * tq + tq // 2 - w // 2)
            // 128 * 128, 0, n - w)
        starts_b = jnp.broadcast_to(starts, (B, n // tq))

        res = {}
        for mxu in (False, True):
            def run(x, acc, mxu=mxu):
                return jax.vmap(
                    lambda xi, st: _run_window_pallas(
                        xi, xi + acc * 1e-30, st, k, tq, w, mxu=mxu)
                )(x, starts_b)

            @jax.jit
            def chain(x, iters=10, mxu=mxu):
                def body(a, _):
                    out = run(x, a)
                    return a + jnp.sum(out).astype(jnp.float32) * 1e-30, ()
                a, _ = jax.lax.scan(body, jnp.float32(0), None, length=10)
                return a

            float(chain(xs))
            t0 = time.perf_counter()
            float(chain(xs))
            dt = (time.perf_counter() - t0) / 10 * 1e3
            rel = np.asarray(run(xs, jnp.float32(0)))
            idx = np.asarray(starts)[None, :, None].repeat(B, 0)
            idx = np.repeat(idx, tq, 1) + rel
            res[("mxu" if mxu else "vpu")] = (dt, idx)

        exact = np.asarray(jax.vmap(lambda x: knn_xla(x, x, k))(xs))
        out = {"n": n, "w": w, "k": k}
        for tag, (dt, idx) in res.items():
            hits = sum(
                len(np.intersect1d(idx[b, i], exact[b, i]))
                for b in range(2) for i in range(0, n, 149))
            denom = 2 * len(range(0, n, 149)) * k
            out[f"{tag}_ms"] = round(dt, 3)
            out[f"{tag}_recall"] = round(hits / denom, 4)
        # agreement between the two variants (same windows -> should be ~all)
        a, bidx = res["vpu"][1], res["mxu"][1]
        agree = np.mean([
            len(np.intersect1d(a[b, i], bidx[b, i])) / k
            for b in range(2) for i in range(0, n, 149)])
        out["variant_agreement"] = round(float(agree), 4)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
