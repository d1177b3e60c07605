"""Space-filling-curve A/B for the window KNN engine: morton vs hilbert.

The window engine prunes the KNN search to a rank-window along a
space-filling curve (ops/knn.py). The Hilbert curve has strictly better
locality than z-order (consecutive codes are L1-adjacent cells — no octant
jumps), so the same window should catch more true neighbors; the payoff is
either higher recall free, or an equal recall at a SMALLER window — and the
L0 search + every windowed gather scale ~linearly with the window.

Measures, per curve:
  - recall vs window on the production recall-gate data (uniform 40960 block,
    same as bench.py::measure_window_recall) and on a clustered make_room
    scene (the harder case for z-order),
  - (TPU) the L0 window-search wall-clock at the model shape per window, so
    recall-per-millisecond can be compared across curves.

Usage:
  PYTHONPATH=/root/.axon_site python scripts/bench_curve.py            # recall (any backend)
  PYTHONPATH=/root/.axon_site python scripts/bench_curve.py --time     # + TPU timing
"""

import argparse
import json
import time

import numpy as np

WINDOWS = (1024, 2048, 3072, 3840, 4096)


def _recall_table(xyz, k, windows, curves, probes=1):
    import jax.numpy as jnp

    from ssdr_al_tpu.ops.knn import knn, knn_window

    n = xyz.shape[1]
    x = jnp.asarray(xyz)
    idx_e = np.asarray(knn(x, x, k, engine="xla"))[0]
    rows = range(0, n, 37)

    def recall(idx_w):
        hits = sum(len(np.intersect1d(idx_w[i], idx_e[i])) for i in rows)
        return hits / (len(rows) * k)

    out = {}
    for curve in curves:
        for w in windows:
            idx = np.asarray(
                knn_window(x, x, k, window=w, curve=curve, probes=probes))[0]
            out[(curve, w)] = recall(idx)
    return out


def _time_search(n, k, window, curve, reps=20):
    """Time the sorted-space L0 window search (the model's hot search) on
    the current backend; chains reps in one jit and syncs once
    (CLAUDE.md timing discipline)."""
    import jax
    import jax.numpy as jnp

    from ssdr_al_tpu.ops.knn import knn_window_sorted_raw, sort_cloud

    rng = np.random.RandomState(0)
    xyz = jnp.asarray((rng.rand(n, 3) * 10).astype(np.float32))
    lo, hi = jnp.min(xyz, 0), jnp.max(xyz, 0)

    @jax.jit
    def chain(x):
        def body(acc, _):
            sc = sort_cloud(x + acc * 0, lo, hi, curve=curve)
            idx, _ = knn_window_sorted_raw(sc, sc, k, window=window,
                                           self_query=True)
            return jnp.float32(jnp.sum(idx)) * 1e-12, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return acc

    float(chain(xyz))  # compile
    t0 = time.perf_counter()
    r = chain(xyz)
    float(r)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=40960)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--windows", default=",".join(map(str, WINDOWS)))
    ap.add_argument("--probes", type=int, default=1)
    ap.add_argument("--time", action="store_true",
                    help="also time the sorted window search per window "
                         "(run on TPU)")
    ap.add_argument("--skip-recall", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    windows = [int(w) for w in args.windows.split(",")]
    curves = ("morton", "hilbert")

    rng = np.random.RandomState(0)
    uniform = (rng.rand(1, args.n, 3) * 10).astype(np.float32)

    from ssdr_al_tpu.data.synthetic import make_room
    room = make_room(np.random.RandomState(1), "r", num_points=args.n)
    scene = room.xyz[None]

    results = {"n": args.n, "k": args.k, "probes": args.probes}
    datasets = () if args.skip_recall else (("uniform", uniform),
                                            ("scene", scene))
    for name, data in datasets:
        tab = _recall_table(data, args.k, windows, curves, args.probes)
        print(f"\n== recall on {name} (n={args.n}, k={args.k}, "
              f"probes={args.probes}) ==")
        print(f"{'window':>8} | {'morton':>8} | {'hilbert':>8} | delta")
        for w in windows:
            m, h = tab[("morton", w)], tab[("hilbert", w)]
            print(f"{w:>8} | {m:>8.4f} | {h:>8.4f} | {h - m:+.4f}")
            results[f"recall_{name}_w{w}_morton"] = round(m, 4)
            results[f"recall_{name}_w{w}_hilbert"] = round(h, 4)

    if args.time:
        print(f"\n== sorted window-search ms (n={args.n}) ==")
        print(f"{'window':>8} | {'morton':>8} | {'hilbert':>8}")
        for w in windows:
            tm = _time_search(args.n, args.k, w, "morton")
            th = _time_search(args.n, args.k, w, "hilbert")
            print(f"{w:>8} | {tm:>8.2f} | {th:>8.2f}")
            results[f"search_ms_w{w}_morton"] = round(tm, 2)
            results[f"search_ms_w{w}_hilbert"] = round(th, 2)

    print()
    line = json.dumps(results)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
