"""Merge sampler-ablation trials (JSONL from scripts/ablation.py) into one
seed-averaged markdown table.

    python scripts/ablation_summary.py run_t0.jsonl run_t1.jsonl ... \
        --out ABLATION.md --header "3 rooms x 12000 pts, ..."

Each input holds {"sampler", "round", "miou", ...} records for one trial.
The output table reports mean mIoU per (sampler, round) over trials, the
per-sampler mean of the final three rounds (a noise-robust endpoint), and
the number of trials.
"""

from __future__ import annotations

import argparse
import collections
import json


def load(path):
    recs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            # logs interleave warnings/tracebacks with the JSON records
            # (e.g. a crashed trial's tail) — keep what parses
            if not line.startswith("{"):
                continue
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "sampler" in r and "round" in r and r["sampler"] != "seed":
                recs.append(r)
    return recs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("inputs", nargs="+")
    p.add_argument("--out", required=True,
               help="output markdown path (explicit: ABLATION.md is a\n               curated document — point here only on purpose)")
    p.add_argument("--header", default="")
    args = p.parse_args()

    records = [r for path in args.inputs for r in load(path)]
    by = collections.defaultdict(list)    # (sampler, round) -> [miou]
    samplers, rounds = [], set()
    for r in records:
        key = (r["sampler"], r["round"])
        by[key].append(r["miou"])
        if r["sampler"] not in samplers:
            samplers.append(r["sampler"])
        rounds.add(r["round"])
    rounds = sorted(rounds)
    if not by:
        raise SystemExit(
            f"no ablation records loaded from {args.inputs} — check the "
            f"paths point at ablation.py JSONL logs with 'round' events"
        )
    trials = max(len(v) for v in by.values())

    def mean(xs):
        return sum(xs) / len(xs)

    lines = ["# Sampler ablation (hard synthetic scenes)", ""]
    if args.header:
        lines += [args.header, ""]
    unit = "trial" if trials == 1 else "trials"
    lines += [f"mIoU averaged over **{trials} {unit}** "
              f"(seeds vary sampler + training-pipeline RNG). Cells with "
              f"fewer seeds than the header (partial trials) carry their "
              f"own count as '(n)'.", ""]
    lines.append("| round | " + " | ".join(samplers) + " |")
    lines.append("|---|" + "---|" * len(samplers))

    def cell(s, rd):
        if (s, rd) not in by:
            return "—"
        vals = by[(s, rd)]
        v = f"{mean(vals):.4f}"
        return v if len(vals) == trials else f"{v} ({len(vals)})"

    for rd in rounds:
        lines.append(f"| {rd} | "
                     + " | ".join(cell(s, rd) for s in samplers) + " |")
    # a sampler may have no records in the final window (partial/crashed
    # trial tail): report it as absent instead of dividing by zero
    tail = {}
    for s in samplers:
        vals = [mean(by[(s, rd)]) for rd in rounds[-3:] if (s, rd) in by]
        tail[s] = round(mean(vals), 4) if vals else None
    lines += ["",
              "Final-3-round mean mIoU: " + json.dumps(tail), ""]
    # pseudo-label quality, when the trials recorded it (reuses the
    # records already parsed above — no second file pass)
    pq = collections.defaultdict(list)   # sampler -> [(acc, cov)]
    for r in records:
        if "pseudo_acc" in r:
            pq[r["sampler"]].append((r["pseudo_acc"], r["coverage"]))
    if pq:
        qual = {s: {"pseudo_acc": round(mean([a for a, _ in v]), 4),
                    "final_coverage": round(max(c for _, c in v), 4)}
                for s, v in pq.items()}
        lines += ["Pseudo-label quality (mean accuracy of activated labels, "
                  "max coverage): " + json.dumps(qual), ""]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
