"""Regression tests for the ablation tooling scripts.

These scripts aggregate multi-seed AL runs (scripts/ablation.py JSONL) into
the curated ABLATION.md tables; a crashed or deadline-truncated trial must
degrade to an honest partial summary, not a traceback (the reference's own
sweep scripts restart per-config, run_sota_comparison.sh:9-14).
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run_summary(tmp_path, records, name="trial.jsonl"):
    src = tmp_path / name
    src.write_text("\n".join(json.dumps(r) for r in records) + "\n")
    out = tmp_path / "out.md"
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "ablation_summary.py"),
         str(src), "--out", str(out)],
        capture_output=True, text=True, cwd=str(REPO),
    )
    return proc, out


def test_summary_merges_means(tmp_path):
    recs = [
        {"sampler": "random", "round": 2, "miou": 0.2},
        {"sampler": "random", "round": 3, "miou": 0.4},
        {"sampler": "ssdr_full", "round": 2, "miou": 0.3},
        {"sampler": "ssdr_full", "round": 3, "miou": 0.5},
        # seed records are excluded from the table
        {"sampler": "seed", "round": 1, "miou": 0.1},
    ]
    proc, out = _run_summary(tmp_path, recs)
    assert proc.returncode == 0, proc.stderr
    text = out.read_text()
    assert "0.2000" in text and "0.5000" in text
    header_row = next(l for l in text.splitlines() if l.startswith("| round"))
    assert "seed" not in header_row


def test_summary_partial_trial_tail_is_null_not_crash(tmp_path):
    """A sampler whose trial died before the final rounds (e.g. a
    deadline-truncated config) must show null in the final-3 mean, not
    ZeroDivisionError (hit by results/ablation_hifi_t2.jsonl's sb_mean)."""
    recs = [
        {"sampler": "random", "round": r, "miou": 0.1 * r}
        for r in range(2, 8)
    ] + [
        {"sampler": "sb_mean", "round": 2, "miou": 0.15},
        {"sampler": "sb_mean", "round": 3, "miou": 0.25},
    ]
    proc, out = _run_summary(tmp_path, recs)
    assert proc.returncode == 0, proc.stderr
    text = out.read_text()
    assert '"sb_mean": null' in text
    # rows without records render as an em-dash placeholder
    assert "—" in text


def test_summary_empty_input_fails_loudly(tmp_path):
    proc, _ = _run_summary(tmp_path, [{"event": "setup"}])
    assert proc.returncode != 0
    assert "no ablation records" in proc.stderr
