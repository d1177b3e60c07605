"""Observability: phase timers, metrics stream, logging.

The reference's observability is ad-hoc `time.time()` deltas and a TensorBoard
scalar writer (SURVEY.md §5: RandLANet.py:86-103, ssdr_main_S3DIS2.py:140-152).
Here: a context-manager Timer for costTime logging, a JSONL MetricsWriter
(machine-readable replacement for the TensorBoard scalars), and an optional
jax.profiler trace hook for real device profiling.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


def log_out(msg: str, f=None):
    """Append+flush+print (RandLANet.py:13-16)."""
    if f is not None:
        f.write(msg + "\n")
        f.flush()
    print(msg)


class Timer:
    """with Timer() as t: ...; t.seconds — the costTime pattern."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self.start
        return False


class MetricsWriter:
    """Append-only JSONL scalar stream (lr/loss/accuracy/mIoU per step/round),
    the role of the reference's tf.summary.FileWriter (RandLANet.py:100-103)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")

    def write(self, step: int, **scalars):
        rec = {"step": int(step)}
        for k, v in scalars.items():
            rec[k] = float(v)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """Wrap a region in a jax.profiler trace (TPU timeline) when log_dir is
    set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
