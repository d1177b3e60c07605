"""Measure the windowed-gather kernel vs XLA's row gather at call-site shapes.

The shared kernel-vs-XLA crossover KERNEL_MAX_WC (ops/gather.py) is an
empirical constant: the one-hot kernel pays ~W·C_pad·2 MXU FLOP per gathered
row while XLA's gather pays a flat ~12 ns/row on this platform. Re-run this
after kernel changes to re-derive it:

    PYTHONPATH=/root/.axon_site:. python scripts/bench_gather.py

Shapes cover the model's gather call sites (reference analogue: the CPU
tf.batch_gather + tf_map loop, SSDR_AL_s3dis/RandLANet.py:561-570,
s3dis_dataset.py:156-183). Measured 2026-08-17 (v5e chip, matmul-extraction
epilogue): LFA L0 (66k) kernel 8.35 vs XLA 14.5 ms; pool L1 (557k) kernel
6.03 vs XLA 6.52 ms — crossover ~560k. Semantic3D's C_pad=160 LFA (655k)
VMEM-OOMs the TQ=512 kernel and stays on XLA.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from ssdr_al_tpu.ops.gather import (  # noqa: E402
    _gather_window_impl, pad_channels, tile_min_starts,
)


def _timeit(f, *args, reps=10):
    @jax.jit
    def chain(*a):
        def body(c, _):
            o = f(*a)
            return c + o.reshape(-1)[0] * 1e-12, ()
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return out
    float(chain(*args))  # compile
    t0 = time.perf_counter()
    float(chain(*args))
    return (time.perf_counter() - t0) / reps * 1e3


def _xla_gather(pc, idx):
    b, m, k = idx.shape
    flat = idx.reshape(b, m * k)
    return jnp.take_along_axis(pc, flat[..., None], axis=1).reshape(
        b, m, k, pc.shape[-1])


def windowed_indices(rng, b, n, nq, k, window):
    """Random neighbor indices satisfying the per-tile window invariant."""
    stride = n // nq
    # constant start per 512-query tile so a tile's index spread is exactly
    # `window` and tile_min_starts never clamps
    tile_center = ((np.arange(nq) // 512) * 512 + 256) * stride
    s = np.clip(tile_center - window // 2, 0, n - window)
    idx = np.empty((b, nq, k), np.int64)
    for bi in range(b):
        idx[bi] = s[:, None] + rng.randint(0, window, (nq, k))
    return np.clip(idx, 0, n - 1).astype(np.int32)


def main():
    rng = np.random.RandomState(0)
    # (tag, B, N, Nq, k, C, W): model call sites, S3DIS + Semantic3D
    shapes = [
        ("LFA L0 S3DIS ", 6, 40960, 40960, 16, 16, 4096),
        ("pool L0 S3DIS", 6, 40960, 10240, 16, 32, 6400),
        ("pool L1 S3DIS", 6, 10240, 2560, 16, 128, 4352),
        ("LFA L1 S3DIS ", 6, 10240, 10240, 16, 48, 2048),
    ]
    tq = 512
    for tag, b, n, nq, k, c, w in shapes:
        vals = jnp.asarray(rng.rand(b, n, c).astype(np.float32))
        idx = jnp.asarray(windowed_indices(rng, b, n, nq, k, w))
        vp, _ = pad_channels(vals, k=k)
        wal = ((w + 127) // 128) * 128
        starts = tile_min_starts(idx, n, wal, tq)
        wc = wal * vp.shape[-1]
        try:
            t_k = _timeit(
                lambda v, i, s: _gather_window_impl(v, i, s, wal, tq),
                vp, idx, starts)
        except Exception as e:  # VMEM OOM etc.
            t_k = float("nan")
            print(f"{tag}: kernel failed ({type(e).__name__})")
        t_x = _timeit(_xla_gather, vals, idx)
        win = "kernel" if t_k == t_k and t_k < t_x else "xla"
        print(f"{tag}: W*Cpad={wc/1e3:6.0f}k  kernel {t_k:6.2f} ms  "
              f"xla {t_x:6.2f} ms  -> {win}")


if __name__ == "__main__":
    main()
