"""Microbenchmark: chunked-XLA vs Pallas flash row attention on TPU.

Representative shapes from the flagship model separating one 10 s segment
(B=1, spectrogram 1025x862): rows x N x C per stage/attention type.

    python tools/bench_attention.py [--dtype bfloat16]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tfswa_tpu.models.attention import mha_rows
from tfswa_tpu.ops.pallas.row_attention import flash_row_attention

SHAPES = [
    # (label, R, N, C, H)
    ("enc0 TSA", 862, 1025, 32, 8),
    ("enc0 FSA", 1025, 862, 32, 8),
    ("enc0 SWA", 13932, 64, 32, 8),
    ("enc1 TSA", 431, 512, 64, 8),
    ("enc1 SWA", 3456, 64, 64, 8),
    ("enc2 TSA", 216, 256, 128, 8),
    ("bottleneck TSA", 108, 128, 256, 8),
]


def xla_chunked(rows, wq, wp, b, H, chunk=16):
    R = rows.shape[0]
    pad = (-R) % chunk
    padded = jnp.pad(rows, ((0, pad), (0, 0), (0, 0)))
    chunks = padded.reshape(-1, chunk, *padded.shape[1:])
    out = jax.lax.map(lambda c: mha_rows(c, wq, wp, b, H), chunks)
    return out.reshape(-1, *padded.shape[1:])[:R]


def timeit(fn, rows, *args, iters=8):
    """Chain each iteration's output into the next input and fetch a scalar
    at the end — robust against async dispatch that ignores
    block_until_ready (the tunnelled runtime here does)."""
    out = fn(rows, *args)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    cur = rows
    for _ in range(iters):
        cur = fn(cur, *args)
    _ = float(jnp.sum(cur))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--impls", default="xla,pallas")
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)
    impls = args.impls.split(",")

    print(f"device: {jax.devices()[0]}, dtype {dtype}")
    for label, R, N, C, H in SHAPES:
        rng = np.random.default_rng(0)
        rows = jnp.asarray(rng.standard_normal((R, N, C)), dtype)
        wq = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.05, dtype)
        wp = jnp.asarray(rng.standard_normal((C, C)) * 0.05, dtype)
        b = jnp.zeros((C,), dtype)

        flops = 2 * R * N * (3 * C * C + C * C) + 4 * R * H * N * N * (C // H)
        line = f"{label:16s} R={R:5d} N={N:4d} C={C:3d}"
        if "xla" in impls:
            t_x = timeit(jax.jit(lambda r, q, p, bb: xla_chunked(r, q, p, bb, H)),
                         rows, wq, wp, b)
            line += f"  xla {t_x*1e3:8.2f} ms ({flops/t_x/1e12:5.1f} TF/s)"
        if "pallas" in impls:
            try:
                t_p = timeit(
                    jax.jit(lambda r, q, p, bb: flash_row_attention(r, q, p, bb, H)),
                    rows, wq, wp, b)
                line += f"  pallas {t_p*1e3:8.2f} ms ({flops/t_p/1e12:5.1f} TF/s)"
            except Exception as exc:
                line += f"  pallas FAILED: {str(exc)[:120]}"
        print(line)


if __name__ == "__main__":
    main()
