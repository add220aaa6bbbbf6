"""Probe per-grid-cell overhead: time fused block vs forced Rb.

    python tools/rb_probe.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import tfswa_tpu.ops.pallas.fused_block as fb
from tools.bench_block import make_params


def timeit(fn, rows, p, iters=8):
    out = fn(rows, p)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    cur = rows
    for _ in range(iters):
        cur = fn(cur, p)
    _ = float(jnp.sum(cur.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    dt = jnp.bfloat16
    cases = [
        ("enc2 TSA", 216, 256, 128, 8, [1, 2, 4, 8]),
        ("enc0 SWA", 13932, 64, 32, 8, [8, 16, 32, 64, 128]),
        ("bottleneck", 108, 128, 256, 8, [1, 2, 4, 8]),
    ]
    orig = fb._row_block
    for label, R, N, C, H, rbs in cases:
        rng = np.random.default_rng(0)
        rows = jnp.asarray(rng.standard_normal((R, N, C)), dt)
        p = make_params(C, rng, dt)
        for rb in rbs:
            fb._row_block = lambda *a, **k: rb
            try:
                t = timeit(jax.jit(lambda r, pp: fb._fused_block_impl(
                    r, pp, H)), rows, p)
                print(f"{label:12s} Rb={rb:3d}: {t*1e3:7.2f} ms "
                      f"(cells={-(-R // rb)})")
            except Exception as exc:
                print(f"{label:12s} Rb={rb:3d}: FAILED {str(exc)[:100]}")
        fb._row_block = orig


if __name__ == "__main__":
    main()
