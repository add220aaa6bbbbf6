"""Microbenchmark: fused-block Pallas kernel vs XLA block vs attn-only Pallas.

    python tools/bench_block.py [--dtype bfloat16] [--check]
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

from tfswa_tpu.models.attention import RowBlockParams, row_transformer_block
from tfswa_tpu.ops.pallas.fused_block import _xla_block, fused_row_block

SHAPES = [
    ("enc0 TSA", 862, 1025, 32, 8),
    ("enc0 FSA", 1025, 862, 32, 8),
    ("enc0 SWA", 13932, 64, 32, 8),
    ("enc1 TSA", 431, 512, 64, 8),
    ("enc1 SWA", 3456, 64, 64, 8),
    ("enc2 TSA", 216, 256, 128, 8),
    ("bottleneck TSA", 108, 128, 256, 8),
]


def make_params(C, rng, dtype):
    hid = 4 * C
    def r(*s, scale=0.05):
        return jnp.asarray(rng.standard_normal(s) * scale, dtype)
    return RowBlockParams(
        norm1_scale=jnp.ones((C,), dtype), norm1_bias=jnp.zeros((C,), dtype),
        qkv_kernel=r(C, 3 * C), proj_kernel=r(C, C),
        proj_bias=jnp.zeros((C,), dtype),
        norm2_scale=jnp.ones((C,), dtype), norm2_bias=jnp.zeros((C,), dtype),
        fc1_kernel=r(C, hid), fc1_bias=jnp.zeros((hid,), dtype),
        fc2_kernel=r(hid, C), fc2_bias=jnp.zeros((C,), dtype),
    )


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
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--impls", default="fused,pallas_attn,xla")
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)
    impls = args.impls.split(",")

    print(f"device: {jax.devices()[0]}, dtype {dtype}")
    for label, R, N, C, H in SHAPES:
        rng = np.random.default_rng(0)
        rows = jnp.asarray(rng.standard_normal((R, N, C)), dtype)
        p = make_params(C, rng, dtype)
        line = f"{label:16s} R={R:5d} N={N:4d} C={C:3d}"
        if args.check:
            ref = jax.jit(lambda r, pp: _xla_block(r, pp, H))(rows, p)
            got = jax.jit(lambda r, pp: fused_row_block(r, pp, H))(rows, p)
            err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                        - got.astype(jnp.float32))))
            den = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
            line += f"  max_abs_err {err:.3e} (rel {err/den:.3e})"
        if "fused" in impls:
            try:
                t = timeit(jax.jit(lambda r, pp: fused_row_block(r, pp, H)),
                           rows, p)
                line += f"  fused {t*1e3:8.2f} ms"
            except Exception as exc:
                line += f"  fused FAILED: {str(exc)[:150]}"
        if "pallas_attn" in impls:
            t = timeit(jax.jit(lambda r, pp: row_transformer_block(
                r, pp, H, attention_impl="pallas")), rows, p)
            line += f"  attn-only {t*1e3:8.2f} ms"
        if "xla" in impls:
            t = timeit(jax.jit(lambda r, pp: _xla_block(r, pp, H)), rows, p)
            line += f"  xla {t*1e3:8.2f} ms"
        print(line)


if __name__ == "__main__":
    main()
