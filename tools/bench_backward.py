"""Microbenchmark: block backward — Pallas attn_core VJP vs chunked-XLA VJP.

Compares value-and-grad through one row-transformer block at model shapes:
  pallas — fused_row_block (Pallas fwd; backward = XLA LN/MLP + Pallas
           attention backward kernel)
  xla    — _xla_block (lax.map over 16-row chunks with jax.checkpoint, the
           round-1 backward path)

    python tools/bench_backward.py [--iters 4]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tfswa_tpu.ops.pallas.fused_block import (
    _pallas_block, _xla_block, fused_row_block)
from tools.bench_block import make_params

SHAPES = [
    ("enc0 TSA", 862, 1025, 32, 8),
    ("enc0 FSA", 1025, 862, 32, 8),
    ("enc0 SWA", 13932, 64, 32, 8),
    ("enc1 TSA", 431, 512, 64, 8),
]


def timeit(fn, rows, p, iters=4):
    loss, grads = fn(rows, p)
    _ = float(loss) + float(jnp.sum(grads[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    cur = rows
    for _ in range(iters):
        loss, grads = fn(cur, p)
        cur = cur + 1e-3 * grads[0].astype(cur.dtype)   # dependent chain
    _ = float(loss) + float(jnp.sum(cur.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--impls", default="pallas,xla")
    args = ap.parse_args()
    dt = jnp.bfloat16
    print(f"device: {jax.devices()[0]}")
    for label, R, N, C, H in SHAPES:
        rng = np.random.default_rng(0)
        rows = jnp.asarray(rng.standard_normal((R, N, C)), dt)
        p = make_params(C, rng, dt)
        line = f"{label:10s} R={R:5d} N={N:4d} C={C:3d}"

        def loss_pallas(r, pp):
            # _pallas_block directly: Pallas attn_core fwd+bwd regardless of
            # the production shape gate (this bench MEASURES the gate)
            return jnp.sum(_pallas_block(r, pp, H).astype(jnp.float32) ** 2)

        def loss_gated(r, pp):
            return jnp.sum(fused_row_block(r, pp, H).astype(jnp.float32) ** 2)

        def loss_xla(r, pp):
            return jnp.sum(_xla_block(r, pp, H).astype(jnp.float32) ** 2)

        for name, loss in (("pallas", loss_pallas), ("gated", loss_gated),
                           ("xla", loss_xla)):
            if name not in args.impls:
                continue
            try:
                fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
                t = timeit(lambda r, pp: fn(r, pp), rows, p, args.iters)
                line += f"  {name} {t*1e3:8.2f} ms"
            except Exception as exc:
                line += f"  {name} FAILED: {str(exc)[:160]}"
        print(line)


if __name__ == "__main__":
    main()
