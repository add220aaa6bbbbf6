"""Kernel lab 2: raw MXU/VPU cost model probes on the real chip.

Questions:
  1. Does a K=32 contraction cost the same as K=128 (pad-to-128 granule)?
  2. What does exp2 on an (N, N) f32 plane cost (VPU share of the block)?
  3. Does one (8M, K)@(K, N) matmul beat 8 separate (M, K)@(K, N)?

    python tools/kernel_lab2.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CELLS = 256


def _time(fn, *args, iters=4):
    out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def _run(kernel, x, w, out_shape):
    N, C = x.shape[1], x.shape[2]
    return pl.pallas_call(
        kernel,
        grid=(CELLS,),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1,) + out_shape, lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CELLS,) + out_shape, x.dtype),
    )(x, w)


def k_matmul_8thin(x_ref, w_ref, o_ref):
    """8 separate (N, 32)@(32, N) dots (per-head score pattern)."""
    x = x_ref[0]                               # (N, 32)
    acc = None
    for h in range(8):
        s = jax.lax.dot_general(
            x, w_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (N, N)
        acc = s if acc is None else acc + s
    o_ref[0] = acc.astype(o_ref.dtype)


def k_matmul_2dense(x_ref, w_ref, o_ref):
    """2 dense (N, 128)@(128, N) dots -- same executed volume if K pads."""
    x = x_ref[0]                               # (N, 128)
    acc = None
    for g in range(2):
        s = jax.lax.dot_general(
            x, w_ref[g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = s if acc is None else acc + s
    o_ref[0] = acc.astype(o_ref.dtype)


def k_exp2(x_ref, w_ref, o_ref):
    """8 exp2 passes over an (N, N) f32 plane (softmax VPU pattern)."""
    x = x_ref[0]
    s = jax.lax.dot_general(
        x, w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = None
    for _ in range(8):
        p = jnp.exp2(s)
        acc = p if acc is None else acc + p
        s = s + 1.0
    o_ref[0] = acc.astype(o_ref.dtype)


def k_exp2_clamp(x_ref, w_ref, o_ref):
    x = x_ref[0]
    s = jax.lax.dot_general(
        x, w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = None
    for _ in range(8):
        p = jnp.exp2(jnp.minimum(s, 110.0))
        acc = p if acc is None else acc + p
        s = s + 1.0
    o_ref[0] = acc.astype(o_ref.dtype)


def k_control(x_ref, w_ref, o_ref):
    """1 matmul only (baseline for the deltas)."""
    x = x_ref[0]
    s = jax.lax.dot_general(
        x, w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = s.astype(o_ref.dtype)


def main():
    N = 1024
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}  cells={CELLS}  N={N}")

    x32 = jnp.asarray(rng.standard_normal((CELLS, N, 32)) * 0.3, dtype)
    x128 = jnp.asarray(rng.standard_normal((CELLS, N, 128)) * 0.1, dtype)
    w8 = jnp.asarray(rng.standard_normal((8, 32, N)) * 0.05, dtype)
    w2 = jnp.asarray(rng.standard_normal((2, 128, N)) * 0.05, dtype)
    w1_32 = w8[:1]

    t = _time(jax.jit(lambda x, w: _run(k_control, x, w, (N, N))), x32, w1_32)
    print(f"control 1x(N,32)@(32,N):      {t*1e3:7.2f} ms "
          f"({t/CELLS*1e6:6.1f} us/cell)")
    base = t

    t = _time(jax.jit(lambda x, w: _run(k_matmul_8thin, x, w, (N, N))),
              x32, w8)
    print(f"8x thin (N,32)@(32,N):        {t*1e3:7.2f} ms "
          f"({t/CELLS*1e6:6.1f} us/cell)  marginal/mm "
          f"{(t-base)/CELLS/7*1e6:5.1f} us")

    t = _time(jax.jit(lambda x, w: _run(k_matmul_2dense, x, w, (N, N))),
              x128, w2)
    print(f"2x dense (N,128)@(128,N):     {t*1e3:7.2f} ms "
          f"({t/CELLS*1e6:6.1f} us/cell)")

    t = _time(jax.jit(lambda x, w: _run(k_exp2, x, w, (N, N))), x32, w1_32)
    print(f"1 mm + 8x exp2(N,N):          {t*1e3:7.2f} ms "
          f"({t/CELLS*1e6:6.1f} us/cell)  marginal/exp2 "
          f"{(t-base)/CELLS/8*1e6:5.1f} us")
    e = t

    t = _time(jax.jit(lambda x, w: _run(k_exp2_clamp, x, w, (N, N))),
              x32, w1_32)
    print(f"1 mm + 8x clamp+exp2(N,N):    {t*1e3:7.2f} ms "
          f"({t/CELLS*1e6:6.1f} us/cell)  clamp adds "
          f"{(t-e)/CELLS/8*1e6:5.1f} us/plane")


if __name__ == "__main__":
    main()
