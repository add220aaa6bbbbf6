"""Ablate the row-attention kernel to locate its bottleneck on TPU.

Variants: full, no-softmax (raw scores), bf16-softmax, qkv-only.
    python tools/kernel_ablation.py
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


def make_kernel(variant: str, num_heads: int):
    def kernel(x_ref, wqkv_ref, wproj_ref, bias_ref, out_ref):
        Rb, N, C = x_ref.shape
        H, D = num_heads, C // num_heads
        dt = x_ref.dtype
        x2 = x_ref[:].reshape(Rb * N, C)
        qkv = jnp.dot(x2, wqkv_ref[:], preferred_element_type=jnp.float32)
        qkv = qkv.astype(dt).reshape(Rb, N, 3 * C)
        if variant == "qkv_only":
            out_ref[:] = qkv[:, :, :C]
            return
        outs = []
        for h in range(H):
            q = qkv[:, :, h * D:(h + 1) * D]
            k = qkv[:, :, C + h * D:C + (h + 1) * D]
            v = qkv[:, :, 2 * C + h * D:2 * C + (h + 1) * D]
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * (D ** -0.5)
            if variant == "scores_bf16":
                s = s.astype(jnp.bfloat16)
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
                p = (e.astype(jnp.float32) / denom).astype(dt)
            elif variant == "full":
                p = jax.nn.softmax(s, axis=-1).astype(dt)
            elif variant == "softmax_bf16":
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp((s - m).astype(jnp.bfloat16))
                denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
                p = (e / denom.astype(jnp.bfloat16)).astype(dt)
            elif variant == "no_softmax":
                p = s.astype(dt)
            outs.append(jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32))
        merged = jnp.concatenate([o.astype(dt) for o in outs], -1)
        out = jnp.dot(merged.reshape(Rb * N, C), wproj_ref[:],
                      preferred_element_type=jnp.float32)
        out_ref[:] = (out + bias_ref[:].astype(jnp.float32)).reshape(
            Rb, N, C).astype(out_ref.dtype)
    return kernel


def run(variant, rows, wq, wp, b, num_heads, Rb):
    R, N, C = rows.shape
    pad = (-R) % Rb
    padded = jnp.pad(rows, ((0, pad), (0, 0), (0, 0))) if pad else rows
    Rp = padded.shape[0]
    return pl.pallas_call(
        make_kernel(variant, num_heads),
        grid=(Rp // Rb,),
        in_specs=[
            pl.BlockSpec((Rb, N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Rb, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, N, C), rows.dtype),
    )(padded, wq, wp, b)[:R]


def timeit(fn, rows, *args, iters=8):
    out = fn(rows, *args)
    _ = float(jnp.sum(jnp.abs(out)))
    t0 = time.perf_counter()
    cur = rows
    for _ in range(iters):
        cur = fn(cur, *args)
    _ = float(jnp.sum(jnp.abs(cur)))
    return (time.perf_counter() - t0) / iters


def main():
    R, N, C, H = 862, 1025, 32, 8
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    rows = jnp.asarray(rng.standard_normal((R, N, C)), dt)
    wq = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.05, dt)
    wp = jnp.asarray(rng.standard_normal((C, C)) * 0.05, dt)
    b = jnp.zeros((C,), dt)
    for Rb in (1,):
        for variant in ("qkv_only", "no_softmax", "scores_bf16", "full"):
            try:
                t = timeit(
                    jax.jit(functools.partial(run, variant, num_heads=H, Rb=Rb)),
                    rows, wq, wp, b)
                print(f"Rb={Rb} {variant:13s}: {t*1e3:7.2f} ms")
            except Exception as exc:
                print(f"Rb={Rb} {variant:13s}: FAILED {str(exc)[:100]}")


if __name__ == "__main__":
    main()

