"""Ablate the fused block kernel: where does enc0 time go?

Variants: full, no_softmax (p = scores), exp_bf16, no_mlp, attn_only_core.
    python tools/block_ablation.py
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

from tfswa_tpu.ops.pallas.fused_block import (
    _bilinear_weights, _erf, _row_block)
from tools.bench_block import make_params


def make_kernel(variant: str, num_heads: int):
    def kernel(x_ref, ln1s, ln1b, a_ref, wv_ref, wo_ref, ob_ref,
               ln2s, ln2b, fc1_ref, f1b, fc2_ref, f2b, out_ref):
        Rb, N, C = x_ref.shape
        H, D = num_heads, C // num_heads
        cd = x_ref.dtype
        xf = x_ref[:].astype(jnp.float32)
        mean1 = jnp.mean(xf, -1, keepdims=True)
        var1 = jnp.var(xf, -1, keepdims=True)
        n1 = (xf - mean1) * jax.lax.rsqrt(var1 + 1e-5)
        normed = (n1 * ln1s[:].astype(jnp.float32)
                  + ln1b[:].astype(jnp.float32)).astype(cd)
        v = jax.lax.dot_general(normed, wv_ref[:], (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(cd)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)
        normedT = jnp.swapaxes(normed, 1, 2) if variant == "hoistT" else None

        if variant == "avT":
            # Transposed AV: per-head output rows live on SUBLANES (D+1 of 8)
            # instead of lanes (33 of 128), cutting executed AV volume 16x;
            # scores computed pre-transposed (keys on sublanes) so softmax
            # reduces over sublanes and pT feeds the AV matmul directly.
            vT = jnp.swapaxes(v, 1, 2)                     # (Rb, C, N)
            ones_row = jnp.ones((Rb, 1, N), cd)
            accT_parts = []
            for h in range(H):
                t = jax.lax.dot_general(
                    normed, a_ref[h], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(cd)
                sT = jax.lax.dot_general(
                    normed, t, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)    # (Rb, Nm, Nn)
                mx = jnp.max(sT, axis=1, keepdims=True)    # over keys m
                pT = jnp.exp(sT - mx).astype(cd)
                v_hT = jnp.concatenate(
                    [vT[:, h * D:(h + 1) * D, :], ones_row], axis=1
                )                                          # (Rb, D+1, Nm)
                oeT = jax.lax.dot_general(
                    v_hT, pT, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)    # (Rb, D+1, Nn)
                denomT = oeT[:, D:D + 1, :]
                accT_parts.append(
                    oeT[:, :D, :] * pl.reciprocal(denomT, approx=False))
            accT = jnp.concatenate(accT_parts, axis=1)     # (Rb, C, N)
            acc = jnp.swapaxes(accT, 1, 2)                 # (Rb, N, C)
            attn = jax.lax.dot_general(
                acc.astype(cd), wo_ref[:], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + ob_ref[:].astype(jnp.float32)
            y = xf + attn
            mean2 = jnp.mean(y, -1, keepdims=True)
            var2 = jnp.var(y, -1, keepdims=True)
            n2 = (y - mean2) * jax.lax.rsqrt(var2 + 1e-5)
            n2 = n2 * ln2s[:].astype(jnp.float32) + ln2b[:].astype(jnp.float32)
            h1 = jax.lax.dot_general(
                n2.astype(cd), fc1_ref[:], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + f1b[:].astype(jnp.float32)
            h1 = (0.5 * h1 * (1.0 + _erf(h1 * (2.0 ** -0.5)))).astype(cd)
            h2 = jax.lax.dot_general(
                h1, fc2_ref[:], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + f2b[:].astype(jnp.float32)
            out_ref[:] = (y + h2).astype(out_ref.dtype)
            return

        def head(h, acc):
            t = jax.lax.dot_general(
                normed, a_ref[h], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(cd)
            if variant == "hoistT":
                # scores rhs in plain (K, N) layout via one hoisted transpose
                # instead of a per-head implicit transpose of normed
                s = jax.lax.dot_general(
                    t, normedT, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
            else:
                s = jax.lax.dot_general(
                    t, normed, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
            if variant == "no_softmax":
                p = s.astype(cd)
                denom = jnp.ones((Rb, N, 1), jnp.float32)
            elif variant == "exp_bf16":
                m = jnp.max(s, -1, keepdims=True)
                p = jnp.exp((s - m).astype(jnp.bfloat16))
                denom = jnp.sum(p.astype(jnp.float32), -1, keepdims=True)
            elif variant == "no_max":
                p = jnp.exp(s - 20.0)
                denom = jnp.sum(p, -1, keepdims=True)
            else:
                m = jnp.max(s, -1, keepdims=True)
                p = jnp.exp(s - m)
                denom = jnp.sum(p, -1, keepdims=True)
            v_h = jnp.where(lane // D == h, v, 0).astype(cd)
            o = jax.lax.dot_general(
                p.astype(cd), v_h, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            return acc + o * pl.reciprocal(denom, approx=False)

        if variant == "pipelined":
            # software pipeline: score matmul of head h runs in the same
            # iteration as softmax+AV of head h-1, in DISTINCT buffers (the
            # loop carry), so the MXU isn't blocked by a WAR hazard on the
            # score plane while the VPU reduces the previous head.
            def scores_of(h):
                t = jax.lax.dot_general(
                    normed, a_ref[h], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(cd)
                return jax.lax.dot_general(
                    t, normed, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)

            def av_of(h, s):
                m = jnp.max(s, -1, keepdims=True)
                p = jnp.exp(s - m)
                denom = jnp.sum(p, -1, keepdims=True)
                v_h = jnp.where(lane // D == h, v, 0).astype(cd)
                o = jax.lax.dot_general(
                    p.astype(cd), v_h, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                return o * pl.reciprocal(denom, approx=False)

            def pipe_body(h, carry):
                acc, s_prev = carry
                s_cur = scores_of(h)
                acc = acc + av_of(h - 1, s_prev)
                return acc, s_cur

            acc0 = jnp.zeros((Rb, N, C), jnp.float32)
            s0 = scores_of(0)
            acc, s_last = jax.lax.fori_loop(1, H, pipe_body, (acc0, s0))
            acc = acc + av_of(H - 1, s_last)
        else:
            acc = jax.lax.fori_loop(0, H, head,
                                    jnp.zeros((Rb, N, C), jnp.float32))
        attn = jax.lax.dot_general(
            acc.astype(cd), wo_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + ob_ref[:].astype(jnp.float32)
        y = xf + attn
        if variant == "no_mlp":
            out_ref[:] = y.astype(out_ref.dtype)
            return
        mean2 = jnp.mean(y, -1, keepdims=True)
        var2 = jnp.var(y, -1, keepdims=True)
        n2 = (y - mean2) * jax.lax.rsqrt(var2 + 1e-5)
        n2 = n2 * ln2s[:].astype(jnp.float32) + ln2b[:].astype(jnp.float32)
        h1 = jax.lax.dot_general(
            n2.astype(cd), fc1_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + f1b[:].astype(jnp.float32)
        h1 = (0.5 * h1 * (1.0 + _erf(h1 * (2.0 ** -0.5)))).astype(cd)
        h2 = jax.lax.dot_general(
            h1, fc2_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + f2b[:].astype(jnp.float32)
        out_ref[:] = (y + h2).astype(out_ref.dtype)
    return kernel


def run(variant, rows, p, num_heads):
    R, N, C = rows.shape
    dtype = rows.dtype
    hidden = p.fc1_kernel.shape[1]
    Rb = _row_block(N, C, hidden, dtype)
    pad = (-R) % Rb
    padded = jnp.pad(rows, ((0, pad), (0, 0), (0, 0))) if pad else rows
    Rp = padded.shape[0]
    a, wv = _bilinear_weights(p.qkv_kernel, num_heads)
    H = num_heads

    def bcast(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        make_kernel(variant, num_heads),
        grid=(Rp // Rb,),
        in_specs=[
            pl.BlockSpec((Rb, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            bcast((C,)), bcast((C,)), bcast((H, C, C)),
            bcast((C, C)), bcast((C, C)), bcast((C,)),
            bcast((C,)), bcast((C,)),
            bcast((C, hidden)), bcast((hidden,)),
            bcast((hidden, C)), bcast((C,)),
        ],
        out_specs=pl.BlockSpec((Rb, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, N, C), dtype),
    )(padded, p.norm1_scale.astype(dtype), p.norm1_bias.astype(dtype),
      a.astype(dtype), wv.astype(dtype), p.proj_kernel.astype(dtype),
      p.proj_bias.astype(dtype), p.norm2_scale.astype(dtype),
      p.norm2_bias.astype(dtype), p.fc1_kernel.astype(dtype),
      p.fc1_bias.astype(dtype), p.fc2_kernel.astype(dtype),
      p.fc2_bias.astype(dtype))[:R]


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
    for label, R, N, C, H in [("enc0 TSA", 862, 1025, 32, 8),
                              ("enc0 SWA", 13932, 64, 32, 8)]:
        rng = np.random.default_rng(0)
        rows = jnp.asarray(rng.standard_normal((R, N, C)), dt)
        p = make_params(C, rng, dt)
        for variant in ("full", "pipelined"):
            try:
                t = timeit(jax.jit(functools.partial(
                    run, variant, num_heads=H)), rows, p)
                print(f"{label} {variant:12s}: {t*1e3:7.2f} ms")
            except Exception as exc:
                print(f"{label} {variant:12s}: FAILED {str(exc)[:120]}")


if __name__ == "__main__":
    main()
