"""Round-2 ablation: attention-core variants of the fused block kernel.

Variants (enc0 TSA shape by default):
  full      — current fused_block kernel inner loop (baseline)
  ones      — denominator from a ones-column in the AV matmul (no VPU sum pass)
  exp2      — exp2 softmax with log2(e) folded into A_h (cheaper transcendental)
  int8qk    — scores matmul int8 (dynamic per-cell scales)
  int8av    — AV matmul int8 (probs scaled to int8, v quantized per cell)
  int8both  — both of the above
  int8ones  — int8 scores+AV with ones-column denominator in the int8 AV

Each variant is value-checked against `full` (max |Δ| on the block output).

    python tools/block_ablation2.py [--shape enc0tsa|enc0fsa] [--iters 8]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfswa_tpu.ops.pallas.fused_block import _bilinear_weights, _erf, _row_block
from tools.bench_block import make_params

LOG2E = 1.4426950408889634


def make_kernel(variant: str, num_heads: int):
    use_exp2 = variant in ("exp2",)
    int8_qk = variant in ("int8qk", "int8both", "int8ones")
    int8_av = variant in ("int8av", "int8both", "int8ones")
    ones_denom = variant in ("ones", "int8ones", "ones_expbf16")
    exp_bf16 = variant in ("ones_expbf16",)
    kv2 = variant in ("kv2",)

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

        if int8_qk:
            # dynamic symmetric per-cell quantization of the LN output
            xmax = jnp.max(jnp.abs(normed.astype(jnp.float32))) + 1e-8
            x8 = jnp.round(normed.astype(jnp.float32) * (127.0 / xmax)
                           ).astype(jnp.int8)

        if int8_av:
            vmax = jnp.max(jnp.abs(v.astype(jnp.float32))) + 1e-8
            v8 = jnp.round(v.astype(jnp.float32) * (127.0 / vmax)
                           ).astype(jnp.int8)
            if ones_denom:
                # lane C carries the denominator: p8 @ [v8 | 127]
                onecol = jnp.full((Rb, N, 1), 127, jnp.int8)
                v8e = jnp.concatenate([v8, onecol], axis=2)  # (Rb, N, C+1)
                lane_e = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C + 1), 2)
        elif ones_denom:
            onecol = jnp.ones((Rb, N, 1), cd)
            ve = jnp.concatenate([v, onecol], axis=2)
            lane_e = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C + 1), 2)

        if kv2:
            # flash-style 2-chunk KV split with ones-column denominators:
            # chunk 2's scores matmul (MXU) is independent of chunk 1's
            # softmax (VPU), exposing overlap; combine is O(N*C).
            NH1 = (N // 2 + 7) // 8 * 8
            onecol = jnp.ones((Rb, N, 1), cd)
            ve = jnp.concatenate([v, onecol], axis=2)      # (Rb, N, C+1)
            lane_e = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C + 1), 2)

            def chunk(t, h, ks, kn):
                xs = normed[:, ks:ks + kn, :]
                s = jax.lax.dot_general(
                    t, xs, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)     # (Rb, N, kn)
                m = jnp.max(s, -1, keepdims=True)
                p = jnp.exp(s - m)
                vs = ve[:, ks:ks + kn, :]
                v_he = jnp.where((lane_e // D == h) | (lane_e == C),
                                 vs, 0).astype(cd)
                oe = jax.lax.dot_general(
                    p.astype(cd), v_he, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)     # (Rb, N, C+1)
                return m, oe

            def head_kv2(h, acc):
                t = jax.lax.dot_general(
                    normed, a_ref[h], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(cd)
                m1, oe1 = chunk(t, h, 0, NH1)
                m2, oe2 = chunk(t, h, NH1, N - NH1)
                m = jnp.maximum(m1, m2)
                w1 = jnp.exp(m1 - m)
                w2 = jnp.exp(m2 - m)
                oe = oe1 * w1 + oe2 * w2
                den = oe[:, :, C:C + 1]
                return acc + oe[:, :, :C] * pl.reciprocal(den, approx=False)

            acc = jax.lax.fori_loop(
                0, H, head_kv2, jnp.zeros((Rb, N, C), jnp.float32))
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
            if int8_qk:
                t = jax.lax.dot_general(
                    normed, a_ref[h], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                tmax = jnp.max(jnp.abs(t)) + 1e-8
                t8 = jnp.round(t * (127.0 / tmax)).astype(jnp.int8)
                s_i32 = jax.lax.dot_general(
                    t8, x8, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32)
                sscale = (tmax * xmax) / (127.0 * 127.0)
                s = s_i32.astype(jnp.float32) * sscale
            else:
                t = jax.lax.dot_general(
                    normed, a_ref[h], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(cd)
                s = jax.lax.dot_general(
                    t, normed, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)

            m = jnp.max(s, -1, keepdims=True)
            if use_exp2:
                p = jnp.exp2((s - m) * LOG2E)
            elif exp_bf16:
                # sub in f32, exp on bf16 lanes (2x VPU element rate); the
                # result feeds the MXU in bf16 anyway
                p = jnp.exp((s - m).astype(jnp.bfloat16))
            else:
                p = jnp.exp(s - m)

            if int8_av:
                p8 = jnp.round(p * 127.0).astype(jnp.int8)
                if ones_denom:
                    m8 = jnp.where((lane_e // D == h) | (lane_e == C),
                                   v8e, 0).astype(jnp.int8)
                    o_i32 = jax.lax.dot_general(
                        p8, m8, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32)
                    # o_true = o_i32[:C] * vmax/127^2 ; denom_true = den/127^2
                    # => o_true/denom_true = o_i32[:C] * vmax / den
                    den = o_i32[:, :, C:C + 1].astype(jnp.float32)
                    o = o_i32[:, :, :C].astype(jnp.float32) * vmax
                    return acc + o * pl.reciprocal(den, approx=False)
                v_h8 = jnp.where(lane // D == h, v8, 0).astype(jnp.int8)
                denom = jnp.sum(p, -1, keepdims=True)
                o_i32 = jax.lax.dot_general(
                    p8, v_h8, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32)
                o = o_i32.astype(jnp.float32) * (vmax / (127.0 * 127.0))
                return acc + o * pl.reciprocal(denom, approx=False)

            if ones_denom:
                v_he = jnp.where((lane_e // D == h) | (lane_e == C),
                                 ve, 0).astype(cd)
                oe = jax.lax.dot_general(
                    p.astype(cd), v_he, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                denom = oe[:, :, C:C + 1]
                return acc + oe[:, :, :C] * pl.reciprocal(denom, approx=False)

            denom = jnp.sum(p, -1, keepdims=True)
            v_h = jnp.where(lane // D == h, v, 0).astype(cd)
            o = jax.lax.dot_general(
                p.astype(cd), v_h, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            return acc + o * pl.reciprocal(denom, approx=False)

        acc = jax.lax.fori_loop(0, H, head, jnp.zeros((Rb, N, C), jnp.float32))
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
    if variant == "exp2":
        a = a * LOG2E
    H = num_heads

    def bcast(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)

    a_dt = jnp.float32 if variant.startswith("int8") else dtype
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
      a.astype(a_dt), wv.astype(dtype), p.proj_kernel.astype(dtype),
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


SHAPES = {
    "enc0tsa": (862, 1025, 32, 8),
    "enc0fsa": (1025, 862, 32, 8),
    "small": (32, 256, 32, 8),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="enc0tsa")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--variants", default="full,ones,exp2,int8qk,int8av,int8ones")
    args = ap.parse_args()
    R, N, C, H = SHAPES[args.shape]
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.standard_normal((R, N, C)), dt)
    p = make_params(C, rng, dt)

    ref = None
    for variant in args.variants.split(","):
        try:
            fn = jax.jit(functools.partial(run, variant, num_heads=H))
            out = fn(rows, p)
            outf = np.asarray(out.astype(jnp.float32))
            if ref is None:
                ref = outf
                err = 0.0
            else:
                err = float(np.max(np.abs(outf - ref)))
            t = timeit(fn, rows, p, args.iters)
            print(f"{args.shape} {variant:10s}: {t*1e3:7.2f} ms   "
                  f"max|Δ| vs full {err:.3e}")
        except Exception as exc:
            print(f"{args.shape} {variant:10s}: FAILED {str(exc)[:200]}")


if __name__ == "__main__":
    main()
