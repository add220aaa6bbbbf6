"""Kernel lab 5: where does the rank-D pipelined kernel's time go?

Variants of the production fused-block kernel at the full-resolution
stage shapes (B=4):

  v3      production (import)
  noexp   exp2 replaced by identity — bounds the transcendental cost
  noprob  exp2 AND reciprocal removed — bounds the whole softmax VPU cost
  bitexp  exp2 via Schraudolph bitcast (1 mul + cast) — cheapest possible
          exp approximation, bounds what a fast-exp rewrite could win

    python tools/kernel_lab5.py [--iters 8]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfswa_tpu.ops.pallas._compat import default_interpret
from tfswa_tpu.ops.pallas.fused_block import (
    SCORE_CLAMP, _erf, _row_block, fused_row_block,
)
from tools.kernel_lab import make_params, timeit

SHAPES = [
    ("enc0 TSA B4", 3448, 1025, 32, 8),
    ("enc0 FSA B4", 4100, 862, 32, 8),
]


def _exp_variant(sT, cd, mode):
    if mode == "noexp":
        return jnp.minimum(sT, SCORE_CLAMP).astype(cd)
    if mode == "bitexp":
        t = jnp.clip(sT, -126.0, SCORE_CLAMP)
        bits = (t * (2.0 ** 23) + (127.0 * (2 ** 23) - 486411.0)) \
            .astype(jnp.int32)
        return jax.lax.bitcast_convert_type(bits, jnp.float32).astype(cd)
    return jnp.exp2(jnp.minimum(sT, SCORE_CLAMP)).astype(cd)


def _kernel(
    x_ref, ln1s_ref, ln1b_ref, wq_ref, wk_ref, wv_ref, wo_ref, ob_ref,
    ln2s_ref, ln2b_ref, fc1_ref, f1b_ref, fc2_ref, f2b_ref,
    out_ref, *, num_heads: int, mode: str,
):
    Rb, N, C = x_ref.shape
    H = num_heads
    D = C // H
    cd = x_ref.dtype

    xf = x_ref[:].astype(jnp.float32)
    mean1 = jnp.mean(xf, axis=-1, keepdims=True)
    var1 = jnp.var(xf, axis=-1, keepdims=True)
    n1 = (xf - mean1) * jax.lax.rsqrt(var1 + 1e-5)
    n1 = n1 * ln1s_ref[:].astype(jnp.float32) + ln1b_ref[:].astype(jnp.float32)
    normed = n1.astype(cd)

    q = jax.lax.dot_general(
        normed, wq_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cd)
    k = jax.lax.dot_general(
        normed, wk_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cd)
    v = jax.lax.dot_general(
        normed, wv_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cd)
    vT = jnp.swapaxes(v, 1, 2)
    ones_row = jnp.ones((Rb, 1, N), cd)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Rb, N, C), 2)

    def _scores(h):
        kh = jnp.where((lane >= h * D) & (lane < (h + 1) * D), k, 0) \
            .astype(cd)
        return jax.lax.dot_general(
            kh, q, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    accT_parts = []
    sT = _scores(0)
    for h in range(H):
        sT_next = _scores(h + 1) if h + 1 < H else None
        pT = _exp_variant(sT, cd, mode)
        v_hT = jnp.concatenate(
            [vT[:, h * D:(h + 1) * D, :], ones_row], axis=1)
        oeT = jax.lax.dot_general(
            v_hT, pT, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        denomT = oeT[:, D:D + 1, :]
        if mode == "noprob":
            accT_parts.append(oeT[:, :D, :] + denomT)
        else:
            accT_parts.append(
                oeT[:, :D, :] * pl.reciprocal(denomT, approx=False))
        sT = sT_next
    accT = jnp.concatenate(accT_parts, axis=1)
    acc = jnp.swapaxes(accT, 1, 2)
    attn = jax.lax.dot_general(
        acc.astype(cd), wo_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + ob_ref[:].astype(jnp.float32)

    y = xf + attn
    mean2 = jnp.mean(y, axis=-1, keepdims=True)
    var2 = jnp.var(y, axis=-1, keepdims=True)
    n2 = (y - mean2) * jax.lax.rsqrt(var2 + 1e-5)
    n2 = n2 * ln2s_ref[:].astype(jnp.float32) + ln2b_ref[:].astype(jnp.float32)
    h1 = jax.lax.dot_general(
        n2.astype(cd), fc1_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + f1b_ref[:].astype(jnp.float32)
    h1 = (0.5 * h1 * (1.0 + _erf(h1 * (2.0 ** -0.5)))).astype(cd)
    h2 = jax.lax.dot_general(
        h1, fc2_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + f2b_ref[:].astype(jnp.float32)
    out_ref[:] = (y + h2).astype(out_ref.dtype)


def _call(rows, p, num_heads, mode):
    R, N, C = rows.shape
    dtype = rows.dtype
    hidden = p.fc1_kernel.shape[1]
    D = C // num_heads
    Rb = _row_block(N, C, hidden, dtype)
    pad = (-R) % Rb
    padded = jnp.pad(rows, ((0, pad), (0, 0), (0, 0))) if pad else rows
    Rp = R + pad

    wq = p.qkv_kernel[:, :C].astype(jnp.float32) \
        * ((D ** -0.5) * 1.4426950408889634)
    wk = p.qkv_kernel[:, C:2 * C]
    wv = p.qkv_kernel[:, 2 * C:]

    def bcast(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, mode=mode),
        grid=(Rp // Rb,),
        interpret=default_interpret(),
        in_specs=[
            pl.BlockSpec((Rb, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            bcast((C,)), bcast((C,)),
            bcast((C, C)), bcast((C, C)), bcast((C, C)),
            bcast((C, C)), bcast((C,)),
            bcast((C,)), bcast((C,)),
            bcast((C, hidden)), bcast((hidden,)),
            bcast((hidden, C)), bcast((C,)),
        ],
        out_specs=pl.BlockSpec((Rb, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, N, C), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * N * (num_heads * (C * C + 2 * N * C)
                                + 2 * C * C + 2 * C * 4 * C),
            bytes_accessed=Rp * N * C * 2 * 2,
            transcendentals=Rp * num_heads * N * N,
        ),
    )(
        padded,
        p.norm1_scale.astype(dtype), p.norm1_bias.astype(dtype),
        wq.astype(dtype), wk.astype(dtype), wv.astype(dtype),
        p.proj_kernel.astype(dtype), p.proj_bias.astype(dtype),
        p.norm2_scale.astype(dtype), p.norm2_bias.astype(dtype),
        p.fc1_kernel.astype(dtype), p.fc1_bias.astype(dtype),
        p.fc2_kernel.astype(dtype), p.fc2_bias.astype(dtype),
    )
    return out[:R] if pad else out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    dtype = jnp.bfloat16

    print(f"device: {jax.devices()[0]}")
    # bitexp fidelity probe (f32, small shape)
    rng = np.random.default_rng(1)
    rows = jnp.asarray(rng.standard_normal((8, 256, 32)), jnp.float32)
    p = make_params(32, rng, jnp.float32)
    ref = jax.jit(lambda r, pp: fused_row_block(r, pp, 8))(rows, p)
    got = jax.jit(lambda r, pp: _call(r, pp, 8, "bitexp"))(rows, p)
    err = float(jnp.max(jnp.abs(ref - got)))
    den = float(jnp.max(jnp.abs(ref))) or 1.0
    print(f"bitexp fidelity: max_abs_err {err:.3e} (rel {err/den:.3e})")

    for label, R, N, C, H in SHAPES:
        rng = np.random.default_rng(0)
        rows = jnp.asarray(rng.standard_normal((R, N, C)), dtype)
        p = make_params(C, rng, dtype)
        line = f"{label:12s}"
        t0 = timeit(jax.jit(lambda r, pp: fused_row_block(r, pp, H)),
                    rows, p, iters=args.iters)
        line += f"  v3 {t0*1e3:7.2f}"
        for mode in ("noexp", "noprob", "bitexp"):
            t = timeit(
                jax.jit(lambda r, pp, m=mode: _call(r, pp, H, m)),
                rows, p, iters=args.iters)
            line += f"  {mode} {t*1e3:7.2f}"
        print(line)


if __name__ == "__main__":
    main()
