"""Kernel lab 3: packed-heads core for small N + true B=4 stage costs.

For N <= 256 all H heads' transposed score planes fit VMEM at once
((H*N, N) f32), so scores can be ONE block-diagonal matmul
    ST = Kbd @ qT,  Kbd (H*N, C) block-masked, output (H*N, N)
followed by ONE exp2 and ONE AV matmul with a block-diagonal V
    OE = Vbd @ PT,  Vbd (H*8, H*N) -> (H*8, N).
Per cell: 3 matmuls + 1 exp2 instead of ~17 ops -- targets the
overhead-dominated SWA / enc2 / bottleneck shapes (VERDICT round 2: SWA
runs at ~2% of peak).

    python tools/kernel_lab3.py [--check]
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

from tfswa_tpu.models.attention import RowBlockParams
from tfswa_tpu.ops.pallas._compat import default_interpret
from tfswa_tpu.ops.pallas.fused_block import (
    SCORE_CLAMP, _align128, _erf, _xla_block, fused_row_block,
)
from tools.kernel_lab import make_params, timeit

# (label, R, N, C, H) -- B=4 x 10 s full-model shapes for the small-N stages
SHAPES = [
    ("enc0 SWA  B4", 55728, 64, 32, 8),
    ("enc1 SWA  B4", 13824, 64, 64, 8),
    ("enc2 SWA  B4", 3456, 64, 128, 8),
    ("enc2 TSA  B4", 864, 256, 128, 8),
    ("enc2 FSA  B4", 1024, 216, 128, 8),
    ("bottleneck TSA B4", 432, 128, 256, 8),
    ("bottleneck SWA B4", 864, 64, 256, 8),
]


def _packed_row_block(N: int, C: int, H: int, hidden: int, dtype) -> int:
    sublane = 16 if dtype == jnp.bfloat16 else 8
    if N % sublane != 0:
        return 1
    per_row = (
        H * N * _align128(N) * 4          # ST f32
        + H * N * _align128(N) * 2        # PT bf16
        + (H + 14) * N * _align128(C) * 4
    )
    return max(1, min(64, (11 * 1024 * 1024) // max(per_row, 1)))


def _kernel_packed(
    x_ref, ln1s_ref, ln1b_ref, wq_ref, wk_ref, wv_ref, wo_ref, ob_ref,
    ln2s_ref, ln2b_ref, fc1_ref, f1b_ref, fc2_ref, f2b_ref,
    out_ref, *, num_heads: int,
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
    vT = jnp.swapaxes(v, 1, 2)                               # (Rb, C, N)
    ones_row = jnp.ones((Rb, 1, N), cd)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Rb, N, C), 2)

    # Kbd (Rb, H*N, C): head h's rows carry k masked to its D lanes.
    kbd = jnp.concatenate(
        [jnp.where((lane >= h * D) & (lane < (h + 1) * D), k, 0).astype(cd)
         for h in range(H)], axis=1)
    # ST (Rb, H*N, N): all heads' transposed scores in one matmul.
    sT = jax.lax.dot_general(
        kbd, q, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    pT = jnp.exp2(jnp.minimum(sT, SCORE_CLAMP)).astype(cd)

    # Vbd (Rb, 8*H, H*N): block-diagonal [v_h ; ones ; 0-pad] per head.
    blocks = []
    zeros3 = jnp.zeros((Rb, 8 - D - 1, N), cd) if 8 - D - 1 > 0 else None
    for h in range(H):
        part = [vT[:, h * D:(h + 1) * D, :], ones_row]
        if zeros3 is not None:
            part.append(zeros3)
        blocks.append(jnp.concatenate(part, axis=1))         # (Rb, 8, N)
    # place block h at sublane rows h*8.. and lane cols h*N..
    vbd = jnp.concatenate(
        [jnp.pad(b, ((0, 0), (0, 0), (0, 0))) for b in blocks], axis=1
    )                                                        # (Rb, 8H, N)
    # build block-diagonal over the H*N contraction dim via masking per head
    seg = jax.lax.broadcasted_iota(jnp.int32, (Rb, 8 * H, 1), 1) // 8
    key_seg = jax.lax.broadcasted_iota(jnp.int32, (Rb, 1, H * N), 2) // N
    # OE (Rb, 8H, N) = sum over H*N keys, masked to the diagonal blocks
    # implemented as one matmul with a pre-masked Vbd_full (Rb, 8H, H*N)
    vbd_full = jnp.where(seg == key_seg, _tile_v(vbd, H), 0).astype(cd)
    oe = jax.lax.dot_general(
        vbd_full, pT, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # (Rb, 8H, N)

    accT_parts = []
    for h in range(H):
        o_h = oe[:, h * 8:h * 8 + D, :]
        denom = oe[:, h * 8 + D:h * 8 + D + 1, :]
        accT_parts.append(o_h * pl.reciprocal(denom, approx=False))
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


def _tile_v(vbd, H):
    """(Rb, 8H, N) -> (Rb, 8H, H*N) tiling the N lanes H times."""
    return jnp.concatenate([vbd] * H, axis=2)


def block_packed(rows, p, num_heads):
    R, N, C = rows.shape
    dtype = rows.dtype
    hidden = p.fc1_kernel.shape[1]
    H = num_heads
    D = C // H
    Rb = _packed_row_block(N, C, H, hidden, dtype)
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
        functools.partial(_kernel_packed, num_heads=H),
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
                                + 2 * C * C + 2 * C * hidden),
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
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)

    print(f"device: {jax.devices()[0]}, dtype {dtype}")
    if args.check:
        rng = np.random.default_rng(1)
        rows = jnp.asarray(rng.standard_normal((12, 64, 32)), jnp.float32)
        p = make_params(32, rng, jnp.float32)
        ref = jax.jit(lambda r, pp: _xla_block(r, pp, 8))(rows, p)
        got = jax.jit(lambda r, pp: block_packed(r, pp, 8))(rows, p)
        err = float(jnp.max(jnp.abs(ref - got)))
        den = float(jnp.max(jnp.abs(ref))) or 1.0
        print(f"  packed: max_abs_err {err:.3e} (rel {err/den:.3e})")

    for label, R, N, C, H in SHAPES:
        rng = np.random.default_rng(0)
        rows = jnp.asarray(rng.standard_normal((R, N, C)), dtype)
        p = make_params(C, rng, dtype)
        line = f"{label:18s} R={R:6d} N={N:4d} C={C:3d}"
        for name, fn in [
            ("v3", lambda r, pp: fused_row_block(r, pp, H)),
            ("packed", lambda r, pp: block_packed(r, pp, H)),
        ]:
            try:
                t = timeit(jax.jit(fn), rows, p, iters=args.iters)
                line += f"  {name} {t*1e3:8.2f} ms"
            except Exception as exc:
                line += f"  {name} FAILED: {str(exc)[:100]}"
        print(line)


if __name__ == "__main__":
    main()
