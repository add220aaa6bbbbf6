"""Fused row-attention Pallas kernel for TSA / FSA / SW-MSA.

The model's three attentions all reduce to independent rows (R, N, C) through
qkv -> per-head softmax(q k^T) v -> out-proj (models/attention.py).  XLA
cannot fuse dot -> softmax -> dot into one kernel, so the chunked XLA path
round-trips a (chunk, H, N, N) score tensor through HBM twice per chunk —
at stage 1 of the stock model that is ~0.5 GB of HBM traffic per 16-row
chunk.  This kernel keeps everything in VMEM: each grid cell loads a block
of rows, runs the fused qkv matmul (MXU), the per-head attention (scores
never leave VMEM), and the output projection, writing only the final
(Rb, N, C) block back to HBM.

Backward: a custom VJP that rematerializes through the chunked-XLA path
(identical values; the memory-targeted chunking measured fastest at every
model shape — BENCH.md round 2).  Equivalence: tests/test_pallas.py.

Head count is static and small (<= 8), so the head loop is a Python unroll
with static lane slices — no unaligned dynamic slicing on the lane dim.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._compat import default_interpret

_VMEM_BUDGET = 10 * 1024 * 1024  # soft budget for per-cell intermediates


def _align128(n: int) -> int:
    return ((n + 127) // 128) * 128


def _row_block(N: int, C: int, num_heads: int) -> int:
    """Rows per grid cell such that per-cell intermediates stay within the
    16 MB VMEM scoped limit.

    Empirically (v5e), with Rb > 1 Mosaic keeps the unrolled heads' padded
    score buffers live simultaneously (~H * N * align128(N) f32 per row),
    while at Rb = 1 the sequential head chain reuses one buffer — so the
    estimate scales with H and the floor of 1 is always safe.
    """
    per_row = num_heads * N * _align128(N) * 4 + 12 * N * C * 4
    cap = max(16, 2048 // max(N, 1))   # small-N (window) rows: larger blocks
    return max(1, min(cap, _VMEM_BUDGET // max(per_row, 1)))


def _attention_kernel_bilinear(x_ref, a_ref, wv_ref, wproj_ref, bias_ref,
                               out_ref, *, num_heads: int):
    """Bilinear-form attention: no per-head lane slicing anywhere.

    With head_dim as small as 4, slicing per-head (N, D) activations forces
    Mosaic lane repacks on every head.  Instead use the identity
        scores_h = (x Wq_h)(x Wk_h)^T = x A_h x^T,
    A_h = Wq_h Wk_h^T / sqrt(D) precomputed per head (C x C), and accumulate
        out += softmax(x A_h x^T) @ (v * lane_mask_h)
    where the lane mask zeroes all but head h's D columns of v = x Wv — an
    elementwise select, not a slice.  The head loop is a fori_loop, so score
    buffers are provably reused (one live (Rb, N, N) plane, not H).
    """
    Rb, N, C = x_ref.shape
    H = num_heads
    D = C // H
    compute_dtype = x_ref.dtype

    x = x_ref[:]                                        # (Rb, N, C)
    v = jax.lax.dot_general(
        x, wv_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(compute_dtype)                             # (Rb, N, C)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)

    def head_body(h, acc):
        a_h = a_ref[h]                                  # (C, C), no lane slice
        t = jax.lax.dot_general(
            x, a_h, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(compute_dtype)                         # (Rb, N, C)
        scores = jax.lax.dot_general(
            t, x, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                               # (Rb, N, N), VMEM only
        probs = jax.nn.softmax(scores, axis=-1).astype(compute_dtype)
        v_h = jnp.where(lane // D == h, v, 0).astype(compute_dtype)
        return acc + jax.lax.dot_general(
            probs, v_h, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(
        0, H, head_body, jnp.zeros((Rb, N, C), jnp.float32)
    )
    # dot_general (not reshape+dot): Mosaic rejects merging leading dims when
    # N is not sublane-aligned (e.g. (4, 259, 32) -> (1036, 32)).
    out = jax.lax.dot_general(
        acc.astype(compute_dtype), wproj_ref[:],
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[:].astype(jnp.float32)
    out_ref[:] = out.astype(out_ref.dtype)


def _attention_kernel(x_ref, wqkv_ref, wproj_ref, bias_ref, out_ref,
                      *, num_heads: int):
    Rb, N, C = x_ref.shape
    H = num_heads
    D = C // H
    scale = D ** -0.5

    # Matmuls run in the caller's compute dtype (bf16 -> full-rate MXU)
    # with f32 accumulation; softmax always reduces in f32.
    compute_dtype = x_ref.dtype
    x2 = x_ref[:].reshape(Rb * N, C)
    qkv = jnp.dot(
        x2, wqkv_ref[:],
        preferred_element_type=jnp.float32,
    ).astype(compute_dtype).reshape(Rb, N, 3 * C)

    head_outs = []
    for h in range(H):                       # static unroll, static lane slices
        q = qkv[:, :, h * D : (h + 1) * D]
        k = qkv[:, :, C + h * D : C + (h + 1) * D]
        v = qkv[:, :, 2 * C + h * D : 2 * C + (h + 1) * D]
        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                             # (Rb, N, N), lives in VMEM only
        probs = jax.nn.softmax(scores, axis=-1).astype(compute_dtype)
        head_outs.append(
            jax.lax.dot_general(
                probs, v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )                                     # (Rb, N, D)
    merged = jnp.concatenate(
        [h.astype(compute_dtype) for h in head_outs], axis=-1
    )                                                 # (Rb, N, C)
    out = jnp.dot(
        merged.reshape(Rb * N, C), wproj_ref[:],
        preferred_element_type=jnp.float32,
    ) + bias_ref[:].astype(jnp.float32)
    out_ref[:] = out.reshape(Rb, N, C).astype(out_ref.dtype)


_SCORE_BUDGET = 8 * 1024 * 1024


def _bilinear_row_block(N: int, C: int, dtype) -> int:
    """Rows per grid cell: the head fori_loop keeps exactly one live score
    plane (f32) + one probs plane, so the bound is per-row, not per-head.

    Rb > 1 requires N to be sublane-tile aligned: Mosaic lowers the batched
    dots by merging (Rb, N) and rejects the merge otherwise."""
    sublane = 16 if dtype == jnp.bfloat16 else 8
    if N % sublane != 0:
        return 1
    per_row = 2 * N * _align128(N) * 4 + 8 * N * _align128(C) * 4
    return max(1, min(32, _SCORE_BUDGET // max(per_row, 1)))


def _bilinear_weights(qkv_kernel, num_heads: int):
    """A (H, C, C) with A_h = Wq_h Wk_h^T / sqrt(D), plus Wv (C, C)."""
    C = qkv_kernel.shape[0]
    H = num_heads
    D = C // H
    wq = qkv_kernel[:, :C].astype(jnp.float32)
    wk = qkv_kernel[:, C : 2 * C].astype(jnp.float32)
    wv = qkv_kernel[:, 2 * C :]
    wq_h = wq.reshape(C, H, D).transpose(1, 0, 2)      # (H, C, D)
    wk_h = wk.reshape(C, H, D).transpose(1, 0, 2)
    a = jnp.einsum("hcd,hed->hce", wq_h, wk_h) * (D ** -0.5)
    return a, wv


def _flash_rows_impl(rows, qkv_kernel, proj_kernel, proj_bias, num_heads):
    R, N, C = rows.shape
    Rb = _bilinear_row_block(N, C, rows.dtype)
    pad = (-R) % Rb
    padded = jnp.pad(rows, ((0, pad), (0, 0), (0, 0))) if pad else rows
    Rp = R + pad

    a, wv = _bilinear_weights(qkv_kernel, num_heads)
    a = a.astype(rows.dtype)
    wv = wv.astype(rows.dtype)

    kernel = functools.partial(_attention_kernel_bilinear, num_heads=num_heads)
    H = num_heads
    out = pl.pallas_call(
        kernel,
        grid=(Rp // Rb,),
        interpret=default_interpret(),
        in_specs=[
            pl.BlockSpec((Rb, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Rb, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, N, C), rows.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * N * (num_heads * C * C + 2 * N * C + 2 * C * C),
            bytes_accessed=Rp * N * C * 4 * 2,
            transcendentals=Rp * num_heads * N * N,
        ),
    )(padded, a, wv, proj_kernel.astype(rows.dtype), proj_bias)
    return out[:R] if pad else out


def _xla_reference(rows, qkv_kernel, proj_kernel, proj_bias, num_heads,
                   chunk: int = 16):
    """Chunked XLA computation of the same function (used for backward)."""
    from ...models.attention import mha_rows

    R = rows.shape[0]
    if R <= chunk:
        return mha_rows(rows, qkv_kernel, proj_kernel, proj_bias, num_heads)
    pad = (-R) % chunk
    padded = jnp.pad(rows, ((0, pad), (0, 0), (0, 0)))
    chunks = padded.reshape(-1, chunk, *padded.shape[1:])
    # remat per chunk: the scan VJP would otherwise stack every chunk's
    # (chunk, H, N, N) probs as residuals — tens of GB at stage-1 shapes.
    out = jax.lax.map(
        jax.checkpoint(
            lambda c: mha_rows(c, qkv_kernel, proj_kernel, proj_bias, num_heads)
        ),
        chunks,
    )
    return out.reshape(-1, *padded.shape[1:])[:R]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_row_attention(rows, qkv_kernel, proj_kernel, proj_bias, num_heads):
    """softmax((x Wq)(x Wk)^T / sqrt(D)) (x Wv) Wo + b over independent rows.

    rows: (R, N, C); kernels as in models/attention.RowBlockParams.
    Forward runs the fused Pallas kernel; backward rematerializes through the
    XLA path (identical values).
    """
    return _flash_rows_impl(rows, qkv_kernel, proj_kernel, proj_bias, num_heads)


def _fwd(rows, qkv_kernel, proj_kernel, proj_bias, num_heads):
    out = _flash_rows_impl(rows, qkv_kernel, proj_kernel, proj_bias, num_heads)
    return out, (rows, qkv_kernel, proj_kernel, proj_bias)


def _bwd(num_heads, residuals, g):
    rows, qkv_kernel, proj_kernel, proj_bias = residuals
    _, vjp = jax.vjp(
        lambda r, wq, wp, b: _xla_reference(r, wq, wp, b, num_heads),
        rows, qkv_kernel, proj_kernel, proj_bias,
    )
    return vjp(g)


flash_row_attention.defvjp(_fwd, _bwd)
