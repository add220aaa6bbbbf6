"""INT8 compute primitives: quantized matmuls that actually run in int8.

Round-1 quantization only shrank *storage* (weights int8 on disk, dequantized
before every matmul).  This module is the compute half (reference int8
genuinely changes the compute path: quantization.py:25-148 via FBGEMM):

  - ``quantize_symmetric``: per-channel (weights) / per-tensor (activations)
    symmetric int8 quantization.
  - ``int8_matmul``: int8 x int8 -> int32 accumulation on the MXU
    (preferred_element_type=int32), rescaled to f32 by the product of scales.
  - ``int8_row_block``: the row-transformer block with every dense matmul
    (qkv, out-proj, fc1, fc2) running through int8_matmul; LN / softmax /
    GELU stay f32.  Selected via attention_impl="int8".

Activations use dynamic per-tensor scales by default (torch
quantize_dynamic semantics); pass static ``act_scale`` values calibrated by
``optimization.quantization.quantize_static`` for static quantization.

Measured verdict on TPU v5e (tools/block_ablation.py, BENCH.md): the int8
MXU rate (2x bf16) is eaten by the quantize/rescale epilogues at these
small-C shapes, so bf16 remains the serving default; this path exists for
capability parity and for weight-bound deployments.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def quantize_symmetric(
    x: jnp.ndarray,
    axis=None,
    scale: Optional[jnp.ndarray] = None,
):
    """Symmetric int8 quantization.

    axis=None: per-tensor scale (activations); axis=tuple: reduce over those
    axes, keepdims (per-output-channel weights).  A precomputed ``scale``
    (static calibration) skips the absmax reduction.
    Returns (q_int8, scale_f32).
    """
    xf = x.astype(jnp.float32)
    if scale is None:
        if axis is None:
            absmax = jnp.max(jnp.abs(xf))
        else:
            absmax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
        scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul(
    xq: jnp.ndarray,
    wq: jnp.ndarray,
    x_scale: jnp.ndarray,
    w_scale: jnp.ndarray,
) -> jnp.ndarray:
    """(..., K) int8 @ (K, M) int8 -> (..., M) f32.

    The contraction accumulates in int32 on the MXU (394 int8 TOPS on v5e vs
    197 bf16); the rescale is one f32 multiply by x_scale * w_scale.
    w_scale is (1, M) per-output-channel (or scalar).
    """
    acc = jax.lax.dot_general(
        xq, wq,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (x_scale * w_scale.reshape(-1))


def int8_dense(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    act_scale: Optional[jnp.ndarray] = None,
):
    """f32/bf16 activations -> int8 matmul -> f32 (+bias).

    ``w`` is the (already int8-valued, f32-stored) weight: since
    quantize->dequantize storage makes every entry an exact multiple of its
    channel scale, requantizing here is lossless and keeps the flax variable
    tree dtype-uniform.

    Returns (out, x_scale): the activation scale actually used, so static
    calibration (quantize_static) can record running absmax statistics.
    """
    wq, w_scale = quantize_symmetric(w, axis=tuple(range(w.ndim - 1)))
    xq, x_scale = quantize_symmetric(x, axis=None, scale=act_scale)
    out = int8_matmul(xq, wq, x_scale, w_scale)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out, x_scale


def int8_mha_rows(
    rows: jnp.ndarray,
    qkv_kernel: jnp.ndarray,
    proj_kernel: jnp.ndarray,
    proj_bias: jnp.ndarray,
    num_heads: int,
    act_scales: Optional[dict] = None,
) -> jnp.ndarray:
    """models/attention.mha_rows with the qkv and out-proj matmuls in int8.

    Scores/softmax/AV stay f32: the (N, N) attention matmuls are
    activation x activation (both sides dynamic) where int8 showed no win in
    the kernel ablation, and masks are accuracy-critical.
    """
    from ..models.attention import attention_core

    R, N, C = rows.shape
    sc = act_scales or {}
    used = {}
    qkv, used["qkv"] = int8_dense(rows, qkv_kernel, act_scale=sc.get("qkv"))
    # qkv stays f32 (int8_dense dequantizes to f32): the attention core's
    # precision matches the pre-refactor form exactly
    q, k, v = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]
    # Same MXU-dense (lane-masked, transposed-AV, head-paired at small N)
    # f32 attention core as the bf16 path — the int8 win is confined to
    # the weight matmuls; the previous naive per-head D-contraction form
    # left the (N, N) score matmuls 4/128-lane sparse.
    out = attention_core(q, k, v, num_heads)
    out, used["proj"] = int8_dense(out, proj_kernel, proj_bias,
                                   act_scale=sc.get("proj"))
    return out, used


def int8_row_block(
    rows: jnp.ndarray,
    p,
    num_heads: int,
    act_scales: Optional[dict] = None,
):
    """Pre-LN row-transformer block with int8 dense compute
    (attention_impl="int8" in models/attention.row_transformer_block).

    Returns (out, used_scales) where used_scales maps site name ->
    the activation scale applied (dynamic absmax/127 unless a static
    calibrated scale was supplied via ``act_scales``).
    """
    from ..models.attention import _layer_norm
    from ..models.layers import gelu

    sc = act_scales or {}
    dtype = rows.dtype
    normed = _layer_norm(rows, p.norm1_scale, p.norm1_bias)
    # Row-chunked attention (same memory tactic as the XLA path,
    # models/attention.py row chunking): bounds in-flight (chunk, H, N, N)
    # probs, which at full spectrogram resolution would be tens of GB.
    R, N, C = normed.shape
    chunk = max(1, min(R, (32 * 1024 * 1024)
                       // max(num_heads * N * N * 4, 1)))
    nf = normed.astype(jnp.float32)
    if R > chunk:
        pad = (-R) % chunk
        padded = jnp.pad(nf, ((0, pad), (0, 0), (0, 0)))
        chunks = padded.reshape(-1, chunk, N, C)
        attn_c, used_c = jax.lax.map(
            lambda ck: int8_mha_rows(
                ck, p.qkv_kernel, p.proj_kernel, p.proj_bias,
                num_heads, act_scales=sc,
            ),
            chunks,
        )
        attn = attn_c.reshape(-1, N, C)[:R]
        used = {k: jnp.max(v) for k, v in used_c.items()}
    else:
        attn, used = int8_mha_rows(
            nf, p.qkv_kernel, p.proj_kernel, p.proj_bias,
            num_heads, act_scales=sc,
        )
    rows = rows + attn.astype(dtype)
    h = _layer_norm(rows, p.norm2_scale, p.norm2_bias)
    h, used["fc1"] = int8_dense(h.astype(jnp.float32), p.fc1_kernel,
                                p.fc1_bias, act_scale=sc.get("fc1"))
    h = gelu(h)
    h, used["fc2"] = int8_dense(h, p.fc2_kernel, p.fc2_bias,
                                act_scale=sc.get("fc2"))
    return rows + h.astype(dtype), used
