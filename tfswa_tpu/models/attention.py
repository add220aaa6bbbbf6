"""TSA / FSA / SW-MSA attention for TFSWA blocks, TPU-first.

All three attentions share one primitive: a pre-LN transformer block applied
independently to a batch of rows (R, N, C) — rows are frequency columns (TSA,
reference: attention.py:93-164), time frames (FSA, reference:
attention.py:167-238), or ws*ws windows (SW-MSA, reference:
attention.py:280-403).

TPU design notes (vs the reference's implementation *tactics*):
  - The reference's Python chunk loop over rows (attention.py:147-155) is a
    memory tactic with no effect on values.  Here the XLA path bounds score
    memory with a lax.map over static row-chunks, and the Pallas path streams
    rows through a fused flash-attention kernel with no (N, N) materialization.
  - Softmax runs in float32 even under bfloat16 compute.
  - Row batching is a pure reshape in NHWC layout; channels stay on the lane dim.

Parameter layout is flat per block (norm1_*, qkv_kernel, proj_*, norm2_*,
fc1_*, fc2_*) so the chunked XLA path, the Pallas kernel, and torch-weight
conversion all share one structure.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.windowing import swin_mask_table, window_partition, window_reverse
from .layers import gelu, trunc_normal_002

Dtype = Any


class RowBlockParams(NamedTuple):
    """Flat parameters of one row-transformer block (pre-LN MHA + MLP)."""

    norm1_scale: jnp.ndarray
    norm1_bias: jnp.ndarray
    qkv_kernel: jnp.ndarray      # (C, 3C), no bias (reference: attention.py:46)
    proj_kernel: jnp.ndarray     # (C, C)
    proj_bias: jnp.ndarray
    norm2_scale: jnp.ndarray
    norm2_bias: jnp.ndarray
    fc1_kernel: jnp.ndarray      # (C, mlp_hidden)
    fc1_bias: jnp.ndarray
    fc2_kernel: jnp.ndarray      # (mlp_hidden, C)
    fc2_bias: jnp.ndarray


def _layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
):
    """Standalone qk^T-softmax-v helper, API parity with the reference's
    (never-used) module (reference: attention.py:12-31).  Boolean masks
    follow masked_fill(~mask, -inf).  Returns (output, weights)."""
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum(
        "...nd,...md->...nm", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        scores = jnp.where(mask, scores, -jnp.inf) if mask.dtype == jnp.bool_ \
            else scores + mask
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    output = jnp.einsum("...nm,...md->...nd", weights.astype(v.dtype), v)
    return output, weights


def _dropout(x: jnp.ndarray, rate: float, rng) -> jnp.ndarray:
    """Inverted dropout, torch nn.Dropout semantics (scale by 1/(1-p))."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0).astype(x.dtype)


def _pair_heads_profitable(N: int, C: int, num_heads: int) -> bool:
    """Whether mha_rows pairs heads two-per-MXU-tile at this shape.

    At small N (SWA windows: N = 64) each per-head score matmul
    (N, C) @ (C, N) occupies one 128x128 MXU tile at N^2*C/128^3
    utilization (6.25% at N=64, C=32); pairing two heads along both score
    dims doubles it, and the paired AV contracts 2N = 128 full lanes.
    Measured on v5e (BENCH.md round 4) before being made the default.
    A per-chip autotune entry overrides."""
    if 2 * N > 128 or num_heads % 2 or N % 8:
        return False
    from ..ops.pallas import autotune

    tuned = autotune.lookup("mha_pair", f"{N},{C}")
    if tuned is not None:
        return bool(tuned)
    return True


def mha_rows(
    rows: jnp.ndarray,
    qkv_kernel: jnp.ndarray,
    proj_kernel: jnp.ndarray,
    proj_bias: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng=None,
    pair_heads: Optional[bool] = None,
) -> jnp.ndarray:
    """Multi-head self-attention over rows (R, N, C) -> (R, N, C)
    (reference: attention.py:34-90).  mask, if given, is additive
    (R or 1, 1, N, N) applied to pre-softmax scores.  dropout, when active,
    is applied to the post-softmax weights (reference: attention.py:81).

    pair_heads (None = auto by shape/autotune) packs two heads per MXU
    tile at small N — value-identical; see _pair_heads_profitable."""
    dtype = rows.dtype
    C = rows.shape[2]
    qkv = jnp.einsum("rnc,ck->rnk", rows, qkv_kernel.astype(dtype))
    q, k, v = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]  # (R, N, C)
    out = attention_core(
        q, k, v, num_heads, mask=mask,
        dropout_rate=dropout_rate, dropout_rng=dropout_rng,
        pair_heads=pair_heads,
    )
    out = jnp.einsum("rnc,ck->rnk", out, proj_kernel.astype(dtype))
    return out + proj_bias.astype(dtype)


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng=None,
    pair_heads: Optional[bool] = None,
) -> jnp.ndarray:
    """Multi-head scores/softmax/AV on (R, N, C) q/k/v -> (R, N, C),
    shared by mha_rows and the int8 serving path (ops/int8.py).

    MXU-dense layout (same tricks as the fused Pallas kernel, in plain
    XLA, so jax.grad's transposed matmuls inherit dense shapes too —
    this path is the remat/backward workhorse):
      - per-head scores contract the full C lanes against a lane-masked
        K (zeros outside head h's D lanes keep the math per-head exact)
        instead of contracting the tiny head_dim D=4;
      - the AV product runs transposed, (D, N) @ (N, N): the N-sized
        dims ride lanes/contraction, only D rides sublanes.
    """
    R, N, C = q.shape
    H = num_heads
    D = C // H
    dtype = q.dtype
    scale = D ** -0.5
    lanes = jnp.arange(C)
    head_mask = (
        (lanes[None, :] // D) == jnp.arange(H)[:, None]
    ).astype(dtype)                                      # (H, C)
    kh = k[:, None] * head_mask[None, :, None, :]        # (R, H, N, C)
    if pair_heads is None:
        pair_heads = _pair_heads_profitable(N, C, H)

    if pair_heads and H % 2 == 0:
        # Two heads per MXU tile: keys of heads (2p, 2p+1) stack along the
        # key dim (their lane masks are disjoint), queries duplicate along
        # the query dim; an additive block mask kills the off-diagonal
        # cross-head scores so each column's softmax sees only its own
        # head.  The AV contracts 2N full lanes with the two heads' v
        # stacked along keys.  Value-identical to the unpaired path.
        P = H // 2
        khh = kh.reshape(R, P, 2 * N, C)
        q2 = jnp.concatenate([q, q], axis=1)             # (R, 2N, C)
        sT = jnp.einsum(
            "rpmc,rnc->rpmn", khh, q2 * jnp.asarray(scale, dtype),
            preferred_element_type=jnp.float32,
        )                                                # (R, P, 2N, 2N)
        neg = jnp.float32(-1e30)
        if mask is not None:
            mT = jnp.swapaxes(mask, -1, -2).astype(jnp.float32)
            mT = jnp.broadcast_to(mT, (mask.shape[0], 1, N, N))
            off = jnp.full_like(mT, neg)
            m2 = jnp.concatenate([
                jnp.concatenate([mT, off], axis=-1),
                jnp.concatenate([off, mT], axis=-1),
            ], axis=-2)                                  # (Rm, 1, 2N, 2N)
            sT = sT + m2
        else:
            blk = jnp.where(
                (jnp.arange(2 * N)[:, None] // N)
                == (jnp.arange(2 * N)[None, :] // N), 0.0, neg)
            sT = sT + blk
        weights = jax.nn.softmax(sT.astype(jnp.float32), axis=-2) \
            .astype(dtype)
        if dropout_rate > 0.0 and dropout_rng is not None:
            weights = _dropout(weights, dropout_rate, dropout_rng)
        vT = v.reshape(R, N, P, 2, D).transpose(0, 2, 4, 3, 1) \
            .reshape(R, P, D, 2 * N)                     # keys m = 2N
        oT2 = jnp.einsum("rpdm,rpmn->rpdn", vT, weights)  # (R, P, D, 2N)
        oT = oT2.reshape(R, P, D, 2, N).transpose(0, 1, 3, 2, 4) \
            .reshape(R, H, D, N)
    else:
        sT = jnp.einsum(
            "rhmc,rnc->rhmn", kh, q * jnp.asarray(scale, dtype),
            preferred_element_type=jnp.float32,
        )                                                # m=key, n=query
        if mask is not None:
            sT = sT + jnp.swapaxes(mask, -1, -2)
        weights = jax.nn.softmax(sT.astype(jnp.float32), axis=-2).astype(dtype)
        if dropout_rate > 0.0 and dropout_rng is not None:
            weights = _dropout(weights, dropout_rate, dropout_rng)
        vT = v.reshape(R, N, H, D).transpose(0, 2, 3, 1)  # (R, H, D, m)
        oT = jnp.einsum("rhdm,rhmn->rhdn", vT, weights)   # (R, H, D, n)
    return oT.transpose(0, 3, 1, 2).reshape(R, N, C)


def _pallas_fwd_profitable(N: int, C: int, dtype=jnp.bfloat16,
                           R: Optional[int] = None) -> bool:
    """Forward routing gate for the fused Pallas block kernel (measured on
    v5e vs the memory-targeted chunked-XLA path): Pallas wins at
    full-resolution N (60 vs 113 ms at N=1025/C=32, 55 vs 75 at N=517), at
    SWA windows (16 vs 18 at N=64) and the bottleneck (11.1 vs 13.6 at
    C=256), and ties at N=512/C=64 across row counts.  The one measured
    XLA-favoured region is mid-N odd rows at small C, e.g. FSA at short
    segments (23.5 vs 21 ms at N=259/C=32, 25 vs 19 at C=64): there row
    blocks are VMEM-bound to Rb=1 with thousands of small grid cells.  At
    C=128 the same N band measures better on Pallas at inference batch
    sizes (bench.py A/B), so the exception stops at C<=64.

    A per-chip measured route (ops/pallas/autotune.py, populated by
    tools/autotune.py) overrides this v5e-measured heuristic; the row
    count R qualifies the lookup (r-bucketed entries win) so a serving-
    band measurement at small R never overrides the flagship route at
    the same (N, C)."""
    from ..ops.pallas import autotune

    tuned = autotune.attention_route(N, C, jnp.dtype(dtype).name, R=R)
    if tuned is not None:
        return tuned == "pallas"
    return not (128 < N < 300 and C <= 64)


def _chunk_target_bytes() -> int:
    """In-flight prob-plane budget for the chunked XLA path (default
    32 MB, measured optimal on v5e round 2; TFSWA_CHUNK_MB overrides for
    re-sweeps after layout changes)."""
    import os

    return int(float(os.environ.get("TFSWA_CHUNK_MB", "32")) * 1024 * 1024)


def _effective_chunk(chunk_size: int, N: int, num_heads: int) -> int:
    """Row-chunk size targeting ~32 MB of in-flight probs.  Materialised
    (chunk, H, N, N) score planes are pure HBM traffic; measured on v5e,
    chunk=1 beats the reference's fixed 16 by 4.5x at full-resolution
    N=1025 (35 vs 160 ms per block at R=518)."""
    return max(1, min(
        chunk_size, _chunk_target_bytes() // max(num_heads * N * N * 4, 1)
    ))


def row_transformer_block(
    rows: jnp.ndarray,
    p: RowBlockParams,
    num_heads: int,
    *,
    chunk_size: Optional[int] = None,
    attention_impl: str = "xla",
    mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng=None,
) -> jnp.ndarray:
    """Pre-LN transformer block on rows (R, N, C):
        rows + MHA(LN(rows));  then  + MLP(LN(.))
    (reference: attention.py:130-164 TSA forward, identical math for FSA/SWA).

    Active dropout (rate > 0 with an rng) follows the reference's three
    sites — post-softmax attention weights, MLP-after-GELU, MLP-after-fc2
    (reference: attention.py:81,125-127) — and forces the XLA path.
    """
    dtype = rows.dtype
    use_dropout = dropout_rate > 0.0 and dropout_rng is not None

    # A factored mask (table (K, 1, N, N), idx (R,)) — the Swin shift mask's
    # 4-pattern form (ops/windowing.py swin_mask_table) — is gathered lazily:
    # per chunk in the chunked path, so neither the HLO (literals) nor HBM
    # ever holds the dense (R, 1, N, N) tensor at full-track window counts.
    mask_table = mask_idx = None
    if isinstance(mask, tuple):
        mask_table, mask_idx = mask
        mask = None
    has_mask = mask is not None or mask_idx is not None

    if attention_impl in ("pallas", "pallas_int8") and not has_mask \
            and not use_dropout \
            and _pallas_fwd_profitable(rows.shape[1], rows.shape[2], dtype,
                                       R=rows.shape[0]):
        # Whole block in one fused Pallas kernel: LN1 -> attention ->
        # +residual -> LN2 -> MLP -> +residual, no HBM round trips between.
        # Shapes where the chunked-XLA path measures faster fall through.
        # "pallas_int8" (serving only) additionally runs the score/AV
        # matmuls int8 on the MXU at shapes where that measures faster
        # (the "fused_int8" autotune gate).
        from ..ops.pallas import autotune
        from ..ops.pallas.fused_block import (fused_row_block,
                                              fused_row_block_int8)

        if attention_impl == "pallas_int8" and str(autotune.lookup(
                "fused_int8",
                f"{rows.shape[1]},{rows.shape[2]}")) == "1":
            return fused_row_block_int8(rows, p, num_heads)
        return fused_row_block(rows, p, num_heads)

    normed = _layer_norm(rows, p.norm1_scale, p.norm1_bias)

    if attention_impl == "pallas_attn" and not has_mask and not use_dropout:
        from ..ops.pallas.row_attention import flash_row_attention

        attn = flash_row_attention(
            normed, p.qkv_kernel.astype(dtype), p.proj_kernel.astype(dtype),
            p.proj_bias.astype(dtype), num_heads,
        )
    elif chunk_size is not None and rows.shape[0] > _effective_chunk(
            chunk_size, rows.shape[1], num_heads):
        # Bound peak score memory to (chunk, H, N, N) — functionally identical
        # to full attention; mirrors the reference's row chunking
        # (reference: attention.py:147-155) as a sequential lax.map.
        # jax.checkpoint keeps the BACKWARD bounded too: without it the scan
        # VJP stacks every chunk's (chunk, H, N, N) probs as residuals.
        # A per-row mask (R, 1, N, N) — masked SWA at full-track shapes
        # produces 100k+ window-rows — is chunked along with the rows so the
        # score planes stay bounded; a broadcast (1, 1, N, N) mask is closed
        # over instead.
        R = rows.shape[0]
        chunk_size = _effective_chunk(chunk_size, rows.shape[1], num_heads)
        pad = (-R) % chunk_size
        padded = jnp.pad(normed, ((0, pad), (0, 0), (0, 0)))
        chunks = padded.reshape(-1, chunk_size, *padded.shape[1:])
        n_chunks = chunks.shape[0]
        xs = {"rows": chunks}
        if mask_idx is not None and mask_idx.shape[0] == R:
            ip = jnp.pad(mask_idx, ((0, pad),))
            xs["mask_idx"] = ip.reshape(n_chunks, chunk_size)
        elif mask is not None and mask.shape[0] == R:
            mp = jnp.pad(mask, ((0, pad), (0, 0), (0, 0), (0, 0)))
            xs["mask"] = mp.reshape(n_chunks, chunk_size, *mask.shape[1:])
        if use_dropout:
            attn_rng, dropout_rng = jax.random.split(dropout_rng)
            xs["rng"] = jax.random.split(attn_rng, n_chunks)

        def _one_chunk(c):
            m = c.get("mask", mask)
            if "mask_idx" in c:
                m = mask_table[c["mask_idx"]]
            elif m is None and mask_idx is not None:
                m = mask_table[mask_idx]     # broadcast idx (rare)
            return mha_rows(
                c["rows"], p.qkv_kernel, p.proj_kernel, p.proj_bias,
                num_heads, mask=m,
                dropout_rate=dropout_rate if use_dropout else 0.0,
                dropout_rng=c.get("rng"),
            )

        attn = jax.lax.map(jax.checkpoint(_one_chunk), xs)
        attn = attn.reshape(-1, *padded.shape[1:])[:R]
    else:
        if use_dropout:
            attn_rng, dropout_rng = jax.random.split(dropout_rng)
        if mask_idx is not None:
            mask = mask_table[mask_idx]
        attn = mha_rows(
            normed, p.qkv_kernel, p.proj_kernel, p.proj_bias, num_heads,
            mask=mask,
            dropout_rate=dropout_rate if use_dropout else 0.0,
            dropout_rng=attn_rng if use_dropout else None,
        )

    rows = rows + attn
    h = _layer_norm(rows, p.norm2_scale, p.norm2_bias)
    h = jnp.einsum("rnc,ck->rnk", h, p.fc1_kernel.astype(dtype)) + p.fc1_bias.astype(dtype)
    h = gelu(h)
    if use_dropout:
        k1, k2 = jax.random.split(dropout_rng)
        h = _dropout(h, dropout_rate, k1)
    h = jnp.einsum("rnk,kc->rnc", h, p.fc2_kernel.astype(dtype)) + p.fc2_bias.astype(dtype)
    if use_dropout:
        h = _dropout(h, dropout_rate, k2)
    return rows + h


class MultiHeadAttention(nn.Module):
    """Standalone MHA over (B, N, C) sequences — API parity with the
    reference's module (reference: attention.py:34-90).  Boolean masks follow
    the reference's masked_fill(~mask, -inf) convention."""

    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        tn = trunc_normal_002()
        zeros = nn.initializers.zeros
        qkv_kernel = self.param("qkv_kernel", tn, (self.dim, 3 * self.dim),
                                self.param_dtype)
        proj_kernel = self.param("proj_kernel", tn, (self.dim, self.dim),
                                 self.param_dtype)
        proj_bias = self.param("proj_bias", zeros, (self.dim,), self.param_dtype)
        add_mask = None
        if mask is not None:
            if mask.dtype == jnp.bool_:
                add_mask = jnp.where(mask, 0.0, -jnp.inf).astype(jnp.float32)
            else:
                add_mask = mask.astype(jnp.float32)
        rng = None
        if self.dropout > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
        return mha_rows(
            x.astype(self.dtype), qkv_kernel, proj_kernel, proj_bias,
            self.num_heads, mask=add_mask,
            dropout_rate=self.dropout, dropout_rng=rng,
        )


class _RowBlockMixin:
    """Declares the flat row-block params on a linen module."""

    def _int8_block(self, rows: jnp.ndarray, p: RowBlockParams) -> jnp.ndarray:
        """attention_impl="int8": serving path with every dense matmul in
        int8 (int32 MXU accumulation) — the compute half of
        optimization/quantization.py (reference int8 compute:
        quantization.py:25-148).

        Static activation scales, when calibrated by quantize_static, arrive
        as the "act_scales" variable collection; otherwise activations are
        quantized dynamically.  Under a mutable "act_stats" collection the
        dynamically-observed scales are sown (running max) — that is the
        calibration pass itself.
        """
        from ..ops.int8 import int8_row_block

        scales = None
        if self.has_variable("act_scales", "scales"):
            scales = self.get_variable("act_scales", "scales")
        out, used = int8_row_block(rows, p, self.num_heads, act_scales=scales)
        if self.is_mutable_collection("act_stats"):
            self.sow(
                "act_stats", "scales", used,
                init_fn=lambda: {k: jnp.zeros((), jnp.float32) for k in used},
                reduce_fn=lambda acc, new: {
                    k: jnp.maximum(acc[k], new[k]) for k in new
                },
            )
        return out

    def _row_block_params(self, dim: int, mlp_ratio: float) -> RowBlockParams:
        hidden = int(dim * mlp_ratio)
        pd = self.param_dtype
        ones = nn.initializers.ones
        zeros = nn.initializers.zeros
        tn = trunc_normal_002()
        return RowBlockParams(
            norm1_scale=self.param("norm1_scale", ones, (dim,), pd),
            norm1_bias=self.param("norm1_bias", zeros, (dim,), pd),
            qkv_kernel=self.param("qkv_kernel", tn, (dim, 3 * dim), pd),
            proj_kernel=self.param("proj_kernel", tn, (dim, dim), pd),
            proj_bias=self.param("proj_bias", zeros, (dim,), pd),
            norm2_scale=self.param("norm2_scale", ones, (dim,), pd),
            norm2_bias=self.param("norm2_bias", zeros, (dim,), pd),
            fc1_kernel=self.param("fc1_kernel", tn, (dim, hidden), pd),
            fc1_bias=self.param("fc1_bias", zeros, (hidden,), pd),
            fc2_kernel=self.param("fc2_kernel", tn, (hidden, dim), pd),
            fc2_bias=self.param("fc2_bias", zeros, (dim,), pd),
        )


class TemporalSequenceAttention(nn.Module, _RowBlockMixin):
    """TSA: attention along the H axis, one row per (batch, w) column
    (reference: attention.py:93-164).

    Note the reference feeds the model (B, 2C, F, T) spectrograms, so the
    'temporal' axis H is actually the frequency-bin axis at runtime — a
    reference quirk we preserve (reference: trainer.py:164, attention.py:143).
    Input here is NHWC: (B, H, W, C).
    """

    dim: int
    num_heads: int = 8
    dropout: float = 0.0
    mlp_ratio: float = 4.0
    attn_chunk_size: Optional[int] = 16
    attention_impl: str = "xla"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, H, W, C = x.shape
        p = self._row_block_params(self.dim, self.mlp_ratio)
        rng = None
        if self.dropout > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
        rows = x.transpose(0, 2, 1, 3).reshape(B * W, H, C)
        if self.attention_impl == "int8":
            rows = self._int8_block(rows, p)
        else:
            rows = row_transformer_block(
                rows, p, self.num_heads,
                chunk_size=self.attn_chunk_size,
                attention_impl=self.attention_impl,
                dropout_rate=self.dropout, dropout_rng=rng,
            )
        return rows.reshape(B, W, H, C).transpose(0, 2, 1, 3)


class FrequencySequenceAttention(nn.Module, _RowBlockMixin):
    """FSA: attention along the W axis, one row per (batch, h)
    (reference: attention.py:167-238).  Input NHWC."""

    dim: int
    num_heads: int = 8
    dropout: float = 0.0
    mlp_ratio: float = 4.0
    attn_chunk_size: Optional[int] = 16
    attention_impl: str = "xla"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, H, W, C = x.shape
        p = self._row_block_params(self.dim, self.mlp_ratio)
        rng = None
        if self.dropout > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
        rows = x.reshape(B * H, W, C)
        if self.attention_impl == "int8":
            rows = self._int8_block(rows, p)
        else:
            rows = row_transformer_block(
                rows, p, self.num_heads,
                chunk_size=self.attn_chunk_size,
                attention_impl=self.attention_impl,
                dropout_rate=self.dropout, dropout_rng=rng,
            )
        return rows.reshape(B, H, W, C)


class ShiftedWindowAttention(nn.Module, _RowBlockMixin):
    """SW-MSA: pad to window multiples, cyclic-shift, windowed attention
    (reference: attention.py:280-403).  Input NHWC.

    Parity note: the reference registers a shifted-window attention mask but
    never applies it ("simplified for now", reference: attention.py:380-382),
    so shifted windows attend across the wrap-around seam.  We default to the
    same behaviour; ``use_shift_mask=True`` enables the correct Swin mask.
    """

    dim: int
    window_size: int
    num_heads: int
    shift_size: int = 0
    dropout: float = 0.0
    mlp_ratio: float = 4.0
    use_shift_mask: bool = False
    attention_impl: str = "xla"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, H, W, C = x.shape
        ws, ss = self.window_size, self.shift_size
        p = self._row_block_params(self.dim, self.mlp_ratio)

        pad_h = (ws - H % ws) % ws
        pad_w = (ws - W % ws) % ws
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w

        if ss > 0:
            x = jnp.roll(x, shift=(-ss, -ss), axis=(1, 2))

        windows = window_partition(x, ws)            # (B*nW, ws*ws, C)

        mask = None
        if self.use_shift_mask and ss > 0:
            # Factored 4-pattern form: tiny HLO literals (the dense per-
            # window mask is hundreds of MB at full-track window counts,
            # which overflows remote-compile request limits) and gathered
            # per row chunk downstream so HBM stays bounded too.
            table, idx = swin_mask_table(Hp, Wp, ws, ss)
            mask = (
                jnp.asarray(table)[:, None],           # (4, 1, N, N)
                jnp.tile(jnp.asarray(idx), (B,)),      # (B*nW,)
            )

        # Bound peak score memory: full-track spectrograms produce 100k+
        # windows, and (R, heads, N, N) scores at once would be tens of GB.
        # Chunk window-rows so in-flight scores stay ~32 MB (value-neutral,
        # same tactic as the reference's TSA/FSA chunk; the reference never
        # hits this because it separates one segment at a time).
        N = ws * ws
        swa_chunk = max(16, _chunk_target_bytes()
                        // (self.num_heads * N * N * 4))

        rng = None
        if self.dropout > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
        if self.attention_impl == "int8" and mask is None:
            windows = self._int8_block(windows, p)
        else:
            # NOTE: with use_shift_mask=True the int8 serving path falls
            # back to float compute — the int8 kernel has no masked-score
            # variant.  The parity default (use_shift_mask=False, matching
            # the reference's unused mask) always takes the int8 path.
            windows = row_transformer_block(
                windows, p, self.num_heads, chunk_size=swa_chunk,
                attention_impl=self.attention_impl, mask=mask,
                dropout_rate=self.dropout, dropout_rng=rng,
            )

        x = window_reverse(windows, ws, B, Hp, Wp)
        if ss > 0:
            x = jnp.roll(x, shift=(ss, ss), axis=(1, 2))
        if pad_h or pad_w:
            x = x[:, :H, :W]
        return x
