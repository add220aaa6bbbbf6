"""Fully-fused row-transformer-block Pallas kernel.

One grid cell computes the ENTIRE pre-LN transformer block for a block of
independent rows (reference: attention.py:93-164 — LN1 -> MHA -> +residual ->
LN2 -> MLP -> +residual), instead of round-tripping activations through HBM
between LN / attention / MLP as separate XLA ops.  At stage-1 shapes each
(B, 1025, 862, 32) activation tensor is ~57 MB/bf16-batch-item, so every
fused boundary removes two HBM passes plus XLA dispatch.

Attention core (round-3 "rank-D pipelined" form, measured fastest across
all model shapes on v5e — tools/kernel_lab.py):
  - scores come from the FACTORED form s_h = (x Wq_h)(x Wk_h)^T / sqrt(D):
    Q and K are projected ONCE with two lane-dense (C, C) matmuls, and each
    head's score matmul contracts a lane-masked K against Q — this replaces
    the 8 per-head x @ A_h "t" matmuls of the bilinear form (A_h = Wq_h
    Wk_h^T) with 2 matmuls + 8 trivial VPU masks;
  - the head loop is software-pipelined: head h+1's score matmul (MXU) is
    emitted before head h's exp2 (VPU) so the units overlap;
  - softmax is max-free exp2 (Wq carries log2(e)/sqrt(D)), with scores
    clamped at SCORE_CLAMP so a pathological score spike saturates instead
    of overflowing exp2 to inf/NaN (the shift-free form is exact in exact
    arithmetic; bf16/f32 relative precision is scale-invariant);
  - the softmax denominator rides the AV matmul as an appended ones row
    (transposed-AV layout: keys on sublanes, queries on lanes, each head's
    AV produces only its own D+1 sublane rows);
  - the LN1 result never leaves VMEM, so the attention input load is free.

Backward: custom VJP over the composed block — the chunked-XLA remat path
(_xla_block), whose memory-targeted effective chunk measured fastest at
every model shape (BENCH.md round 2).  Values match the XLA path by the
equivalence tests in tests/test_fused_block.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._compat import default_interpret

_VMEM_BUDGET = 11 * 1024 * 1024

# Max-free exp2 softmax overflow guard, in log2 units: exp2(110) * N stays
# below f32 max for N <= 2^17 keys, so denominators never overflow either.
# Natural-unit scores up to ~76 pass through exactly (trained scores are
# O(20)); beyond that the softmax saturates instead of going NaN.
SCORE_CLAMP = 110.0


def _align128(n: int) -> int:
    return ((n + 127) // 128) * 128


def _pair_heads_profitable(N: int, C: int, num_heads: int) -> bool:
    """Whether the fused kernel pairs heads two-per-MXU-tile (see the
    pair_heads branch of _fused_block_kernel).  Gated to shapes where a
    head's (N, C) @ (C, N) score matmul underfills one 128x128 tile; a
    per-chip autotune entry ("fused_pair") overrides the default."""
    if 2 * N > 128 or num_heads % 2 or N % 8:
        return False
    from . import autotune

    tuned = autotune.lookup("fused_pair", f"{N},{C}")
    if tuned is not None:
        return bool(tuned)
    return True


def _row_block(N: int, C: int, mlp_hidden: int, dtype,
               unroll: int = 1, n_outputs: int = 1,
               paired: bool = False) -> int:
    """Rows per grid cell.  The head loop keeps ~2*unroll live (N, N) f32
    planes (scores + probs per unrolled head); everything else is O(N*C).
    Rb > 1 additionally requires N sublane-aligned (Mosaic merges (Rb, N)
    when lowering the batched dots).

    A measured per-chip override (ops/pallas/autotune.py) wins over the
    analytic VMEM bound — the bound is conservative at small N where lane
    padding dominates the estimate (the v5e sweep's winners run up to 2.6x
    above the bound's pick at SWA shapes).  Overrides are keyed by
    (N, C, dtype, mlp_hidden, n_outputs) so a bf16/ratio-4 measurement is
    never reused where the VMEM-per-row differs; legacy single-output
    measurements used for the two-output training kernel are capped at the
    analytic bound, which stays safely inside the scoped-VMEM limit."""
    sublane = 16 if dtype == jnp.bfloat16 else 8
    if N % sublane != 0:
        return 1
    from . import autotune

    dtype_name = jnp.dtype(dtype).name
    analytic = _analytic_row_block(N, C, mlp_hidden, unroll, paired)
    variant = "hpair" if paired else ""
    tuned = autotune.row_block(N, C, dtype_name, mlp_hidden, n_outputs,
                               variant=variant)
    if tuned is not None:
        directly_measured = autotune.lookup(
            "row_block",
            autotune.full_key(N, C, dtype_name, mlp_hidden, n_outputs,
                              variant),
        ) is not None
        if directly_measured:
            return tuned
        return min(tuned, analytic) if n_outputs > 1 else tuned
    return analytic


def _analytic_row_block(N: int, C: int, mlp_hidden: int,
                        unroll: int = 1, paired: bool = False) -> int:
    """The conservative VMEM-bound Rb (no measured override)."""
    # paired: the live score planes are (2N, align128(2N)) instead of
    # (N, align128(N)) — 2x at N=64 — and the AV output doubles too.
    sN, sA = (2 * N, _align128(2 * N)) if paired else (N, _align128(N))
    per_row = (
        2 * unroll * sN * sA * 4
        + 14 * N * _align128(C) * 4
        + 2 * N * _align128(mlp_hidden) * 4
    )
    cap = _VMEM_BUDGET // max(per_row, 1)
    return max(1, min(32, cap))




def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs err 1.5e-7): Mosaic
    lowers neither erf nor erfc, and 1.5e-7 is far below bf16 resolution."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _fused_block_kernel(
    x_ref, ln1s_ref, ln1b_ref, wq_ref, wk_ref, wv_ref, wo_ref, ob_ref,
    ln2s_ref, ln2b_ref, fc1_ref, f1b_ref, fc2_ref, f2b_ref,
    out_ref, mid_ref=None, *, num_heads: int, pair_heads: bool = False,
):
    Rb, N, C = x_ref.shape
    H = num_heads
    D = C // H
    cd = x_ref.dtype

    xf = x_ref[:].astype(jnp.float32)                       # (Rb, N, C)

    # --- LN1 (f32 statistics, matching models/attention._layer_norm) ---
    mean1 = jnp.mean(xf, axis=-1, keepdims=True)
    var1 = jnp.var(xf, axis=-1, keepdims=True)
    n1 = (xf - mean1) * jax.lax.rsqrt(var1 + 1e-5)
    n1 = n1 * ln1s_ref[:].astype(jnp.float32) + ln1b_ref[:].astype(jnp.float32)
    normed = n1.astype(cd)

    # --- attention: rank-D factored flash, scores never leave VMEM ---
    # Q/K/V are projected once with lane-dense (C, C) matmuls; wq arrives
    # pre-scaled by log2(e)/sqrt(D) (see _fused_block_impl).  Per-head
    # scores contract a lane-masked K against Q over the full C lanes —
    # zeros outside head h's D lanes make the contraction per-head exact
    # while keeping one static matmul shape for every head.
    q = jax.lax.dot_general(
        normed, wq_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cd)                                            # (Rb, N, C)
    k = jax.lax.dot_general(
        normed, wk_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cd)
    v = jax.lax.dot_general(
        normed, wv_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cd)                                            # (Rb, N, C)
    vT = jnp.swapaxes(v, 1, 2)                              # (Rb, C, N)
    ones_row = jnp.ones((Rb, 1, N), cd)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Rb, N, C), 2)

    def _scores(h):
        # Transposed layout: keys m on sublanes, queries n on lanes; the
        # softmax reduction and the AV contraction both run over sublanes.
        kh = jnp.where((lane >= h * D) & (lane < (h + 1) * D), k, 0) \
            .astype(cd)
        return jax.lax.dot_general(
            kh, q, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                   # (Rb, Nm, Nn) f32

    # Software-pipelined head loop: head h+1's score matmul (MXU) is
    # emitted BEFORE head h's exp2 (VPU) so the VLIW scheduler can overlap
    # the two units; VMEM holds two live (N, N) f32 planes (budgeted in
    # _row_block).  The appended ones row carries the softmax denominator
    # out of the AV matmul (flash trick); each head's transposed AV
    # produces only its own D+1 SUBLANE rows (16x less executed AV volume
    # than the lane-padded form).
    if pair_heads:
        # Head-PAIRED small-N form (round 4): at SWA shapes (N = 64) each
        # per-head score matmul occupies one 128x128 MXU tile at 6.25%
        # utilization.  Heads (2p, 2p+1) have disjoint lane masks, so
        # stacking their masked K along the key dim yields one
        # (2N, C) @ (C, N) matmul whose (N, N) sublane-halves are the two
        # heads' exact scores — half the executed score tiles.  Q is NOT
        # duplicated along the query dim: the duplicated columns would be
        # identical (same q against the same masked-K stack), so the
        # narrow form computes the same scores at half the exp2 volume
        # and half the live-plane VMEM.  Each head's AV then contracts
        # the full 2N = 128 key sublanes with the other head's key
        # columns zeroed in its V rows, so every extracted output part
        # sits at vector offset (0, 0) — Mosaic's tpu.concatenate
        # requires matching input offsets on non-concat dims (the
        # previous diagonal-block form failed to compile on hardware).
        zeros_dn = jnp.zeros((Rb, D + 1, N), cd)

        def _pair_scores(pr):
            a, b = 2 * pr, 2 * pr + 1
            ka = jnp.where((lane >= a * D) & (lane < (a + 1) * D), k, 0)
            kb = jnp.where((lane >= b * D) & (lane < (b + 1) * D), k, 0)
            khh = jnp.concatenate([ka, kb], axis=1).astype(cd)
            return jax.lax.dot_general(
                khh, q, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                               # (Rb, 2Nm, Nn)

        accT_parts = []
        sT = _pair_scores(0)
        for pr in range(H // 2):
            sT_next = _pair_scores(pr + 1) if pr + 1 < H // 2 else None
            pT = jnp.exp2(jnp.minimum(sT, SCORE_CLAMP)).astype(cd)
            a, b = 2 * pr, 2 * pr + 1
            va = jnp.concatenate(
                [vT[:, a * D:(a + 1) * D, :], ones_row], axis=1)
            vb = jnp.concatenate(
                [vT[:, b * D:(b + 1) * D, :], ones_row], axis=1)
            # head a weights live in pT's first N key sublanes, head b's
            # in the last N; zero columns keep the cross terms out.
            v2a = jnp.concatenate([va, zeros_dn], axis=2)   # (Rb, D+1, 2Nm)
            v2b = jnp.concatenate([zeros_dn, vb], axis=2)
            for vv in (v2a, v2b):
                oe = jax.lax.dot_general(
                    vv, pT, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )                                           # (Rb, D+1, Nn)
                den = oe[:, D:D + 1, :]
                accT_parts.append(
                    oe[:, :D, :] * pl.reciprocal(den, approx=False))
            sT = sT_next
        accT = jnp.concatenate(accT_parts, axis=1)          # (Rb, C, N)
    else:
        accT_parts = []
        sT = _scores(0)
        for h in range(H):
            sT_next = _scores(h + 1) if h + 1 < H else None
            pT = jnp.exp2(jnp.minimum(sT, SCORE_CLAMP)).astype(cd)
            v_hT = jnp.concatenate(
                [vT[:, h * D:(h + 1) * D, :], ones_row], axis=1
            )                                               # (Rb, D+1, Nm)
            oeT = jax.lax.dot_general(
                v_hT, pT, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                               # (Rb, D+1, Nn)
            denomT = oeT[:, D:D + 1, :]
            accT_parts.append(
                oeT[:, :D, :] * pl.reciprocal(denomT, approx=False))
            sT = sT_next
        accT = jnp.concatenate(accT_parts, axis=1)          # (Rb, C, N)
    acc = jnp.swapaxes(accT, 1, 2)                          # (Rb, N, C)
    attn = jax.lax.dot_general(
        acc.astype(cd), wo_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + ob_ref[:].astype(jnp.float32)

    y = xf + attn                                           # residual 1 (f32)
    if mid_ref is not None:
        # post-attention intermediate, exported (training path only) so the
        # backward can start the MLP half's VJP from it instead of
        # recomputing the attention forward
        mid_ref[:] = y.astype(mid_ref.dtype)

    # --- LN2 + MLP ---
    mean2 = jnp.mean(y, axis=-1, keepdims=True)
    var2 = jnp.var(y, axis=-1, keepdims=True)
    n2 = (y - mean2) * jax.lax.rsqrt(var2 + 1e-5)
    n2 = n2 * ln2s_ref[:].astype(jnp.float32) + ln2b_ref[:].astype(jnp.float32)
    h1 = jax.lax.dot_general(
        n2.astype(cd), fc1_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + f1b_ref[:].astype(jnp.float32)
    # torch-exact erf GELU via rational erf (erf/erfc unlowered in Mosaic)
    h1 = (0.5 * h1 * (1.0 + _erf(h1 * (2.0 ** -0.5)))).astype(cd)
    h2 = jax.lax.dot_general(
        h1, fc2_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + f2b_ref[:].astype(jnp.float32)

    out_ref[:] = (y + h2).astype(out_ref.dtype)


def _bilinear_weights(qkv_kernel, num_heads: int):
    """A (H, C, C) with A_h = Wq_h Wk_h^T / sqrt(D), plus Wv (C, C)."""
    C = qkv_kernel.shape[0]
    H = num_heads
    D = C // H
    wq = qkv_kernel[:, :C].astype(jnp.float32)
    wk = qkv_kernel[:, C: 2 * C].astype(jnp.float32)
    wv = qkv_kernel[:, 2 * C:]
    wq_h = wq.reshape(C, H, D).transpose(1, 0, 2)           # (H, C, D)
    wk_h = wk.reshape(C, H, D).transpose(1, 0, 2)
    a = jnp.einsum("hcd,hed->hce", wq_h, wk_h) * (D ** -0.5)
    return a, wv


def _fused_block_impl(rows, p, num_heads: int, with_mid: bool = False,
                      pair_heads: bool | None = None):
    """rows (R, N, C), p: RowBlockParams-like namedtuple of arrays.

    with_mid=True (training) additionally returns the post-attention
    intermediate; the inference path keeps the single-output kernel the
    Rb measurements were taken on.  pair_heads=None (production) lets the
    autotune gate decide; True/False force the form (tools/kernel_lab.py
    A/Bs the real kernel this way instead of keeping a copy)."""
    R, N, C = rows.shape
    dtype = rows.dtype
    hidden = p.fc1_kernel.shape[1]
    if pair_heads is None:
        paired = _pair_heads_profitable(N, C, num_heads)
    else:
        paired = bool(pair_heads) and 2 * N <= 128 \
            and num_heads % 2 == 0 and N % 8 == 0
    Rb = _row_block(N, C, hidden, dtype, n_outputs=2 if with_mid else 1,
                    paired=paired)
    pad = (-R) % Rb
    padded = jnp.pad(rows, ((0, pad), (0, 0), (0, 0))) if pad else rows
    Rp = R + pad

    H = num_heads
    D = C // H
    # wq carries the softmax scale and the exp2 base change: log2(e)/sqrt(D)
    wq = p.qkv_kernel[:, :C].astype(jnp.float32) \
        * ((D ** -0.5) * 1.4426950408889634)
    wk = p.qkv_kernel[:, C:2 * C]
    wv = p.qkv_kernel[:, 2 * C:]

    def bcast(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)

    out_block = pl.BlockSpec((Rb, N, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    kernel = functools.partial(_fused_block_kernel, num_heads=num_heads,
                               pair_heads=paired)
    res = pl.pallas_call(
        kernel,
        grid=(Rp // Rb,),
        interpret=default_interpret(),
        in_specs=[
            pl.BlockSpec((Rb, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            bcast((C,)), bcast((C,)),
            bcast((C, C)), bcast((C, C)),
            bcast((C, C)), bcast((C, C)), bcast((C,)),
            bcast((C,)), bcast((C,)),
            bcast((C, hidden)), bcast((hidden,)),
            bcast((hidden, C)), bcast((C,)),
        ],
        out_specs=(out_block, out_block) if with_mid else out_block,
        out_shape=(
            (jax.ShapeDtypeStruct((Rp, N, C), dtype),) * 2 if with_mid
            else jax.ShapeDtypeStruct((Rp, N, C), dtype)
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * N * (num_heads * (C * C + 2 * N * C)
                                + 2 * C * C + 2 * C * hidden),
            bytes_accessed=Rp * N * C * 2 * 2,
            transcendentals=Rp * num_heads * N * N,
        ),
    )(
        padded,
        p.norm1_scale.astype(dtype), p.norm1_bias.astype(dtype),
        wq.astype(dtype), wk.astype(dtype),
        wv.astype(dtype), p.proj_kernel.astype(dtype),
        p.proj_bias.astype(dtype),
        p.norm2_scale.astype(dtype), p.norm2_bias.astype(dtype),
        p.fc1_kernel.astype(dtype), p.fc1_bias.astype(dtype),
        p.fc2_kernel.astype(dtype), p.fc2_bias.astype(dtype),
    )
    out, mid = res if with_mid else (res, None)
    if pad:
        out = out[:R]
        mid = mid[:R] if with_mid else None
    return (out, mid) if with_mid else out


def _xla_attn_half(rows, p, num_heads: int, chunk: int = 16):
    """rows + MHA(LN1(rows)) via the chunked-XLA path (backward remat).

    Matches models/attention.row_transformer_block's XLA branch exactly,
    including the memory-targeted effective chunk (chunk=1 at full
    resolution: 4.5x less HBM traffic than the reference's fixed 16).
    """
    from ...models.attention import _effective_chunk, _layer_norm, mha_rows

    normed = _layer_norm(rows, p.norm1_scale, p.norm1_bias)
    R = rows.shape[0]
    chunk = _effective_chunk(chunk, rows.shape[1], num_heads)
    if R <= chunk:
        attn = mha_rows(normed, p.qkv_kernel, p.proj_kernel, p.proj_bias,
                        num_heads)
    else:
        pad = (-R) % chunk
        padded = jnp.pad(normed, ((0, pad), (0, 0), (0, 0)))
        chunks = padded.reshape(-1, chunk, *padded.shape[1:])
        attn = jax.lax.map(
            jax.checkpoint(
                lambda c: mha_rows(c, p.qkv_kernel, p.proj_kernel,
                                   p.proj_bias, num_heads)
            ),
            chunks,
        )
        attn = attn.reshape(-1, *padded.shape[1:])[:R]
    return rows + attn


def _xla_mlp_half(rows, p):
    """rows + MLP(LN2(rows)) — the block's second half."""
    from ...models.attention import _layer_norm
    from ...models.layers import gelu

    dtype = rows.dtype
    h = _layer_norm(rows, p.norm2_scale, p.norm2_bias)
    h = jnp.einsum("rnc,ck->rnk", h, p.fc1_kernel.astype(dtype)) \
        + p.fc1_bias.astype(dtype)
    h = gelu(h)
    h = jnp.einsum("rnk,kc->rnc", h, p.fc2_kernel.astype(dtype)) \
        + p.fc2_bias.astype(dtype)
    return rows + h


def _xla_block(rows, p, num_heads: int, chunk: int = 16):
    """Chunked-XLA computation of the full block (forward equivalence
    reference for tests; the backward differentiates the two halves)."""
    return _xla_mlp_half(_xla_attn_half(rows, p, num_heads, chunk), p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_row_block(rows, p, num_heads):
    """Full pre-LN transformer block over independent rows (R, N, C).

    rows + MHA(LN1(rows)); then + MLP(LN2(.)) — one fused Pallas kernel
    (reference behaviour: attention.py:130-164).  p is a RowBlockParams.
    """
    return _fused_block_impl(rows, p, num_heads)


def _fwd(rows, p, num_heads):
    # The kernel exports the post-attention intermediate (mid) alongside the
    # output: saving it lets the backward differentiate the MLP half from
    # mid directly, so the expensive chunked attention forward runs ONCE in
    # the backward (the jax.vjp primal pass) instead of twice.  Under
    # nn.remat the residuals are not stored — the block forward (one Pallas
    # call) is recomputed at backward time, which is still far cheaper than
    # a second chunked-XLA attention pass.
    out, mid = _fused_block_impl(rows, p, num_heads, with_mid=True)
    return out, (rows, mid, p)


def _bwd(num_heads, residuals, g):
    # Differentiate the composed block via the chunked-XLA remat path: the
    # memory-targeted effective chunk (chunk=1 at full resolution) measured
    # faster than a fused Pallas backward at every model shape (BENCH.md
    # round 2), so the Pallas backward kernel was removed in round 3.
    rows, mid, p = residuals
    _, mlp_vjp = jax.vjp(lambda m, pp: _xla_mlp_half(m, pp), mid, p)
    d_mid, dp_mlp = mlp_vjp(g)
    _, attn_vjp = jax.vjp(
        lambda r, pp: _xla_attn_half(r, pp, num_heads), rows, p
    )
    d_rows, dp_attn = attn_vjp(d_mid)
    dp = jax.tree_util.tree_map(jnp.add, dp_mlp, dp_attn)
    return d_rows, dp


fused_row_block.defvjp(_fwd, _bwd)
