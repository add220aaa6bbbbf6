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
    out_ref, mid_ref=None, acc_ref=None, den_ref=None, *,
    num_heads: int, pair_heads: bool = False, int8_attn: bool = False,
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
        denT_parts = []
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
                denT_parts.append(den)
                accT_parts.append(
                    oe[:, :D, :] * pl.reciprocal(den, approx=False))
            sT = sT_next
        accT = jnp.concatenate(accT_parts, axis=1)          # (Rb, C, N)
    elif int8_attn:
        # INT8 attention core (round 4, SERVING path): on v5e the MXU runs
        # int8 x int8 -> int32 at 2x the bf16 rate (394 vs 197 TOPS), and
        # in THIS kernel the score/AV matmuls are MXU-bound (VMEM-resident
        # planes) rather than HBM-bound like the XLA int8 path — so int8
        # actually pays here at full 10 s shapes.  Dynamic symmetric
        # quantization, same construction the measured XLA int8 path uses
        # (ops/int8.py; end-to-end SDR delta < 1e-4 dB on a trained
        # checkpoint, BENCH.md round 2):
        #   - q, k, v: per-row-block scales (max|.| / 127);
        #   - probs: per-query-column scales (pT >= 0, so column max);
        #   - the softmax-denominator ones row keeps its own exact scale
        #     (127 * 1/127) so the flash denominator trick survives intact.
        f32 = jnp.float32
        qf, kf, vf = (a.astype(f32) for a in (q, k, v))
        sq = jnp.max(jnp.abs(qf), axis=(1, 2), keepdims=True) / 127.0
        sk = jnp.max(jnp.abs(kf), axis=(1, 2), keepdims=True) / 127.0
        sv = jnp.max(jnp.abs(vf), axis=(1, 2), keepdims=True) / 127.0
        qi = jnp.round(qf / sq).astype(jnp.int8)
        ki = jnp.round(kf / sk).astype(jnp.int8)
        viT = jnp.swapaxes(jnp.round(vf / sv).astype(jnp.int8), 1, 2)
        ones_i = jnp.full((Rb, 1, N), 127, jnp.int8)
        ss = sq * sk                                        # (Rb, 1, 1)

        def _scores_i8(h):
            khi = jnp.where(
                (lane >= h * D) & (lane < (h + 1) * D), ki, 0)
            return jax.lax.dot_general(
                khi, qi, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )                                               # (Rb, Nm, Nn) i32

        accT_parts = []
        denT_parts = []
        int8_av = False
        # int8 scores pay ~for free (q/k quantization is O(N*C)); int8 AV
        # measured SLOWER end-to-end — the per-column prob quantization
        # (max+round over every (N, N) plane) adds more VPU time than the
        # halved AV matmul saves (27.0 vs 24.2 ms at enc0 TSA, v5e).
        sTi = _scores_i8(0)
        for h in range(H):
            sTi_next = _scores_i8(h + 1) if h + 1 < H else None
            sT = sTi.astype(f32) * ss
            pT = jnp.exp2(jnp.minimum(sT, SCORE_CLAMP))     # (Rb, Nm, Nn) f32
            if int8_av:
                sp = jnp.max(pT, axis=1, keepdims=True) / 127.0  # per col n
                pTi = jnp.round(pT / sp).astype(jnp.int8)
                v_hiT = jnp.concatenate(
                    [viT[:, h * D:(h + 1) * D, :], ones_i], axis=1)
                oeTi = jax.lax.dot_general(
                    v_hiT, pTi, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32,
                )                                           # (Rb, D+1, Nn) i32
                # undo scales: v rows carry sv, the ones row 1/127, every
                # column sp
                oeT = oeTi.astype(f32) * sp
                denomT = oeT[:, D:D + 1, :] * (1.0 / 127.0)
                acc_h = oeT[:, :D, :] * sv
            else:
                v_hT = jnp.concatenate(
                    [vT[:, h * D:(h + 1) * D, :], ones_row], axis=1)
                oeT = jax.lax.dot_general(
                    v_hT, pT.astype(cd), (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )                                           # (Rb, D+1, Nn)
                denomT = oeT[:, D:D + 1, :]
                acc_h = oeT[:, :D, :]
            denT_parts.append(denomT)
            accT_parts.append(
                acc_h * pl.reciprocal(denomT, approx=False))
            sTi = sTi_next
        accT = jnp.concatenate(accT_parts, axis=1)          # (Rb, C, N)
    else:
        accT_parts = []
        denT_parts = []
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
            denT_parts.append(denomT)
            accT_parts.append(
                oeT[:, :D, :] * pl.reciprocal(denomT, approx=False))
            sT = sT_next
        accT = jnp.concatenate(accT_parts, axis=1)          # (Rb, C, N)
    acc = jnp.swapaxes(accT, 1, 2)                          # (Rb, N, C)
    if acc_ref is not None:
        # post-softmax attention output (pre-projection) + per-head softmax
        # denominators, exported on the training path so the fused backward
        # kernel (_fused_block_bwd_kernel) reconstructs oeT and d_denominator
        # without re-running the AV matmuls.
        acc_ref[:] = acc.astype(acc_ref.dtype)
        den_ref[:] = jnp.concatenate(denT_parts, axis=1).astype(den_ref.dtype)
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
                      pair_heads: bool | None = None,
                      int8_attn: bool = False):
    """rows (R, N, C), p: RowBlockParams-like namedtuple of arrays.

    with_mid=True (training) additionally returns the post-attention
    intermediate; the inference path keeps the single-output kernel the
    Rb measurements were taken on.  pair_heads=None (production) lets the
    autotune gate decide; True/False force the form (tools/kernel_lab.py
    A/Bs the real kernel this way instead of keeping a copy).
    int8_attn=True (SERVING only, see fused_row_block_int8) runs the
    score/AV matmuls int8 x int8 -> int32 on the MXU."""
    R, N, C = rows.shape
    dtype = rows.dtype
    hidden = p.fc1_kernel.shape[1]
    if int8_attn:
        paired = False          # int8 core is the unpaired large-N form
    elif pair_heads is None:
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
                               pair_heads=paired, int8_attn=int8_attn)
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
        out_specs=(
            (out_block, out_block, out_block,
             pl.BlockSpec((Rb, H, N), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM))
            if with_mid else out_block
        ),
        out_shape=(
            (jax.ShapeDtypeStruct((Rp, N, C), dtype),
             jax.ShapeDtypeStruct((Rp, N, C), dtype),
             jax.ShapeDtypeStruct((Rp, N, C), dtype),
             jax.ShapeDtypeStruct((Rp, H, N), jnp.float32))
            if with_mid else jax.ShapeDtypeStruct((Rp, N, C), dtype)
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
    if not with_mid:
        return res[:R] if pad else res
    out, mid, acc, den = res
    if pad:
        out, mid, acc, den = out[:R], mid[:R], acc[:R], den[:R]
    return out, mid, acc, den



# ---------------------------------------------------------------------------
# Fused block BACKWARD kernel (round 4).
#
# The round-4 grad attribution (tools/kernel_lab.py --grad, BENCH.md) showed
# the training backward is ~3 HBM round trips of (N, N) score/prob planes
# through the chunked-XLA VJP: at enc0 TSA the block grad costs 118 ms vs a
# 23 ms fused forward.  This kernel runs the whole attention-half VJP plus
# the LN2/MLP VJP in VMEM: scores are recomputed per head (flash-standard),
# probs / d_probs / d_scores never leave VMEM, and the forward's exported
# acc (post-softmax attention output) and den (per-head softmax
# denominators) let it skip the AV recompute entirely.  Param grads are
# f32-accumulated across the sequential Pallas grid (init at cell 0, +=
# after), so one kernel call returns every RowBlockParams cotangent.
# ---------------------------------------------------------------------------
_LN2 = 0.6931471805599453          # ln(2): d exp2(x)/dx = exp2(x) * ln 2
_INV_SQRT_2PI = 0.3989422804014327


def _ln_fwd_stats(xf):
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-5)
    return (xf - mean) * rstd, rstd


def _ln_bwd(d_nhat, nhat, rstd):
    """d wrt LN input given d wrt nhat = (x - mean) * rstd."""
    m1 = jnp.mean(d_nhat, axis=-1, keepdims=True)
    m2 = jnp.mean(d_nhat * nhat, axis=-1, keepdims=True)
    return rstd * (d_nhat - m1 - nhat * m2)


def _fused_block_bwd_kernel(
    x_ref, mid_ref, acc_ref, den_ref, g_ref,
    ln1s_ref, ln1b_ref, wq_ref, wk_ref, wv_ref, wo_ref,
    ln2s_ref, ln2b_ref, fc1_ref, f1b_ref, fc2_ref, f2b_ref,
    dx_ref, dln1s_ref, dln1b_ref, dwq_ref, dwk_ref, dwv_ref, dwo_ref,
    dob_ref, dln2s_ref, dln2b_ref, dfc1_ref, df1b_ref, dfc2_ref, df2b_ref,
    *, num_heads: int,
):
    Rb, N, C = x_ref.shape
    H = num_heads
    D = C // H
    hidden = fc1_ref.shape[1]
    cd = x_ref.dtype

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init_param_grads():
        for ref in (dln1s_ref, dln1b_ref, dwq_ref, dwk_ref, dwv_ref,
                    dwo_ref, dob_ref, dln2s_ref, dln2b_ref, dfc1_ref,
                    df1b_ref, dfc2_ref, df2b_ref):
            ref[:] = jnp.zeros_like(ref)

    xf = x_ref[:].astype(jnp.float32)                       # (Rb, N, C)
    g = g_ref[:].astype(jnp.float32)
    midf = mid_ref[:].astype(jnp.float32)
    acc = acc_ref[:]                                        # (Rb, N, C) cd
    ln2s = ln2s_ref[:].astype(jnp.float32)

    def flat(a):                                            # (Rb, N, X) -> 2d
        return a.reshape(Rb * N, a.shape[2])

    # ---- LN2 + MLP forward recompute, then its VJP (out = mid + h2) ----
    nhat2, rstd2 = _ln_fwd_stats(midf)
    n2 = nhat2 * ln2s + ln2b_ref[:].astype(jnp.float32)
    n2c = n2.astype(cd)
    h1pre = jax.lax.dot_general(
        n2c, fc1_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + f1b_ref[:].astype(jnp.float32)
    gl = 0.5 * (1.0 + _erf(h1pre * (2.0 ** -0.5)))          # GELU cdf factor
    h1 = (h1pre * gl).astype(cd)

    gc = g.astype(cd)
    d_h1 = jax.lax.dot_general(                             # g @ fc2^T
        gc, fc2_ref[:], (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # (Rb, N, hidden)
    dfc2_ref[:] += jax.lax.dot_general(                     # h1^T @ g
        flat(h1), flat(gc), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    df2b_ref[:] += jnp.sum(g, axis=(0, 1))
    # gelu'(x) = Phi(x) + x * phi(x)
    d_h1pre = d_h1 * (
        gl + h1pre * jnp.exp(-0.5 * h1pre * h1pre) * _INV_SQRT_2PI)
    d_h1c = d_h1pre.astype(cd)
    df1b_ref[:] += jnp.sum(d_h1pre, axis=(0, 1))
    dfc1_ref[:] += jax.lax.dot_general(                     # n2^T @ d_h1pre
        flat(n2c), flat(d_h1c), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d_n2 = jax.lax.dot_general(                             # d_h1pre @ fc1^T
        d_h1c, fc1_ref[:], (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dln2s_ref[:] += jnp.sum(d_n2 * nhat2, axis=(0, 1))
    dln2b_ref[:] += jnp.sum(d_n2, axis=(0, 1))
    d_mid = g + _ln_bwd(d_n2 * ln2s, nhat2, rstd2)          # residual + LN2

    # ---- attention half VJP: mid = x + acc @ wo + ob ----
    d_midc = d_mid.astype(cd)
    dob_ref[:] += jnp.sum(d_mid, axis=(0, 1))
    dwo_ref[:] += jax.lax.dot_general(                      # acc^T @ d_mid
        flat(acc), flat(d_midc), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d_acc = jax.lax.dot_general(                            # d_mid @ wo^T
        d_midc, wo_ref[:], (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # (Rb, N, C) f32

    # LN1 / q / k / v forward recompute (identical to the forward kernel)
    nhat1, rstd1 = _ln_fwd_stats(xf)
    n1 = nhat1 * ln1s_ref[:].astype(jnp.float32) \
        + ln1b_ref[:].astype(jnp.float32)
    normed = n1.astype(cd)
    q = jax.lax.dot_general(
        normed, wq_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cd)
    k = jax.lax.dot_general(
        normed, wk_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cd)
    v = jax.lax.dot_general(
        normed, wv_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cd)
    vT = jnp.swapaxes(v, 1, 2)                              # (Rb, C, N)
    ones_row = jnp.ones((Rb, 1, N), cd)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Rb, N, C), 2)
    den = den_ref[:]                                        # (Rb, H, N) f32
    accT = jnp.swapaxes(acc, 1, 2).astype(jnp.float32)      # (Rb, C, N)
    d_accT = jnp.swapaxes(d_acc, 1, 2)                      # (Rb, C, N) f32

    d_q = jnp.zeros((Rb, N, C), jnp.float32)
    d_k = jnp.zeros((Rb, N, C), jnp.float32)
    d_vT_parts = []

    def _kh(h):
        return jnp.where((lane >= h * D) & (lane < (h + 1) * D), k, 0) \
            .astype(cd)

    def _sT(h):
        return jax.lax.dot_general(                         # score recompute
            _kh(h), q, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                   # (Rb, Nm, Nn)

    # Software-pipelined like the forward: head h+1's score matmul (MXU)
    # is emitted before head h's exp2/softmax-VJP (VPU) so the units
    # overlap across the loop.
    sT = _sT(0)
    for h in range(H):
        kh = _kh(h)
        sT_next = _sT(h + 1) if h + 1 < H else None
        pT = jnp.exp2(jnp.minimum(sT, SCORE_CLAMP))

        den_h = den[:, h:h + 1, :]                          # (Rb, 1, N)
        r_h = pl.reciprocal(den_h, approx=False)
        acc_hT = accT[:, h * D:(h + 1) * D, :]              # (Rb, D, N)
        d_acc_hT = d_accT[:, h * D:(h + 1) * D, :]
        oe_top = acc_hT * den_h                             # undo the 1/den
        d_oe_top = d_acc_hT * r_h
        d_den = -r_h * jnp.sum(d_acc_hT * acc_hT, axis=1, keepdims=True)
        d_oe2 = jnp.concatenate([d_oe_top, d_den], axis=1).astype(cd)
        del oe_top

        v2_h = jnp.concatenate([vT[:, h * D:(h + 1) * D, :], ones_row],
                               axis=1)                      # (Rb, D+1, Nm)
        d_pT = jax.lax.dot_general(                         # v2^T @ d_oe2
            v2_h, d_oe2, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                   # (Rb, Nm, Nn)
        d_sT = jnp.where(sT < SCORE_CLAMP, d_pT * pT * _LN2, 0.0)
        d_sTc = d_sT.astype(cd)
        pTc = pT.astype(cd)
        # sT[m, n] = sum_c kh[m, c] q[n, c]
        d_q = d_q + jax.lax.dot_general(                    # d_sT^T @ kh
            d_sTc, kh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                   # (Rb, Nn, C)
        d_kh = jax.lax.dot_general(                         # d_sT @ q
            d_sTc, q, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                   # (Rb, Nm, C)
        d_k = d_k + jnp.where(
            (lane >= h * D) & (lane < (h + 1) * D), d_kh, 0.0)
        d_v2 = jax.lax.dot_general(                         # d_oe2 @ pT^T
            d_oe2, pTc, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                   # (Rb, D+1, Nm)
        d_vT_parts.append(d_v2[:, :D, :])
        sT = sT_next

    d_v = jnp.swapaxes(jnp.concatenate(d_vT_parts, axis=1), 1, 2)

    d_qc, d_kc, d_vc = (a.astype(cd) for a in (d_q, d_k, d_v))
    d_normed = (
        jax.lax.dot_general(d_qc, wq_ref[:], (((2,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(d_kc, wk_ref[:], (((2,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        + jax.lax.dot_general(d_vc, wv_ref[:], (((2,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    )
    nc = normed  # cd
    dwq_ref[:] += jax.lax.dot_general(
        flat(nc), flat(d_qc), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwk_ref[:] += jax.lax.dot_general(
        flat(nc), flat(d_kc), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwv_ref[:] += jax.lax.dot_general(
        flat(nc), flat(d_vc), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dln1s_ref[:] += jnp.sum(d_normed * nhat1, axis=(0, 1))
    dln1b_ref[:] += jnp.sum(d_normed, axis=(0, 1))

    dx = d_mid + _ln_bwd(
        d_normed * ln1s_ref[:].astype(jnp.float32), nhat1, rstd1)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _analytic_bwd_row_block(N: int, C: int, mlp_hidden: int) -> int:
    """VMEM-bound Rb for the backward kernel: ~3 live (N, N) f32 planes
    (sT/pT + d_pT + d_sT before reuse) plus ~20 O(N*C) tensors and two
    O(N*hidden)."""
    per_row = (
        3 * N * _align128(N) * 4
        + 22 * N * _align128(C) * 4
        + 3 * N * _align128(mlp_hidden) * 4
    )
    cap = (4 * _VMEM_BUDGET) // max(per_row, 1)
    return max(1, min(32, cap))


def _bwd_row_block(N: int, C: int, mlp_hidden: int, dtype) -> int:
    sublane = 16 if dtype == jnp.bfloat16 else 8
    if N % sublane != 0:
        return 1
    from . import autotune

    tuned = autotune.row_block(N, C, jnp.dtype(dtype).name, mlp_hidden, 1,
                               variant="bwd")
    if tuned is not None:
        return tuned
    return _analytic_bwd_row_block(N, C, mlp_hidden)


def _pallas_bwd_profitable(N: int, C: int, dtype, R: int) -> bool:
    """Routing gate for the fused backward kernel vs the chunked-XLA VJP.
    Measured per chip (tools/autotune.py, "bwd_route"); without a
    measurement the kernel stays OFF (the XLA path is the proven
    fallback).  An r-bucketed entry wins over the R-free one, mirroring
    attn_route: the crop_pow2 training shapes share (N, C) with parity
    stages at different row counts (e.g. enc1 T-arm (512, 64) at R=1024
    cropped vs R=431 parity), and one unqualified key must not let either
    regime decide the other's route."""
    from . import autotune

    name = jnp.dtype(dtype).name
    rkey = f"{N},{C},{name},r{autotune.r_bucket(R)}"
    # Exhaust both key forms per level (local cache, then shipped) so a
    # shipped r-bucketed entry never shadows a local R-free measurement.
    for level in (autotune._load(), autotune._SHIPPED):
        v = autotune.lookup_in(level, "bwd_route", rkey)
        if v is None:
            v = autotune.lookup_in(level, "bwd_route", f"{N},{C},{name}")
        if v is not None:
            return str(v) == "pallas"
    return False


def _fused_block_bwd_impl(rows, mid, acc, den, g, p, num_heads: int):
    """Run the fused backward kernel; returns (d_rows, dp) with dp shaped
    like RowBlockParams (qkv re-assembled, wq grad re-scaled)."""
    R, N, C = rows.shape
    dtype = rows.dtype
    hidden = p.fc1_kernel.shape[1]
    H = num_heads
    D = C // H
    scale = (D ** -0.5) * 1.4426950408889634
    wq = p.qkv_kernel[:, :C].astype(jnp.float32) * scale
    wk = p.qkv_kernel[:, C:2 * C]
    wv = p.qkv_kernel[:, 2 * C:]

    Rb = _bwd_row_block(N, C, hidden, dtype)
    pad = (-R) % Rb
    if pad:
        z = lambda a: jnp.pad(a, ((0, pad), (0, 0), (0, 0)))
        rows, mid, acc, g = z(rows), z(mid), z(acc), z(g)
        # padded rows must keep den finite (1/den rides the VJP); their
        # cotangents are zero so they contribute nothing to any grad
        den = jnp.pad(den, ((0, pad), (0, 0), (0, 0)), constant_values=1.0)
    Rp = R + pad

    def bcast(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    row_block = pl.BlockSpec((Rb, N, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    den_block = pl.BlockSpec((Rb, H, N), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_fused_block_bwd_kernel, num_heads=num_heads),
        grid=(Rp // Rb,),
        interpret=default_interpret(),
        # the whole-block VJP holds ~3 (N, N) f32 planes plus ~22 O(N*C)
        # tensors per cell: 17.7 MB at N=1025 — over Mosaic's 16 MB default
        # scoped-vmem limit but far under the chip's 128 MB VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            row_block, row_block, row_block, den_block, row_block,
            bcast((C,)), bcast((C,)),
            bcast((C, C)), bcast((C, C)), bcast((C, C)), bcast((C, C)),
            bcast((C,)), bcast((C,)),
            bcast((C, hidden)), bcast((hidden,)),
            bcast((hidden, C)), bcast((C,)),
        ],
        out_specs=(
            row_block,
            bcast((C,)), bcast((C,)),
            bcast((C, C)), bcast((C, C)), bcast((C, C)), bcast((C, C)),
            bcast((C,)), bcast((C,)), bcast((C,)),
            bcast((C, hidden)), bcast((hidden,)),
            bcast((hidden, C)), bcast((C,)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Rp, N, C), dtype),
            jax.ShapeDtypeStruct((C,), f32), jax.ShapeDtypeStruct((C,), f32),
            jax.ShapeDtypeStruct((C, C), f32),
            jax.ShapeDtypeStruct((C, C), f32),
            jax.ShapeDtypeStruct((C, C), f32),
            jax.ShapeDtypeStruct((C, C), f32),
            jax.ShapeDtypeStruct((C,), f32),
            jax.ShapeDtypeStruct((C,), f32), jax.ShapeDtypeStruct((C,), f32),
            jax.ShapeDtypeStruct((C, hidden), f32),
            jax.ShapeDtypeStruct((hidden,), f32),
            jax.ShapeDtypeStruct((hidden, C), f32),
            jax.ShapeDtypeStruct((C,), f32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * N * (num_heads * (2 * C * C + 8 * N * C)
                                + 6 * C * C + 6 * C * hidden),
            bytes_accessed=Rp * N * C * 2 * 5,
            transcendentals=Rp * num_heads * N * N,
        ),
    )(
        rows, mid, acc, den, g,
        p.norm1_scale.astype(dtype), p.norm1_bias.astype(dtype),
        wq.astype(dtype), wk.astype(dtype), wv.astype(dtype),
        p.proj_kernel.astype(dtype),
        p.norm2_scale.astype(dtype), p.norm2_bias.astype(dtype),
        p.fc1_kernel.astype(dtype), p.fc1_bias.astype(dtype),
        p.fc2_kernel.astype(dtype), p.fc2_bias.astype(dtype),
    )
    (dx, dln1s, dln1b, dwq, dwk, dwv, dwo, dob, dln2s, dln2b,
     dfc1, df1b, dfc2, df2b) = outs
    if pad:
        dx = dx[:R]
    # d qkv[:, :C] = d wq_scaled * scale (wq_scaled = qkv[:, :C] * scale)
    dqkv = jnp.concatenate([dwq * scale, dwk, dwv], axis=1)

    def like(a, ref):
        return a.astype(ref.dtype)

    dp = type(p)(
        norm1_scale=like(dln1s, p.norm1_scale),
        norm1_bias=like(dln1b, p.norm1_bias),
        qkv_kernel=like(dqkv, p.qkv_kernel),
        proj_kernel=like(dwo, p.proj_kernel),
        proj_bias=like(dob, p.proj_bias),
        norm2_scale=like(dln2s, p.norm2_scale),
        norm2_bias=like(dln2b, p.norm2_bias),
        fc1_kernel=like(dfc1, p.fc1_kernel),
        fc1_bias=like(df1b, p.fc1_bias),
        fc2_kernel=like(dfc2, p.fc2_kernel),
        fc2_bias=like(df2b, p.fc2_bias),
    )
    return dx, dp


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
    # The kernel exports the post-attention intermediate (mid), the
    # post-softmax attention output (acc) and the per-head softmax
    # denominators (den) alongside the output: the fused backward kernel
    # (round 4) starts from them without re-running the AV matmuls, and the
    # MLP half differentiates from mid directly.  Under nn.remat the
    # residuals are not stored — the block forward (one Pallas call) is
    # recomputed at backward time, which is still far cheaper than a second
    # chunked-XLA attention pass.
    out, mid, acc, den = _fused_block_impl(rows, p, num_heads, with_mid=True)
    return out, (rows, mid, acc, den, p)


def _bwd(num_heads, residuals, g):
    # Two measured routes (gated per shape by "bwd_route",
    # tools/autotune.py):
    #   - the fused Pallas backward kernel (_fused_block_bwd_kernel): the
    #     whole attention-half VJP + LN2/MLP VJP in VMEM, probs and score
    #     cotangents never touch HBM (round 4 — the grad attribution showed
    #     the XLA VJP costs ~3 HBM round trips of (N, N) planes);
    #   - the chunked-XLA remat path (the proven fallback; round-2/3
    #     default), memory-targeted effective chunk.
    rows, mid, acc, den, p = residuals
    N, C = rows.shape[1], rows.shape[2]
    if _pallas_bwd_profitable(N, C, rows.dtype, rows.shape[0]):
        return _fused_block_bwd_impl(rows, mid, acc, den, g, p, num_heads)
    _, mlp_vjp = jax.vjp(lambda m, pp: _xla_mlp_half(m, pp), mid, p)
    d_mid, dp_mlp = mlp_vjp(g)
    _, attn_vjp = jax.vjp(
        lambda r, pp: _xla_attn_half(r, pp, num_heads), rows, p
    )
    d_rows, dp_attn = attn_vjp(d_mid)
    dp = jax.tree_util.tree_map(jnp.add, dp_mlp, dp_attn)
    return d_rows, dp


fused_row_block.defvjp(_fwd, _bwd)


def fused_row_block_int8(rows, p, num_heads):
    """SERVING-only fused block with the int8 attention core (no custom
    VJP — training always uses the bf16/f32 paths).  Interpret-mode
    fidelity vs the f32 fused path: ~2e-4 relative; same dynamic
    symmetric quantization family as the measured XLA int8 path
    (end-to-end SDR delta < 1e-4 dB, BENCH.md round 2)."""
    return _fused_block_impl(rows, p, num_heads, int8_attn=True)
