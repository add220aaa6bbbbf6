"""Kernel lab: parameterized attention/block experiments on real TPU.

One tool (round 4) replacing the round-2/3 one-off generations
(kernel_lab2-5, kernel_ablation, block_ablation{,2}, ablation_avt,
rb_probe — ~2.1k LoC; every finding they produced is preserved in
BENCH.md).  Three modes:

    python tools/kernel_lab.py                       # time variants
    python tools/kernel_lab.py --check               # CPU/interpret equivalence
    python tools/kernel_lab.py --ablate              # stage ablation (prod form)
    python tools/kernel_lab.py --variants prod,hpair --shapes SWA

Variants:
  prod      production fused_row_block (rank-D pipelined; control)
  xla       chunked-XLA block path (_xla_block)
  hpair     production kernel with head-pairing FORCED on (prod routes
            pairing via the autotune "fused_pair" gate; this pins the A/B
            regardless of cache state).  See fused_block.py's pair_heads
            branch for the form: masked-K stacks of heads (2p, 2p+1) give
            one (2N, C) @ (C, N) score matmul — half the executed score
            tiles at N=64 — and each head's AV contracts the full
            2N = 128 key sublanes with the other head's columns zeroed.
  nopair    production kernel with head-pairing FORCED off.
  exp2bf16  prod with exp2 taken on bf16 scores.  DIAGNOSTIC ONLY (is a
            shape VPU-bound?): at trained-score magnitudes (log2 scores
            O(30)) the bf16 softmax arg loses up to 3.6% of weight mass
            (measured numerically) — disqualified as a serving default.

The stage ablation (--ablate) reuses the round-1 methodology on the
current production form: qkv-only -> +score matmuls -> +exp2 -> full,
locating whether a shape is MXU- (scores) or VPU- (exp2) bound.
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; honor an explicit
# cpu request (e.g. correctness --check without the TPU tunnel) the same
# way tests/conftest.py does, before any backend initializes.
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfswa_tpu.models.attention import RowBlockParams
from tfswa_tpu.ops.pallas.fused_block import (
    SCORE_CLAMP, _erf, _fused_block_impl, _row_block, _xla_block,
    fused_row_block,
)
from tfswa_tpu.ops.pallas._compat import default_interpret

SHAPES = [
    ("enc0 TSA", 862, 1025, 32, 8),
    ("enc0 FSA", 1025, 862, 32, 8),
    ("enc0 SWA", 13932, 64, 32, 8),
    ("enc1 TSA", 431, 512, 64, 8),
    ("enc1 SWA", 3456, 64, 64, 8),
    ("enc2 TSA", 216, 256, 128, 8),
    ("enc2 SWA", 1024, 64, 128, 8),
    ("bottleneck TSA", 108, 128, 256, 8),
    ("bottleneck SWA", 256, 64, 256, 8),
]


def _ln(xf, s_ref, b_ref):
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    n = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    return n * s_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)


def _mlp_tail(y, ln2s_ref, ln2b_ref, fc1_ref, f1b_ref, fc2_ref, f2b_ref, cd):
    n2 = _ln(y, ln2s_ref, ln2b_ref)
    h1 = jax.lax.dot_general(
        n2.astype(cd), fc1_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + f1b_ref[:].astype(jnp.float32)
    h1 = (0.5 * h1 * (1.0 + _erf(h1 * (2.0 ** -0.5)))).astype(cd)
    h2 = jax.lax.dot_general(
        h1, fc2_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + f2b_ref[:].astype(jnp.float32)
    return y + h2


# --------------------------------------------------------------------------
# prod-form kernel body, parameterized for ablation (stage=qkv|scores|exp2)
# and the exp2bf16 probe.  stage="full" reproduces _fused_block_kernel.
# --------------------------------------------------------------------------
def _kernel_prod(
    x_ref, ln1s_ref, ln1b_ref, wq_ref, wk_ref, wv_ref, wo_ref, ob_ref,
    ln2s_ref, ln2b_ref, fc1_ref, f1b_ref, fc2_ref, f2b_ref,
    out_ref, *, num_heads: int, stage: str = "full", exp2_bf16: bool = False,
    wo_fold: bool = False, pt_f32: bool = False, no_clamp: bool = False,
    scores_bf16: bool = False, score_compact: int = 0,
):
    Rb, N, C = x_ref.shape
    H = num_heads
    D = C // H
    cd = x_ref.dtype

    xf = x_ref[:].astype(jnp.float32)
    normed = _ln(xf, ln1s_ref, ln1b_ref).astype(cd)

    q = jax.lax.dot_general(          # wq pre-scaled by D^-0.5 * log2(e)
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
    if stage == "qkv":
        out_ref[:] = (q.astype(jnp.float32) + k + v).astype(out_ref.dtype)
        return
    vT = jnp.swapaxes(v, 1, 2)
    ones_row = jnp.ones((Rb, 1, N), cd)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Rb, N, C), 2)

    def _scores(h):
        if score_compact:
            # MAC-density probe: the lane-masked form contracts all C lanes
            # (28 of 32 zero at head_dim 4) — the MXU streams the FULL C
            # contraction depth per head.  Slice head h's D live lanes and
            # contract a (Rb, N, W<=16) operand instead: bf16 sublane tiling
            # makes 16 the minimum executed depth, so W=16 halves score MACs
            # at C=32 and wins 4-16x at C=64..256.
            w = min(score_compact, C)
            qh = jax.lax.slice_in_dim(q, h * D, h * D + D, axis=2)
            kh = jax.lax.slice_in_dim(k, h * D, h * D + D, axis=2)
            if w > D:
                qh = jnp.pad(qh, ((0, 0), (0, 0), (0, w - D)))
                kh = jnp.pad(kh, ((0, 0), (0, 0), (0, w - D)))
            return jax.lax.dot_general(
                kh, qh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        kh = jnp.where((lane >= h * D) & (lane < (h + 1) * D), k, 0).astype(cd)
        return jax.lax.dot_general(
            kh, q, (((2,), (2,)), ((0,), (0,))),
            # scores_bf16: the MXU stores the score plane as bf16 directly —
            # no f32 plane ever lands in VMEM (accumulation stays f32 inside
            # the MXU; only the store rounds).  Probes the plane-byte floor.
            preferred_element_type=jnp.bfloat16 if scores_bf16
            else jnp.float32,
        )

    if stage == "scores":
        acc = jnp.zeros((Rb, N, C), jnp.float32)
        w = min(C, N)
        for h in range(H):
            s = jnp.swapaxes(_scores(h)[:, :w, :], 1, 2)   # (Rb, N, w)
            acc = acc + jnp.pad(s, ((0, 0), (0, 0), (0, C - w)))
        out_ref[:] = acc.astype(out_ref.dtype)
        return

    accT_parts = []
    sT = _scores(0)
    for h in range(H):
        sT_next = _scores(h + 1) if h + 1 < H else None
        sc = sT if no_clamp else jnp.minimum(sT, SCORE_CLAMP)
        if exp2_bf16:
            pT = jnp.exp2(sc.astype(jnp.bfloat16)).astype(cd)
        elif pt_f32:
            # keep the prob plane f32: no explicit (Rb, N, N) VPU cast pass;
            # the AV matmul truncates operands on the MXU feed instead
            pT = jnp.exp2(sc)
        else:
            pT = jnp.exp2(sc).astype(cd)
        if stage == "exp2":
            accT_parts.append(jnp.swapaxes(pT[:, :, :D], 1, 2)
                              .astype(jnp.float32))
            sT = sT_next
            continue
        v_hT = jnp.concatenate(
            [vT[:, h * D:(h + 1) * D, :], ones_row], axis=1)
        if pt_f32:
            v_hT = v_hT.astype(jnp.float32)
        oeT = jax.lax.dot_general(
            v_hT, pT, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        denomT = oeT[:, D:D + 1, :]
        accT_parts.append(oeT[:, :D, :] * pl.reciprocal(denomT, approx=False))
        sT = sT_next
    accT = jnp.concatenate(accT_parts, axis=1)
    if stage == "av":
        # Stop after AV/denominator: every accT element stays live via a
        # lane reduction (no dead-code elimination), but the big
        # (Rb, C, N) -> (Rb, N, C) relayout, wo, and the MLP are skipped.
        red = jnp.sum(accT, axis=2, keepdims=True)          # (Rb, C, 1)
        out_ref[:] = jnp.broadcast_to(
            jnp.swapaxes(red, 1, 2), (Rb, N, C)).astype(out_ref.dtype)
        return
    if wo_fold:
        # Fold the output-projection contraction over accT's SUBLANE dim:
        # attn[r, n, e] = sum_c accT[r, c, n] wo[c, e] — no explicit
        # (Rb, C, N) -> (Rb, N, C) swapaxes relayout before the matmul.
        attn = jax.lax.dot_general(
            accT.astype(cd), wo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + ob_ref[:].astype(jnp.float32)
    else:
        acc = jnp.swapaxes(accT, 1, 2)
        if stage == "exp2":
            out_ref[:] = acc.astype(out_ref.dtype)
            return
        attn = jax.lax.dot_general(
            acc.astype(cd), wo_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + ob_ref[:].astype(jnp.float32)

    y = xf + attn
    if stage == "attn":
        out_ref[:] = y.astype(out_ref.dtype)
        return
    out = _mlp_tail(y, ln2s_ref, ln2b_ref, fc1_ref, f1b_ref, fc2_ref,
                    f2b_ref, cd)
    out_ref[:] = out.astype(out_ref.dtype)


def _call_kernel(kernel, rows, p, num_heads, rb_override=None):
    """Launch a lab kernel with the production wq/wk/wv weight prep."""
    R, N, C = rows.shape
    dtype = rows.dtype
    hidden = p.fc1_kernel.shape[1]
    Rb = rb_override or _row_block(N, C, hidden, dtype)
    pad = (-R) % Rb
    padded = jnp.pad(rows, ((0, pad), (0, 0), (0, 0))) if pad else rows
    Rp = R + pad
    D = C // num_heads
    wq = p.qkv_kernel[:, :C].astype(jnp.float32) \
        * (D ** -0.5) * 1.4426950408889634
    wk = p.qkv_kernel[:, C:2 * C]
    wv = p.qkv_kernel[:, 2 * C:]

    def bcast(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(kernel, num_heads=num_heads),
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
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


def block_hpair(rows, p, num_heads):
    """Production fused kernel with head-pairing FORCED on (the production
    `prod` variant routes pairing by the autotune gate; this pins the A/B
    regardless of cache state)."""
    N = rows.shape[1]
    if 2 * N > 128 or num_heads % 2:
        raise ValueError("hpair targets 2N <= 128 with even heads")
    return _fused_block_impl(rows, p, num_heads, pair_heads=True)


def block_nopair(rows, p, num_heads):
    """Production fused kernel with head-pairing FORCED off."""
    return _fused_block_impl(rows, p, num_heads, pair_heads=False)


def block_exp2bf16(rows, p, num_heads):
    return _call_kernel(
        functools.partial(_kernel_prod, exp2_bf16=True), rows, p, num_heads)


def block_d16(rows, p, num_heads):
    """Prod form with per-head scores contracted at depth 16 (compacted
    live lanes) instead of the full lane-masked C — the MAC-density attack
    on the score matmuls (exact same math: sliced lanes, zero padding)."""
    return _call_kernel(
        functools.partial(_kernel_prod, score_compact=16), rows, p,
        num_heads)


def block_d4(rows, p, num_heads):
    """Like d16 but hands Mosaic the bare (Rb, N, D) operands — probes
    whether sub-tile contraction depths execute at all / faster."""
    return _call_kernel(
        functools.partial(_kernel_prod, score_compact=4), rows, p,
        num_heads)


def block_sbf16(rows, p, num_heads):
    """bf16 score planes END TO END: the MXU stores scores as bf16 (f32
    accumulate inside the array, rounded on store), clamp+exp2 run on bf16
    — the f32 (Rb, N, N) plane write+read is gone entirely.  Same rounding
    of the exp2 argument as exp2bf16, strictly fewer plane bytes; the
    quality arbiter is an end-to-end SDR A/B, not kernel fidelity."""
    return _call_kernel(
        functools.partial(_kernel_prod, scores_bf16=True), rows, p,
        num_heads)


def block_stage(stage, rows, p, num_heads):
    return _call_kernel(
        functools.partial(_kernel_prod, stage=stage), rows, p, num_heads)


def block_wofold(rows, p, num_heads):
    """Full prod-form kernel with the output projection contracted over
    accT's sublane dim — the (Rb, C, N) -> (Rb, N, C) relayout between the
    AV epilogue and wo is folded into the matmul."""
    return _call_kernel(
        functools.partial(_kernel_prod, wo_fold=True), rows, p, num_heads)


def block_ptf32(rows, p, num_heads):
    """Prod form with the prob planes left f32 into the AV matmul — probes
    whether the per-element bf16 cast is a separate VPU pass (VPU-bound
    shapes) or free on the MXU feed."""
    return _call_kernel(
        functools.partial(_kernel_prod, pt_f32=True), rows, p, num_heads)


def block_noclamp(rows, p, num_heads):
    """DIAGNOSTIC ONLY: prod form without the SCORE_CLAMP min — measures
    the clamp's VPU cost (the guard itself stays mandatory in production)."""
    return _call_kernel(
        functools.partial(_kernel_prod, no_clamp=True), rows, p, num_heads)


VARIANTS = {
    "prod": lambda r, p, H: fused_row_block(r, p, H),
    "xla": lambda r, p, H: _xla_block(r, p, H),
    "hpair": block_hpair,
    "nopair": block_nopair,
    "exp2bf16": block_exp2bf16,
    "sbf16": block_sbf16,
    "d16": block_d16,
    "d4": block_d4,
    "wofold": block_wofold,
    "ptf32": block_ptf32,
    "noclamp": block_noclamp,
}


def make_params(C, rng, dtype):
    hid = 4 * C
    def r(*s, scale=0.05):
        return jnp.asarray(rng.standard_normal(s) * scale, dtype)
    return RowBlockParams(
        norm1_scale=jnp.ones((C,), dtype), norm1_bias=jnp.zeros((C,), dtype),
        qkv_kernel=r(C, 3 * C), proj_kernel=r(C, C),
        proj_bias=jnp.zeros((C,), dtype),
        norm2_scale=jnp.ones((C,), dtype), norm2_bias=jnp.zeros((C,), dtype),
        fc1_kernel=r(C, hid), fc1_bias=jnp.zeros((hid,), dtype),
        fc2_kernel=r(hid, C), fc2_bias=jnp.zeros((C,), dtype),
    )


def timeit(fn, rows, p, iters=8):
    """Chained timing through the axon tunnel (block_until_ready does not
    sync; identical in-flight dispatches memoize).  Multi-output fns (the
    two-output training kernel) chain through their FIRST output — all
    outputs are still materialized by the executable each iteration."""
    first = lambda o: o[0] if isinstance(o, (tuple, list)) else o
    out = first(fn(rows, p))
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    cur = rows
    for _ in range(iters):
        cur = first(fn(cur, p))
    _ = float(jnp.sum(cur.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def check(names):
    rng = np.random.default_rng(1)
    rows = jnp.asarray(rng.standard_normal((8, 64, 32)), jnp.float32)
    rows = rows.at[0].mul(30.0)   # exercise the clamp region
    p = make_params(32, rng, jnp.float32)
    ref = jax.jit(lambda r, pp: _xla_block(r, pp, 8))(rows, p)
    for name in names:
        if name == "xla":
            continue
        fn = VARIANTS[name]
        got = jax.jit(lambda r, pp: fn(r, pp, 8))(rows, p)
        err = float(jnp.max(jnp.abs(ref - got)))
        den = float(jnp.max(jnp.abs(ref))) or 1.0
        fin = bool(jnp.isfinite(got).all())
        print(f"  {name:9s}: max_abs_err {err:.3e} (rel {err/den:.3e}) "
              f"finite={fin}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--ablate", action="store_true")
    ap.add_argument("--grad", action="store_true",
                    help="time the BACKWARD per stage shape: jax.grad of "
                         "each variant wrt (rows, params), summed-square "
                         "loss (a ones cotangent would constant-fold)")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--shapes", default="")
    ap.add_argument("--variants", default="prod,hpair")
    ap.add_argument("--custom", default="",
                    help="extra shapes 'label:R,N,C,H;label:R,N,C,H' — "
                         "replaces the stage list (e.g. production B=8 "
                         "row counts)")
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)
    names = [v for v in args.variants.split(",") if v]

    global SHAPES
    if args.custom:
        SHAPES = []
        for spec in args.custom.split(";"):
            label, dims = spec.split(":")
            r, n, c, h = (int(v) for v in dims.split(","))
            SHAPES.append((label, r, n, c, h))

    print(f"device: {jax.devices()[0]}, dtype {dtype}")
    if args.check:
        check(names)
        return

    for label, R, N, C, H in SHAPES:
        if args.shapes and args.shapes not in label:
            continue
        rng = np.random.default_rng(0)
        rows = jnp.asarray(rng.standard_normal((R, N, C)), dtype)
        p = make_params(C, rng, dtype)
        line = f"{label:15s} R={R:5d} N={N:4d} C={C:3d}"
        if args.ablate:
            for stage in ("qkv", "scores", "exp2", "av", "attn", "full"):
                try:
                    t = timeit(jax.jit(functools.partial(
                        block_stage, stage, num_heads=H)),
                        rows, p, iters=args.iters)
                    line += f"  {stage} {t*1e3:8.2f}"
                except Exception as exc:
                    line += f"  {stage} FAIL({str(exc)[:60]})"
            print(line)
            continue
        for name in names:
            fn = VARIANTS[name]
            if args.grad:
                def gfn(r, pp, _f=fn):
                    return jax.grad(
                        lambda rr, qq: jnp.sum(
                            jnp.square(_f(rr, qq, H).astype(jnp.float32))),
                        argnums=(0, 1),
                    )(r, pp)
                run = jax.jit(gfn)
            else:
                run = jax.jit(lambda r, pp: fn(r, pp, H))
            try:
                t = timeit(run, rows, p, iters=args.iters)
                tag = f"grad:{name}" if args.grad else name
                line += f"  {tag} {t*1e3:8.2f} ms"
            except Exception as exc:
                line += f"  {name} FAILED: {str(exc)[:80]}"
        print(line)


if __name__ == "__main__":
    main()
