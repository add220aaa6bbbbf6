"""Bilinear row-attention core with fused Pallas forward AND backward.

The training-time counterpart of fused_block.py: a custom-VJP primitive

    acc = bilinear_attention(normed, a, wv)

where ``normed`` is the LN1 output (R, N, C), ``a`` the per-head bilinear
matrices A_h = Wq_h Wk_h^T / sqrt(D) (H, C, C) and ``wv`` the value kernel
(C, C).  ``acc`` (R, N, C) holds each head's attention output in that head's
D output lanes (the out-projection, residuals, LN2 and the MLP stay in XLA,
so their gradients compose by autodiff around this core).

Forward: the flash kernel of fused_block.py (scores never leave VMEM, softmax
denominator from a ones column riding the AV matmul), additionally emitting
the per-head row statistics m (running max) and denom needed by backward.

Backward: one Pallas kernel per grid row-block that recomputes scores in
VMEM from the saved (normed, a, m, denom) — flash-style rematerialisation
at kernel scope instead of the previous whole-graph XLA remat
(row_attention.py _xla_reference) — and produces dnormed plus the parameter
gradients da / dwv accumulated across grid cells in a revisited output block.

Reference behaviour covered: attention.py:34-90 (per-head softmax MHA over
independent rows); the bilinear reformulation is TPU-specific (head_dim 4
contractions would waste 97% of the 128-wide MXU lanes).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._compat import default_interpret

_VMEM_BUDGET = 10 * 1024 * 1024


def _align128(n: int) -> int:
    return ((n + 127) // 128) * 128


def _row_block(N: int, C: int, dtype, n_planes: int) -> int:
    """Rows per grid cell given n_planes live (N, N)-f32 score planes."""
    sublane = 16 if dtype == jnp.bfloat16 else 8
    if N % sublane != 0:
        return 1
    per_row = n_planes * N * _align128(N) * 4 + 12 * N * _align128(C) * 4
    return max(1, min(32, _VMEM_BUDGET // max(per_row, 1)))


# --------------------------------------------------------------------- fwd
def _fwd_kernel(x_ref, a_ref, wv_ref, out_ref, m_ref, d_ref, *,
                num_heads: int):
    """Transposed-AV layout (see fused_block._fused_block_kernel): scores
    pre-transposed (keys on sublanes, queries on lanes), per-head AV output
    of D+1 SUBLANE rows (the +1 ones row carries the softmax denominator).
    Heads are Python-unrolled: static v/stat slices."""
    Rb, N, C = x_ref.shape
    H = num_heads
    D = C // H
    cd = x_ref.dtype

    x = x_ref[:]
    v = jax.lax.dot_general(
        x, wv_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cd)
    vT = jnp.swapaxes(v, 1, 2)                              # (Rb, C, N)
    ones_row = jnp.ones((Rb, 1, N), cd)

    accT_parts = []
    for h in range(H):
        t = jax.lax.dot_general(
            x, a_ref[h], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cd)
        sT = jax.lax.dot_general(
            x, t, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                   # (Rb, Nm, Nn)
        mx = jnp.max(sT, axis=1, keepdims=True)             # (Rb, 1, Nn)
        pT = jnp.exp(sT - mx).astype(cd)
        v_hT = jnp.concatenate(
            [vT[:, h * D:(h + 1) * D, :], ones_row], axis=1
        )                                                   # (Rb, D+1, Nm)
        oeT = jax.lax.dot_general(
            v_hT, pT, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                   # (Rb, D+1, Nn)
        denomT = oeT[:, D:D + 1, :]
        m_ref[:, h, :] = mx[:, 0, :]
        d_ref[:, h, :] = denomT[:, 0, :]
        accT_parts.append(
            oeT[:, :D, :] * pl.reciprocal(denomT, approx=False))
    accT = jnp.concatenate(accT_parts, axis=1)              # (Rb, C, N)
    out_ref[:] = jnp.swapaxes(accT, 1, 2).astype(out_ref.dtype)


def _fwd_impl(normed, a, wv, num_heads):
    R, N, C = normed.shape
    dtype = normed.dtype
    H = num_heads
    Rb = _row_block(N, C, dtype, n_planes=2)
    pad = (-R) % Rb
    x = jnp.pad(normed, ((0, pad), (0, 0), (0, 0))) if pad else normed
    Rp = R + pad

    def bcast(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)

    out, m, d = pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=H),
        grid=(Rp // Rb,),
        interpret=default_interpret(),
        in_specs=[
            pl.BlockSpec((Rb, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            bcast((H, C, C)), bcast((C, C)),
        ],
        out_specs=(
            pl.BlockSpec((Rb, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rb, H, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rb, H, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Rp, N, C), dtype),
            jax.ShapeDtypeStruct((Rp, H, N), jnp.float32),
            jax.ShapeDtypeStruct((Rp, H, N), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * N * num_heads * (C * C + 2 * N * C),
            bytes_accessed=Rp * N * C * 2 * 2,
            transcendentals=Rp * num_heads * N * N,
        ),
    )(x, a.astype(dtype), wv.astype(dtype))
    if pad:
        return out[:R], m[:R], d[:R]
    return out, m, d


# --------------------------------------------------------------------- bwd
def _bwd_kernel(x_ref, a_ref, wv_ref, m_ref, d_ref, o_ref, g_ref,
                dx_ref, da_ref, dwv_ref, *, num_heads: int, key_chunk: int):
    """Transposed-layout flash backward with KEY CHUNKING.

    Layout: everything head-sliced lives on SUBLANES (D rows pad to 8)
    instead of masked lanes (32 pad to 128), and the big (N, N)-plane
    matmuls keep both N dims on full tiles — roughly half the executed
    matmul volume of a lane-masked formulation.

    Probs are recomputed from the saved (m, denom) stats (flash remat), one
    key chunk at a time, so peak VMEM is O(key_chunk * N) score planes and
    ANY N fits (the unchunked form OOMs VMEM at N=1025).  The softmax-vjp
    row term uses the classic flash-backward identity
        r(n) = sum_m dP(m,n) P(m,n) = <g_h(n), o_h(n)>
    so no extra (N, N) reduction pass is needed.

    Heads AND chunks are Python-unrolled: static slices throughout.
    """
    Rb, N, C = x_ref.shape
    H = num_heads
    D = C // H
    cd = x_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        da_ref[:] = jnp.zeros_like(da_ref)
        dwv_ref[:] = jnp.zeros_like(dwv_ref)

    x = x_ref[:]                                            # (Rb, N, C)
    g = g_ref[:]                                            # (Rb, N, C)
    xT = jnp.swapaxes(x, 1, 2)                              # (Rb, C, N)
    gT = jnp.swapaxes(g, 1, 2)
    goT = gT.astype(jnp.float32) * jnp.swapaxes(
        o_ref[:], 1, 2).astype(jnp.float32)                 # (Rb, C, N)
    v = jax.lax.dot_general(
        x, wv_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cd)
    vT = jnp.swapaxes(v, 1, 2)                              # (Rb, C, N)

    chunks = [(j, min(j + key_chunk, N))
              for j in range(0, N, key_chunk)]

    dxT = jnp.zeros((Rb, C, N), jnp.float32)
    dvT_parts = []
    da_new = []
    for h in range(H):
        t = jax.lax.dot_general(
            x, a_ref[h], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cd)                                        # (Rb, N, C)
        tT = jnp.swapaxes(t, 1, 2)                          # (Rb, C, N)
        mT = m_ref[:, h, :][:, None, :]                     # (Rb, 1, n)
        dinvT = pl.reciprocal(d_ref[:, h, :][:, None, :], approx=False)
        # r(n) = <g_h(n), o_h(n)>  (flash-backward identity)
        rT = jnp.sum(goT[:, h * D:(h + 1) * D, :], axis=1,
                     keepdims=True)                         # (Rb, 1, n)
        g_hT = gT[:, h * D:(h + 1) * D, :]                  # (Rb, D, n)

        dtT = jnp.zeros((Rb, C, N), jnp.float32)
        dv_chunks = []
        dxk_chunks = []
        for (j0, j1) in chunks:
            x_j = x[:, j0:j1, :]                            # (Rb, nc, C)
            sT_j = jax.lax.dot_general(
                x_j, t, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                               # (Rb, nc, n)
            PT_j = jnp.exp(sT_j - mT) * dinvT
            PTc_j = PT_j.astype(cd)
            # dv_h(d, m) = sum_n g_h(d, n) P(m, n)
            dv_chunks.append(jax.lax.dot_general(
                g_hT, PTc_j, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ))                                              # (Rb, D, nc)
            # dP(m, n) = sum_d v_h(d, m) g_h(d, n)
            dPT_j = jax.lax.dot_general(
                vT[:, h * D:(h + 1) * D, j0:j1], g_hT,
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                               # (Rb, nc, n)
            dsT_j = (PT_j * (dPT_j - rT)).astype(cd)
            # dt(k, n) += sum_m x(k, m) ds(m, n)   (m in chunk)
            dtT = dtT + jax.lax.dot_general(
                xT[:, :, j0:j1].astype(cd), dsT_j,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            # dx key side: dx(c, m) += sum_n t(c, n) ds(m, n)
            dxk_chunks.append(jax.lax.dot_general(
                tT, dsT_j, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ))                                              # (Rb, C, nc)
        dxT = dxT + jnp.concatenate(dxk_chunks, axis=2)
        dvT_parts.append(jnp.concatenate(dv_chunks, axis=2))
        # dx query side: dx(c, n) += sum_k A_h(c, k) dt(k, n)
        dxT = dxT + jax.lax.dot_general(
            jnp.broadcast_to(a_ref[h].astype(cd), (Rb, C, C)),
            dtT.astype(cd), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # dA_h += x^T dt (sum over rows and queries).  Mosaic cannot lower a
        # 2-dim contraction; flatten (Rb, N) into one contraction dim.
        dt = jnp.swapaxes(dtT.astype(cd), 1, 2)             # (Rb, N, C)
        da_new.append(jax.lax.dot_general(
            x.reshape(Rb * N, C), dt.reshape(Rb * N, C),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))

    dvT = jnp.concatenate(dvT_parts, axis=1)                # (Rb, C, m)
    # v = x @ wv backward: dx(c, n) += sum_k wv(c, k) dv(k, n)
    dvTc = dvT.astype(cd)
    dxT = dxT + jax.lax.dot_general(
        jnp.broadcast_to(wv_ref[:], (Rb, C, C)), dvTc,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dv = jnp.swapaxes(dvTc, 1, 2)                           # (Rb, N, C)
    dwv_ref[:] = dwv_ref[:] + jax.lax.dot_general(
        x.reshape(Rb * N, C), dv.reshape(Rb * N, C),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for h in range(H):
        da_ref[h] = da_ref[h] + da_new[h]
    dx_ref[:] = jnp.swapaxes(dxT, 1, 2).astype(dx_ref.dtype)


def _pick_key_chunk(N: int, C: int) -> int:
    """Largest sublane-aligned key chunk whose ~3.5 live (chunk, N)-f32
    score planes plus the O(N*C) buffers stay inside the VMEM budget."""
    fixed = 14 * N * _align128(C) * 4
    avail = _VMEM_BUDGET - fixed
    per_key = int(3.5 * _align128(N) * 4)
    nc = max(8, (avail // max(per_key, 1)) // 8 * 8)
    return min(N, nc)


def _bwd_impl(normed, a, wv, m, d, out, g, num_heads):
    R, N, C = normed.shape
    dtype = normed.dtype
    H = num_heads
    key_chunk = _pick_key_chunk(N, C)
    # rows per grid cell, given planes of (key_chunk, N)
    per_row = (int(3.5 * key_chunk * _align128(N)) * 4
               + 14 * N * _align128(C) * 4)
    Rb = max(1, min(16, _VMEM_BUDGET // max(per_row, 1)))
    sublane = 16 if dtype == jnp.bfloat16 else 8
    if N % sublane != 0:
        Rb = 1
    pad = (-R) % Rb
    if pad:
        normed = jnp.pad(normed, ((0, pad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0), (0, 0)))
        out = jnp.pad(out, ((0, pad), (0, 0), (0, 0)))
        m = jnp.pad(m, ((0, pad), (0, 0), (0, 0)))
        # denom 1.0 on padded rows: keeps reciprocal finite; P on padded
        # rows multiplies zero gradients, so the contribution is zero.
        d = jnp.pad(d, ((0, pad), (0, 0), (0, 0)), constant_values=1.0)
    Rp = R + pad

    def bcast(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)

    dx, da, dwv = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=H, key_chunk=key_chunk),
        grid=(Rp // Rb,),
        interpret=default_interpret(),
        in_specs=[
            pl.BlockSpec((Rb, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            bcast((H, C, C)), bcast((C, C)),
            pl.BlockSpec((Rb, H, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rb, H, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rb, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rb, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Rb, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            bcast((H, C, C)),
            bcast((C, C)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Rp, N, C), dtype),
            jax.ShapeDtypeStruct((H, C, C), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * Rp * N * num_heads * (C * C + 2 * N * C),
            bytes_accessed=Rp * N * C * 2 * 4,
            transcendentals=Rp * num_heads * N * N,
        ),
    )(normed, a.astype(dtype), wv.astype(dtype), m, d,
      out.astype(dtype), g.astype(dtype))
    return dx[:R] if pad else dx, da, dwv


# ------------------------------------------------------------- public api
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bilinear_attention(normed, a, wv, num_heads):
    """Per-head softmax(x A_h x^T) (x Wv)_h over independent rows.

    normed: (R, N, C) LN output rows; a: (H, C, C); wv: (C, C).
    Returns (R, N, C) with head h's output in lanes [h*D, (h+1)*D).
    Forward and backward both run as fused Pallas kernels.
    """
    out, _, _ = _fwd_impl(normed, a, wv, num_heads)
    return out


def _vjp_fwd(normed, a, wv, num_heads):
    out, m, d = _fwd_impl(normed, a, wv, num_heads)
    return out, (normed, a, wv, m, d, out)


def _vjp_bwd(num_heads, residuals, g):
    normed, a, wv, m, d, out = residuals
    dx, da, dwv = _bwd_impl(normed, a, wv, m, d, out, g, num_heads)
    return dx, da.astype(a.dtype), dwv.astype(wv.dtype)


bilinear_attention.defvjp(_vjp_fwd, _vjp_bwd)


def pallas_bwd_profitable(R: int, N: int, C: int) -> bool:
    """Shape gate for the Pallas backward (measured, tools/bench_backward.py
    on v5e).  Against the round-1 fixed-chunk-16 XLA VJP the KV-chunked
    Pallas backward won 1.5-1.9x at the C=32 encoder-0 shapes — but the
    memory-targeted effective chunk (models/attention._effective_chunk,
    chunk=1 at full resolution) made the XLA VJP 4-5x faster still
    (enc0 TSA: 146 ms vs 394 Pallas vs 757 chunk-16 XLA; enc1 TSA: 38 ms).
    The XLA path now wins at every model shape, so the gate is closed; the
    kernel remains for shapes/hardware where recompute-in-VMEM pays again.
    """
    return False


def mha_rows_pallas(rows_normed, qkv_kernel, proj_kernel, proj_bias,
                    num_heads):
    """Full MHA over pre-normalised rows with Pallas forward+backward core.

    Equals models/attention.mha_rows(rows_normed, ...) (reference:
    attention.py:34-90); the bilinear weight prep and the out-projection are
    XLA ops whose gradients compose automatically around the core.
    """
    from .fused_block import _bilinear_weights

    dtype = rows_normed.dtype
    a, wv = _bilinear_weights(qkv_kernel, num_heads)
    acc = bilinear_attention(rows_normed, a.astype(dtype), wv.astype(dtype),
                             num_heads)
    out = jnp.einsum("rnc,ck->rnk", acc.astype(dtype),
                     proj_kernel.astype(dtype))
    return out + proj_bias.astype(dtype)
