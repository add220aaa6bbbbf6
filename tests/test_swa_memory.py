"""Masked-SWA peak-memory regression at full-track window counts.

A full-track spectrogram pushed through ShiftedWindowAttention with the
correct Swin mask (``use_shift_mask=True``) produces ~1e5 window-rows.
Materialising the dense score plane ``(R, heads, N, N)`` at that scale is
>3 GB of f32 — the blowup the chunked lax.map + factored 4-pattern mask
table exists to prevent (reference never hits this because it separates
one 10 s segment at a time; reference: inference.py:24-58).

These tests compile the forward AND backward at R≈1e5 on the CPU backend
and assert XLA's static buffer assignment (``compiled.memory_analysis()``)
stays far below the dense-score footprint, so the chunked/masked path can
never silently regress to dense materialisation.  Compile-only: no
multi-GB arrays are ever allocated.
"""
import jax
import jax.numpy as jnp
import pytest

from tfswa_tpu.models.attention import ShiftedWindowAttention

pytestmark = pytest.mark.slow  # heavy tier: large-graph compiles


# Full-track geometry: (H/ws)*(W/ws) = 1600*64 = 102_400 window-rows —
# the order of magnitude a 3-minute track reaches at stage-1 resolution.
B, H, W, C = 1, 12_800, 512, 4
WS, SS, HEADS = 8, 4, 2
N = WS * WS
R = (H // WS) * (W // WS) * B
DENSE_SCORE_BYTES = R * HEADS * N * N * 4  # what a dense path would hold


def _compiled(fn, *shaped):
    return jax.jit(fn).lower(*shaped).compile()


@pytest.fixture(scope="module")
def swa_setup():
    module = ShiftedWindowAttention(
        dim=C, window_size=WS, num_heads=HEADS, shift_size=SS,
        use_shift_mask=True,
    )
    x_shape = jax.ShapeDtypeStruct((B, H, W, C), jnp.float32)
    shapes = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, WS, WS, C)), deterministic=True)
    )
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    return module, variables, x_shape


def test_masked_swa_forward_memory_bounded(swa_setup):
    module, variables, x_shape = swa_setup
    assert R >= 100_000  # the regression is only meaningful at this scale

    compiled = _compiled(
        lambda v, x: module.apply(v, x, deterministic=True),
        variables, x_shape,
    )
    temp = compiled.memory_analysis().temp_size_in_bytes
    # Dense scores would be ~3.4 GB.  The chunked path holds one
    # ~32 MB score chunk plus O(R*N*C) row activations (~200 MB here).
    assert temp < DENSE_SCORE_BYTES // 3, (
        f"temp {temp/1e9:.2f} GB vs dense score plane "
        f"{DENSE_SCORE_BYTES/1e9:.2f} GB — masked SWA re-materialised"
    )
    assert temp < 1_200_000_000, f"temp {temp/1e9:.2f} GB exceeds 1.2 GB cap"


def test_masked_swa_backward_no_score_plane(swa_setup):
    """jax.checkpoint on each chunk must keep the scan VJP from stacking
    every chunk's (chunk, heads, N, N) probs as residuals (attention.py
    chunked branch) — the backward-side version of the same blowup.

    Legitimate backward residuals are LINEAR in R (LayerNorm outputs,
    MLP hiddens at R*N*4C ≈ 0.4 GB each; several live at once), so a
    total-temp bound can't separate them from a stacked score plane.
    Instead assert no SINGLE f32 tensor in the optimized HLO reaches
    score-plane scale: the stacked-residual failure mode materialises one
    (n_chunks, chunk, heads, N, N) ≈ 3.4 GB tensor."""
    import re

    module, variables, x_shape = swa_setup

    def loss(v, x):
        return module.apply(v, x, deterministic=True).sum()

    compiled = _compiled(jax.grad(loss), variables, x_shape)
    cap_elems = 256_000_000  # 1 GB f32; largest legit residual ~0.42 GB
    offenders = set()
    for m in re.finditer(r"f32\[([0-9,]+)\]", compiled.as_text()):
        n = 1
        for d in m.group(1).split(","):
            n *= int(d)
        if n > cap_elems:
            offenders.add(m.group(0))
    assert not offenders, (
        f"score-plane-scale tensors in backward HLO: {sorted(offenders)}"
    )
    # Sanity ceiling on the linear-in-R residual total (measured 3.4 GB).
    temp = compiled.memory_analysis().temp_size_in_bytes
    assert temp < 5_000_000_000, f"backward temp {temp/1e9:.2f} GB"
