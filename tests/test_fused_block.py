"""Fused row-block kernel equivalence vs the XLA block path.

The fused kernel computes the ENTIRE pre-LN transformer block; it must match
the XLA path (models/attention.row_transformer_block) elementwise.

Tolerance rationale (bf16 case): the kernel folds the softmax normalisation
into a post-AV rank-1 scale and runs matmuls in bf16 with f32 accumulation,
while the XLA path normalises probs before the AV matmul — both are exact in
real arithmetic, so the observable delta is bf16 rounding of O(1) activations:
|err| <= a few ULP at magnitude ~4 => atol 0.0625 (2 ULP at 4.0), with f32
agreement (atol 2e-5) establishing the reassociation itself is value-neutral.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from tfswa_tpu.models.attention import RowBlockParams, row_transformer_block
from tfswa_tpu.ops.pallas.fused_block import _xla_block, fused_row_block


def _params(rng, C, dtype=jnp.float32):
    ks = jax.random.split(rng, 6)
    hid = 4 * C
    def r(k, *s, scale=0.05):
        return (jax.random.normal(k, s, jnp.float32) * scale).astype(dtype)
    return RowBlockParams(
        norm1_scale=jnp.ones((C,), dtype),
        norm1_bias=jnp.zeros((C,), dtype),
        qkv_kernel=r(ks[0], C, 3 * C),
        proj_kernel=r(ks[1], C, C),
        proj_bias=r(ks[2], C, scale=0.01),
        norm2_scale=jnp.ones((C,), dtype),
        norm2_bias=jnp.zeros((C,), dtype),
        fc1_kernel=r(ks[3], C, hid),
        fc1_bias=jnp.zeros((hid,), dtype),
        fc2_kernel=r(ks[4], hid, C),
        fc2_bias=jnp.zeros((C,), dtype),
    )


@pytest.mark.parametrize(
    "R,N,C,H",
    [
        (4, 64, 32, 8),     # window-like rows
        (3, 127, 32, 4),    # odd N and R (padding + Rb=1 path)
        (2, 96, 64, 8),     # wider channels
        (5, 48, 128, 8),    # C with no lane padding
    ],
)
def test_fused_block_matches_xla_f32(R, N, C, H):
    rows = jax.random.normal(jax.random.PRNGKey(1), (R, N, C), jnp.float32)
    p = _params(jax.random.PRNGKey(0), C)
    ref = _xla_block(rows, p, H)
    with pltpu.force_tpu_interpret_mode():
        out = fused_row_block(rows, p, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_block_matches_module_path():
    """row_transformer_block(impl='pallas') routes through the fused kernel
    and must equal the XLA branch of the same function."""
    R, N, C, H = 3, 40, 32, 8
    rows = jax.random.normal(jax.random.PRNGKey(2), (R, N, C), jnp.float32)
    p = _params(jax.random.PRNGKey(3), C)
    ref = row_transformer_block(rows, p, H, attention_impl="xla",
                                chunk_size=2)
    with pltpu.force_tpu_interpret_mode():
        out = row_transformer_block(rows, p, H, attention_impl="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_block_bf16_tolerance():
    """bf16 faithfulness at a stage-1-like shape (scaled down for the CPU
    interpreter): kernel output vs the bf16 XLA path within bf16 rounding.
    See module docstring for the tolerance rationale."""
    R, N, C, H = 4, 129, 32, 8   # odd N like 1025; bf16 sublane-unaligned
    rows = (jax.random.normal(jax.random.PRNGKey(4), (R, N, C), jnp.float32)
            .astype(jnp.bfloat16))
    p = _params(jax.random.PRNGKey(5), C, dtype=jnp.bfloat16)
    ref = _xla_block(rows, p, H).astype(jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = fused_row_block(rows, p, H).astype(jnp.float32)
    err = np.max(np.abs(np.asarray(out) - np.asarray(ref)))
    scale = max(np.max(np.abs(np.asarray(ref))), 1.0)
    assert err <= 0.0625 * max(scale / 4.0, 1.0), (err, scale)


def test_fused_block_gradients_match_xla():
    """Custom VJP (XLA remat) must match direct XLA-block gradients for both
    rows and every parameter leaf."""
    R, N, C, H = 3, 24, 16, 4
    rows = jax.random.normal(jax.random.PRNGKey(6), (R, N, C), jnp.float32)
    p = _params(jax.random.PRNGKey(7), C)

    def loss_fused(rows, p):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_row_block(rows, p, H) ** 2)

    def loss_ref(rows, p):
        return jnp.sum(_xla_block(rows, p, H) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(rows, p)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(rows, p)
    np.testing.assert_allclose(np.asarray(g_fused[0]), np.asarray(g_ref[0]),
                               atol=1e-4, rtol=1e-4)
    for a, e in zip(g_fused[1], g_ref[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize(
    "R,N,C,H,dtype",
    [
        (10, 64, 32, 8, jnp.float32),    # SWA-like, exercises the clamp row
        (7, 64, 32, 8, jnp.float32),     # R % Rb != 0 (padded-cell path)
        (3, 65, 32, 8, jnp.float32),     # odd N -> Rb=1
        (6, 64, 64, 8, jnp.bfloat16),    # training dtype
    ],
)
def test_fused_backward_kernel_matches_xla(monkeypatch, tmp_path,
                                           R, N, C, H, dtype):
    """The fused Pallas backward kernel (round 4: whole attention-half VJP +
    LN2/MLP VJP in VMEM, fed by the forward's acc/den exports) must match
    XLA-block autodiff on d_rows and every parameter cotangent, including
    the padded-cell path (den padded with ones so no NaN can poison the
    grid-accumulated param grads) and the SCORE_CLAMP saturation region."""
    from tfswa_tpu.ops.pallas import autotune

    monkeypatch.setenv("TFSWA_AUTOTUNE_DIR", str(tmp_path))
    autotune.reset()
    dtn = jnp.dtype(dtype).name
    autotune.record("bwd_route", f"{N},{C},{dtn}", "pallas")
    if R % 2:  # pin an Rb that does not divide R -> forces padding
        autotune.record("row_block", f"{N},{C},{dtn},{4 * C},1,bwd", 4)
    autotune.reset()

    rows = (jax.random.normal(jax.random.PRNGKey(8), (R, N, C), jnp.float32)
            * 0.5)
    if dtype == jnp.float32:
        # drive scores into the SCORE_CLAMP saturation (f32 only: at bf16
        # the x30 row amplifies accumulation-order noise past any
        # meaningful tolerance; the clamp VJP itself is dtype-independent)
        rows = rows.at[0].mul(30.0)
    rows = rows.astype(dtype)
    p = _params(jax.random.PRNGKey(9), C, dtype)

    def loss_fused(rows, p):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_row_block(rows, p, H)
                           .astype(jnp.float32) ** 2)

    def loss_ref(rows, p):
        return jnp.sum(_xla_block(rows, p, H).astype(jnp.float32) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(rows, p)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(rows, p)
    autotune.reset()

    if dtype == jnp.float32:
        tol = dict(atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(g_fused[0], np.float32),
            np.asarray(g_ref[0], np.float32), **tol)
        for a, e in zip(g_fused[1], g_ref[1]):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(e, np.float32), **tol)
    else:
        # bf16: the two paths are different (both valid) accumulation
        # orders, so elementwise closeness to each other is the wrong
        # check.  Assert instead that the kernel is no farther from the
        # f32 ground truth than the XLA bf16 path (measured: worst dp
        # 4.5e-3 vs 1.7e-2 rel — the kernel accumulates MORE in f32).
        rows32 = rows.astype(jnp.float32)
        p32 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32), p)
        g_true = jax.grad(loss_ref, argnums=(0, 1))(rows32, p32)

        def max_err(a, t):
            t = np.asarray(t, np.float32)
            scale = max(float(np.abs(t).max()), 1e-9)
            return float(np.abs(np.asarray(a, np.float32) - t).max()) / scale

        leaves_f = [g_fused[0], *g_fused[1]]
        leaves_x = [g_ref[0], *g_ref[1]]
        leaves_t = [g_true[0], *g_true[1]]
        for a, x, t in zip(leaves_f, leaves_x, leaves_t):
            assert max_err(a, t) <= 1.5 * max_err(x, t) + 1e-3, (
                max_err(a, t), max_err(x, t))


def test_fused_int8_serving_path_close_to_f32():
    """fused_row_block_int8 (serving-only int8 score/AV core) must stay
    within dynamic-int8 fidelity of the f32 fused path (same quantization
    family as the measured XLA int8 path: end-to-end SDR delta < 1e-4 dB
    on a trained checkpoint, BENCH.md round 2)."""
    from tfswa_tpu.ops.pallas.fused_block import fused_row_block_int8

    R, N, C, H = 5, 130, 32, 8
    rows = (jax.random.normal(jax.random.PRNGKey(11), (R, N, C), jnp.float32)
            * 0.5)
    p = _params(jax.random.PRNGKey(12), C)
    with pltpu.force_tpu_interpret_mode():
        ref = fused_row_block(rows, p, H)
        got = fused_row_block_int8(rows, p, H)
    err = float(jnp.max(jnp.abs(got - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    assert err / scale < 5e-3, (err, scale)
    assert bool(jnp.isfinite(got).all())
