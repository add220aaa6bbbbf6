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
