"""Head-paired mha_rows must be value- and gradient-identical.

Round-4 density work: at small N (SWA windows) two heads share one MXU
tile in the score/AV matmuls (models/attention.py mha_rows pair_heads).
The packing is a pure layout trick — these tests pin exact equivalence
against the unpaired path, including masks, dropout determinism, and the
VJP (the packing's main payoff is the attention backward).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tfswa_tpu.models.attention import mha_rows


def _params(rng, C):
    k1, k2, k3 = jax.random.split(rng, 3)
    return (
        jax.random.normal(k1, (C, 3 * C), jnp.float32) * 0.05,
        jax.random.normal(k2, (C, C), jnp.float32) * 0.05,
        jax.random.normal(k3, (C,), jnp.float32) * 0.01,
    )


@pytest.mark.parametrize("R,N,C,H", [
    (5, 64, 32, 8),     # enc0 SWA shape class
    (3, 64, 64, 8),     # enc1 SWA
    (2, 64, 128, 8),    # enc2 SWA
    (4, 16, 16, 4),     # small window
])
def test_paired_matches_unpaired(R, N, C, H):
    rows = jax.random.normal(jax.random.PRNGKey(1), (R, N, C), jnp.float32)
    wq, wp, b = _params(jax.random.PRNGKey(0), C)
    ref = mha_rows(rows, wq, wp, b, H, pair_heads=False)
    got = mha_rows(rows, wq, wp, b, H, pair_heads=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_paired_with_additive_mask():
    R, N, C, H = 4, 16, 16, 4
    rows = jax.random.normal(jax.random.PRNGKey(2), (R, N, C), jnp.float32)
    wq, wp, b = _params(jax.random.PRNGKey(3), C)
    # Swin-style additive mask, per-row: 0 / -inf-ish blocks
    key = jax.random.PRNGKey(4)
    mask = jnp.where(jax.random.bernoulli(key, 0.7, (R, 1, N, N)),
                     0.0, -1e9).astype(jnp.float32)
    ref = mha_rows(rows, wq, wp, b, H, mask=mask, pair_heads=False)
    got = mha_rows(rows, wq, wp, b, H, mask=mask, pair_heads=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_paired_broadcast_mask():
    """A (1, 1, N, N) mask broadcast over rows."""
    R, N, C, H = 3, 16, 16, 4
    rows = jax.random.normal(jax.random.PRNGKey(5), (R, N, C), jnp.float32)
    wq, wp, b = _params(jax.random.PRNGKey(6), C)
    mask = jnp.where(jax.random.bernoulli(jax.random.PRNGKey(7), 0.8,
                                          (1, 1, N, N)),
                     0.0, -1e9).astype(jnp.float32)
    ref = mha_rows(rows, wq, wp, b, H, mask=mask, pair_heads=False)
    got = mha_rows(rows, wq, wp, b, H, mask=mask, pair_heads=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_paired_gradients_match():
    """The packing's payoff is the backward — pin the VJP."""
    R, N, C, H = 3, 64, 32, 8
    rows = jax.random.normal(jax.random.PRNGKey(8), (R, N, C), jnp.float32)
    wq, wp, b = _params(jax.random.PRNGKey(9), C)

    def loss(pair):
        def f(rows, wq, wp, b):
            return jnp.sum(
                mha_rows(rows, wq, wp, b, H, pair_heads=pair) ** 2)
        return f

    g_ref = jax.grad(loss(False), argnums=(0, 1, 2, 3))(rows, wq, wp, b)
    g_got = jax.grad(loss(True), argnums=(0, 1, 2, 3))(rows, wq, wp, b)
    for a, e in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=2e-4, rtol=2e-4)


def test_odd_head_count_falls_back():
    """H odd cannot pair; auto path must still be correct."""
    R, N, C, H = 2, 24, 24, 3
    rows = jax.random.normal(jax.random.PRNGKey(10), (R, N, C), jnp.float32)
    wq, wp, b = _params(jax.random.PRNGKey(11), C)
    ref = mha_rows(rows, wq, wp, b, H, pair_heads=False)
    got = mha_rows(rows, wq, wp, b, H)   # auto: must fall back, not crash
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
