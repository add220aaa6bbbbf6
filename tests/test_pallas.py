"""Pallas kernel equivalence vs the XLA attention path.

Runs in interpreter mode on CPU (real-TPU execution is exercised by
bench.py / the driver's compile check).  Every kernel must match the XLA
reference elementwise — the gate demanded by SURVEY.md section 7 step 5.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from tfswa_tpu.models.attention import mha_rows
from tfswa_tpu.ops.pallas.row_attention import flash_row_attention


def _params(rng, C):
    k1, k2, k3 = jax.random.split(rng, 3)
    return (
        jax.random.normal(k1, (C, 3 * C), jnp.float32) * 0.05,
        jax.random.normal(k2, (C, C), jnp.float32) * 0.05,
        jax.random.normal(k3, (C,), jnp.float32) * 0.01,
    )


@pytest.mark.parametrize(
    "R,N,C,H",
    [
        (4, 64, 32, 8),     # SWA-window-like: many small rows
        (3, 127, 32, 4),    # odd N, odd R (padding path)
        (2, 96, 64, 8),     # wider channels
    ],
)
def test_flash_matches_xla(R, N, C, H):
    rng = jax.random.PRNGKey(0)
    rows = jax.random.normal(jax.random.PRNGKey(1), (R, N, C), jnp.float32)
    wq, wp, b = _params(rng, C)
    ref = mha_rows(rows, wq, wp, b, H)
    with pltpu.force_tpu_interpret_mode():
        out = flash_row_attention(rows, wq, wp, b, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_gradients_match_xla():
    """Custom VJP (XLA remat) must match direct XLA gradients."""
    R, N, C, H = 3, 32, 16, 4
    rows = jax.random.normal(jax.random.PRNGKey(2), (R, N, C), jnp.float32)
    wq, wp, b = _params(jax.random.PRNGKey(3), C)

    def loss_flash(rows, wq, wp, b):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(flash_row_attention(rows, wq, wp, b, H) ** 2)

    def loss_ref(rows, wq, wp, b):
        return jnp.sum(mha_rows(rows, wq, wp, b, H) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(rows, wq, wp, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(rows, wq, wp, b)
    for a, e in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=1e-4, rtol=1e-4)


def test_model_with_pallas_attention_matches_xla():
    """Full TFSWA block, attention_impl='pallas' vs 'xla'."""
    from tfswa_tpu.models import TFSWABlock

    x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 12, 16), jnp.float32)
    kw = dict(in_channels=16, out_channels=16, window_size=4, shift_size=2,
              num_heads=4)
    xla_block = TFSWABlock(**kw, attention_impl="xla")
    variables = xla_block.init(jax.random.PRNGKey(5), x)
    ref = xla_block.apply(variables, x)
    pallas_block = TFSWABlock(**kw, attention_impl="pallas")
    with pltpu.force_tpu_interpret_mode():
        out = pallas_block.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)
