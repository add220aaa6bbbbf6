"""Dropout capability parity (reference: attention.py:48,81,125-127).

The reference applies dropout at three sites: post-softmax attention
weights, MLP-after-GELU, MLP-after-fc2.  Round 1 accepted the `dropout`
field and silently ignored it; these tests pin that a nonzero rate now
changes training behaviour and stays a no-op in eval.
"""
import numpy as np

import jax
import jax.numpy as jnp

from tfswa_tpu.models import TFSWABlock
from tfswa_tpu.models.attention import (
    MultiHeadAttention,
    RowBlockParams,
    mha_rows,
    row_transformer_block,
)


def _params(rng, C):
    ks = jax.random.split(rng, 6)
    hid = 4 * C
    def r(k, *s):
        return jax.random.normal(k, s, jnp.float32) * 0.05
    return RowBlockParams(
        norm1_scale=jnp.ones((C,)), norm1_bias=jnp.zeros((C,)),
        qkv_kernel=r(ks[0], C, 3 * C), proj_kernel=r(ks[1], C, C),
        proj_bias=jnp.zeros((C,)),
        norm2_scale=jnp.ones((C,)), norm2_bias=jnp.zeros((C,)),
        fc1_kernel=r(ks[2], C, hid), fc1_bias=jnp.zeros((hid,)),
        fc2_kernel=r(ks[3], hid, C), fc2_bias=jnp.zeros((C,)),
    )


def test_mha_weights_dropout_changes_output_and_is_deterministic():
    rows = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16))
    p = _params(jax.random.PRNGKey(1), 16)
    base = mha_rows(rows, p.qkv_kernel, p.proj_kernel, p.proj_bias, 4)
    k = jax.random.PRNGKey(2)
    d1 = mha_rows(rows, p.qkv_kernel, p.proj_kernel, p.proj_bias, 4,
                  dropout_rate=0.5, dropout_rng=k)
    d2 = mha_rows(rows, p.qkv_kernel, p.proj_kernel, p.proj_bias, 4,
                  dropout_rate=0.5, dropout_rng=k)
    assert not np.allclose(np.asarray(d1), np.asarray(base))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_row_block_dropout_applies_in_chunked_path():
    rows = jax.random.normal(jax.random.PRNGKey(3), (8, 12, 16))
    p = _params(jax.random.PRNGKey(4), 16)
    base = row_transformer_block(rows, p, 4, chunk_size=2)
    drop = row_transformer_block(rows, p, 4, chunk_size=2,
                                 dropout_rate=0.3,
                                 dropout_rng=jax.random.PRNGKey(5))
    assert not np.allclose(np.asarray(drop), np.asarray(base))


def test_block_dropout_train_vs_eval():
    """TFSWABlock with dropout>0: train=True (with rng) differs from eval;
    eval ignores dropout entirely."""
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 8, 16))
    kw = dict(in_channels=16, out_channels=16, window_size=4, shift_size=2,
              num_heads=4, dropout=0.4)
    block = TFSWABlock(**kw)
    variables = block.init(
        {"params": jax.random.PRNGKey(7), "dropout": jax.random.PRNGKey(8)},
        x, None, True,
    )
    eval_out = block.apply(variables, x, None, False,
                           mutable=["batch_stats"])[0]
    train_out = block.apply(
        variables, x, None, True,
        rngs={"dropout": jax.random.PRNGKey(9)}, mutable=["batch_stats"],
    )[0]
    assert not np.allclose(np.asarray(train_out), np.asarray(eval_out))

    # rate=0 block: train-mode output has no dropout rng requirement
    block0 = TFSWABlock(**{**kw, "dropout": 0.0})
    v0 = block0.init(jax.random.PRNGKey(7), x, None, True)
    _ = block0.apply(v0, x, None, True, mutable=["batch_stats"])


def test_standalone_mha_module_dropout():
    x = jax.random.normal(jax.random.PRNGKey(10), (2, 8, 16))
    m = MultiHeadAttention(dim=16, num_heads=4, dropout=0.5)
    variables = m.init(jax.random.PRNGKey(11), x)
    base = m.apply(variables, x)   # deterministic default
    d = m.apply(variables, x, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(12)})
    assert not np.allclose(np.asarray(d), np.asarray(base))
