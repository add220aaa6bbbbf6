"""Window partition/reverse round-trip + Swin mask structure."""
import numpy as np

import jax.numpy as jnp

from tfswa_tpu.ops.windowing import (
    swin_attention_mask,
    swin_mask_table,
    window_partition,
    window_reverse,
)


def test_partition_reverse_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 8)).astype(np.float32))
    wins = window_partition(x, 4)
    assert wins.shape == (2 * 4 * 6, 16, 8)
    back = window_reverse(wins, 4, 2, 16, 24)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_partition_ordering_matches_reference():
    """Window (i, j) of batch b contains x[b, i*ws:(i+1)*ws, j*ws:(j+1)*ws]
    (reference: attention.py:241-256 ordering)."""
    H = W = 8
    ws = 4
    x = jnp.arange(H * W, dtype=jnp.float32).reshape(1, H, W, 1)
    wins = window_partition(x, ws)
    # window 1 = rows 0:4, cols 4:8
    expected = np.asarray(x)[0, 0:4, 4:8, 0].reshape(-1)
    np.testing.assert_array_equal(np.asarray(wins[1, :, 0]), expected)


def test_swin_mask_table_matches_dense():
    """table[idx] reproduces swin_attention_mask exactly, including the
    single-window-row/column degenerate cases."""
    for H, W, ws, ss in [(16, 16, 4, 2), (16, 24, 4, 2), (4, 12, 4, 2),
                         (8, 8, 8, 4), (24, 8, 4, 1)]:
        dense = swin_attention_mask(H, W, ws, ss)
        table, idx = swin_mask_table(H, W, ws, ss)
        assert table.shape[0] == 4 and idx.shape == (dense.shape[0],)
        np.testing.assert_array_equal(table[idx], dense)


def test_swin_mask_properties():
    mask = swin_attention_mask(16, 16, 4, 2)
    assert mask.shape == (16, 16, 16)
    # interior windows: fully unmasked
    assert np.all(mask[0] == 0)
    # last window (bottom-right, wraps both ways): has masked pairs
    assert np.any(mask[-1] == -100.0)
    # mask is symmetric in magnitude
    np.testing.assert_array_equal(mask[-1], np.swapaxes(mask[-1], 0, 1))
