"""Window partition/reverse and Swin shift masks on NHWC tensors.

Reference equivalents operate on NCHW with the same (B, nH, nW, ws, ws, C)
interior ordering (reference: attention.py:241-277); ours are pure reshapes /
transposes that XLA folds into neighbouring ops.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def window_partition(x: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nH * nW, ws*ws, C).  H, W must be ws-multiples."""
    B, H, W, C = x.shape
    ws = window_size
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def window_reverse(
    windows: jnp.ndarray, window_size: int, B: int, H: int, W: int
) -> jnp.ndarray:
    """Inverse of :func:`window_partition`: -> (B, H, W, C)."""
    ws = window_size
    C = windows.shape[-1]
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


@functools.lru_cache(maxsize=32)
def swin_attention_mask(
    H: int, W: int, window_size: int, shift_size: int
) -> np.ndarray:
    """Additive attention mask (nWindows, ws*ws, ws*ws) for shifted windows.

    The reference precomputes a similar mask for a hardcoded 64x64 map but
    never applies it (reference: attention.py:318-343,380-382 "simplified for
    now").  We compute it correctly for the actual padded (H, W) and expose it
    behind ``use_shift_mask`` (default off for reference parity).
    """
    ws, ss = window_size, shift_size
    img = np.zeros((H, W), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
        for wz in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
            img[hs, wz] = cnt
            cnt += 1
    # The slice pattern above already encodes the post-roll window layout
    # (standard Swin construction) — partition directly, no roll.
    nH, nW = H // ws, W // ws
    wins = img.reshape(nH, ws, nW, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = wins[:, None, :] - wins[:, :, None]
    mask = np.where(diff != 0, -100.0, 0.0).astype(np.float32)
    return mask
