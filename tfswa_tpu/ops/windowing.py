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


@functools.lru_cache(maxsize=32)
def swin_mask_table(
    H: int, W: int, window_size: int, shift_size: int
) -> tuple[np.ndarray, np.ndarray]:
    """:func:`swin_attention_mask` factored as a 4-entry pattern table.

    Every window's mask is one of four patterns — interior (all-zero),
    last window row, last window column, or the corner — because the Swin
    region-id image is uniform except in the final ``ws``-wide bands.
    Returns ``(table, idx)`` with ``table`` (4, ws*ws, ws*ws) f32 additive
    masks and ``idx`` (nH*nW,) int32 pattern ids per window (same window
    order as :func:`window_partition`).

    Materialising ``table[idx]`` reproduces ``swin_attention_mask``
    exactly (tested), but the factored form stays tiny both as HLO
    literals (~64 KB vs hundreds of MB at full-track shapes — the latter
    overflows compile-request limits) and in HBM when gathered per row
    chunk (models/attention.py chunked path).
    """
    ws, ss = window_size, shift_size
    interior = np.zeros(ws, dtype=np.int32)
    last = np.concatenate([
        np.full(ws - ss, 1, np.int32), np.full(ss, 2, np.int32)
    ])
    table = np.zeros((4, ws * ws, ws * ws), dtype=np.float32)
    for kind in range(4):
        rb = last if kind & 2 else interior
        cb = last if kind & 1 else interior
        ids = (3 * rb[:, None] + cb[None, :]).reshape(-1)
        table[kind] = np.where(
            ids[None, :] != ids[:, None], -100.0, 0.0
        ).astype(np.float32)
    nH, nW = H // ws, W // ws
    is_last_row = (np.arange(nH) == nH - 1).astype(np.int32)
    is_last_col = (np.arange(nW) == nW - 1).astype(np.int32)
    idx = (2 * is_last_row[:, None] + is_last_col[None, :]).reshape(-1)
    return table, idx
