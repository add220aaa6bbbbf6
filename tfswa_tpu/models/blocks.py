"""TFSWA block and resampling blocks (NHWC).

Reference equivalents: blocks.py:16-178.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .attention import (
    FrequencySequenceAttention,
    ShiftedWindowAttention,
    TemporalSequenceAttention,
)
from .layers import ConvTranspose2d, batch_norm, bilinear_resize, conv2d, gelu

Dtype = Any


class TFSWABlock(nn.Module):
    """Triple-attention block: input-proj -> {TSA || FSA || SWA} -> concat ->
    1x1 fuse -> +residual (reference: blocks.py:16-148).

    Parity notes:
      - TSA/FSA always run with the default attn_chunk_size; the reference
        never wires TFSWABlock to a different chunk (reference: blocks.py:59-72,
        configs/model/tfswa_unet.yaml:11-12 'tsa_chunk_size' is dead).  Chunking
        does not affect values, only memory, so ours is freely configurable.
      - The reference's in-forward untrained skip Conv2d when skip channels
        mismatch (blocks.py:143-145) is a latent bug never triggered by any
        config; we assert instead of reproducing it.
    """

    in_channels: int
    out_channels: int
    window_size: int
    shift_size: int
    num_heads: int
    dropout: float = 0.0
    mlp_ratio: float = 4.0
    attn_chunk_size: Optional[int] = 16
    attention_impl: str = "xla"
    use_shift_mask: bool = False
    bn_axis_name: Optional[str] = None   # manual mesh axis for synced BN
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        skip: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        identity = x

        # Input projection: 1x1 conv + BN (reference: blocks.py:53-56)
        h = conv2d(self.out_channels, 1, name="input_proj_conv", **kw)(x)
        h = batch_norm(use_running_average=not train, name="input_proj_bn",
                       axis_name=self.bn_axis_name, **kw)(h)

        attn_kw = dict(
            dim=self.out_channels,
            num_heads=self.num_heads,
            dropout=self.dropout,
            mlp_ratio=self.mlp_ratio,
            attention_impl=self.attention_impl,
            **kw,
        )
        det = not train
        tsa_out = TemporalSequenceAttention(
            attn_chunk_size=self.attn_chunk_size, name="tsa", **attn_kw
        )(h, deterministic=det)
        fsa_out = FrequencySequenceAttention(
            attn_chunk_size=self.attn_chunk_size, name="fsa", **attn_kw
        )(h, deterministic=det)
        swa_out = ShiftedWindowAttention(
            window_size=self.window_size,
            shift_size=self.shift_size,
            use_shift_mask=self.use_shift_mask,
            name="swa",
            **attn_kw,
        )(h, deterministic=det)

        combined = jnp.concatenate([tsa_out, fsa_out, swa_out], axis=-1)

        # Fusion: 1x1 conv + BN + GELU (reference: blocks.py:85-89)
        f = conv2d(self.out_channels, 1, name="fusion_conv", **kw)(combined)
        f = batch_norm(use_running_average=not train, name="fusion_bn",
                       axis_name=self.bn_axis_name, **kw)(f)
        f = gelu(f)

        # Residual (projected when channels differ, reference: blocks.py:92-94)
        if self.in_channels != self.out_channels:
            identity = conv2d(self.out_channels, 1, name="skip_proj", **kw)(identity)
        f = f + identity

        # Encoder-skip additive fusion (reference: blocks.py:134-146)
        if skip is not None:
            assert skip.shape[-1] == f.shape[-1], (
                "encoder skip channel mismatch would hit the reference's "
                "untrained in-forward Conv2d bug (blocks.py:143-145); "
                "unsupported by design"
            )
            if skip.shape[1:3] != f.shape[1:3]:
                skip = bilinear_resize(skip, f.shape[1:3])
            f = f + skip
        return f


class DownsampleBlock(nn.Module):
    """Conv k4 s2 p1 + BN + GELU; torch floor-halving shapes
    (reference: blocks.py:151-163)."""

    out_channels: int
    bn_axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = conv2d(self.out_channels, 4, stride=2, padding=1, name="conv", **kw)(x)
        h = batch_norm(use_running_average=not train, name="bn",
                       axis_name=self.bn_axis_name, **kw)(h)
        return gelu(h)


class UpsampleBlock(nn.Module):
    """ConvTranspose k4 s2 p1 + BN + GELU; exact torch output shapes
    (reference: blocks.py:166-178)."""

    out_channels: int
    bn_axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = ConvTranspose2d(
            self.out_channels, kernel_size=4, stride=2, padding=1,
            name="deconv", **kw,
        )(x)
        h = batch_norm(use_running_average=not train, name="bn",
                       axis_name=self.bn_axis_name, **kw)(h)
        return gelu(h)
