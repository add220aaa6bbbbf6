"""TFSWA-UNet: triple-attention U-Net over STFT spectrograms.

Reference architecture: tfswa_unet.py:12-245.  Stock config
depths=(2,2,6,2), dims=(32,64,128,256), ws=8, shift=4, heads=8 gives
15,404,834 params at in/out_channels=2 (reference: test_model.py:13-21) —
enforced by tests/test_model.py.

TPU-first layout: the public API accepts NCHW (B, C, F, T) for reference
parity, transposed once to NHWC at the boundary; everything inside is
channels-last so channel dims ride the 128-lane axis and attention needs no
per-block permutes.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from .blocks import DownsampleBlock, TFSWABlock, UpsampleBlock
from .layers import batch_norm, bilinear_resize, conv2d, gelu

Dtype = Any


class TFSWAUNet(nn.Module):
    """Encoder(3 stages)-bottleneck-decoder(3 stages) with additive skips and
    a sigmoid mask head (reference: tfswa_unet.py:34-229)."""

    in_channels: int
    out_channels: int
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    dims: Tuple[int, ...] = (32, 64, 128, 256)
    window_size: int = 8
    shift_size: int = 4
    num_heads: int = 8
    dropout: float = 0.0
    mlp_ratio: float = 4.0
    attn_chunk_size: Optional[int] = 16
    attention_impl: str = "xla"
    use_shift_mask: bool = False
    remat: bool = False
    # Manual mesh axis name for cross-replica BN statistics — set (to
    # "data") only when the train step runs inside shard_map; plain GSPMD
    # and eval paths leave it None (see layers.batch_norm).
    bn_axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    data_format: str = "NCHW"   # public API layout; internals are NHWC

    @classmethod
    def from_config(cls, cfg: ModelConfig) -> "TFSWAUNet":
        return cls(
            in_channels=cfg.in_channels,
            out_channels=cfg.out_channels,
            depths=tuple(cfg.depths),
            dims=tuple(cfg.dims),
            window_size=cfg.window_size,
            shift_size=cfg.shift_size,
            num_heads=cfg.num_heads,
            dropout=cfg.dropout,
            mlp_ratio=cfg.mlp_ratio,
            attn_chunk_size=cfg.attn_chunk_size,
            attention_impl=cfg.attention_impl,
            use_shift_mask=cfg.use_shift_mask,
            remat=cfg.remat,
            dtype=jnp.dtype(cfg.dtype),
            param_dtype=jnp.dtype(cfg.param_dtype),
        )

    def _block(self, stage: str, idx: int, channels: int):
        """TFSWA block with alternating W-MSA / SW-MSA shift
        (reference: tfswa_unet.py:72-73)."""
        shift = 0 if idx % 2 == 0 else self.shift_size
        cls = TFSWABlock
        if self.remat:
            # Rematerialize each block on backward — replaces the reference's
            # forward-monkey-patching checkpointing
            # (reference: gradient_checkpoint.py:44-69).
            cls = nn.remat(TFSWABlock, static_argnums=(2, 3))
        return cls(
            in_channels=channels,
            out_channels=channels,
            window_size=self.window_size,
            shift_size=shift,
            num_heads=self.num_heads,
            dropout=self.dropout,
            mlp_ratio=self.mlp_ratio,
            attn_chunk_size=self.attn_chunk_size,
            attention_impl=self.attention_impl,
            use_shift_mask=self.use_shift_mask,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=f"{stage}_block{idx}",
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert len(self.depths) == len(self.dims) == 4, (
            "Expected 4 stages (3 encoder + bottleneck)"
        )
        if self.data_format == "NCHW":
            x = x.transpose(0, 2, 3, 1)
        x = x.astype(self.dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        # Stem: 7x7 conv + BN + GELU (reference: tfswa_unet.py:58-62)
        x = conv2d(self.dims[0], 7, stride=1, padding=3, name="stem_conv", **kw)(x)
        x = batch_norm(use_running_average=not train, name="stem_bn",
                       axis_name=self.bn_axis_name, **kw)(x)
        x = gelu(x)

        # Encoder (reference: tfswa_unet.py:179-193)
        skips = []
        for s in range(3):
            for i in range(self.depths[s]):
                x = self._block(f"enc{s}", i, self.dims[s])(x, None, train)
            skips.append(x)
            x = DownsampleBlock(
                self.dims[s + 1], bn_axis_name=self.bn_axis_name,
                name=f"down{s}", **kw,
            )(x, train)

        # Bottleneck (reference: tfswa_unet.py:195-197)
        for i in range(self.depths[3]):
            x = self._block("bottleneck", i, self.dims[3])(x, None, train)

        # Decoder (reference: tfswa_unet.py:199-224)
        for d, s in enumerate(range(2, -1, -1)):
            x = UpsampleBlock(
                self.dims[s], bn_axis_name=self.bn_axis_name,
                name=f"up{d}", **kw,
            )(x, train)
            skip = skips[s]
            if x.shape[1:3] != skip.shape[1:3]:
                x = bilinear_resize(x, skip.shape[1:3])
            for i in range(self.depths[s]):
                x = self._block(f"dec{d}", i, self.dims[s])(
                    x, skip if i == 0 else None, train
                )

        # Output head: 3x3 conv + BN + GELU -> 1x1 conv -> sigmoid
        # (reference: tfswa_unet.py:139-145)
        x = conv2d(self.dims[0], 3, stride=1, padding=1, name="head_conv1", **kw)(x)
        x = batch_norm(use_running_average=not train, name="head_bn",
                       axis_name=self.bn_axis_name, **kw)(x)
        x = gelu(x)
        x = conv2d(self.out_channels, 1, name="head_conv2", **kw)(x)
        x = nn.sigmoid(x.astype(jnp.float32))

        if self.data_format == "NCHW":
            x = x.transpose(0, 3, 1, 2)
        return x

    # ------------------------------------------------------------- helpers
    @staticmethod
    def count_parameters(params) -> int:
        import jax

        return sum(p.size for p in jax.tree_util.tree_leaves(params))

    def get_model_info(self, params=None) -> dict:
        info = {
            "architecture": "TFSWA-UNet (tfswa_tpu)",
            "in_channels": self.in_channels,
            "out_channels": self.out_channels,
            "depths": list(self.depths),
            "dims": list(self.dims),
            "num_stages": len(self.depths),
        }
        if params is not None:
            info["num_parameters"] = self.count_parameters(params)
        return info
