"""TFSWA-UNet model family (flax.linen, NHWC internals)."""
from .attention import (
    FrequencySequenceAttention,
    scaled_dot_product_attention,
    MultiHeadAttention,
    RowBlockParams,
    ShiftedWindowAttention,
    TemporalSequenceAttention,
    mha_rows,
    row_transformer_block,
)
from .blocks import DownsampleBlock, TFSWABlock, UpsampleBlock
from .tfswa_unet import TFSWAUNet

__all__ = [
    "TFSWAUNet",
    "TFSWABlock",
    "DownsampleBlock",
    "UpsampleBlock",
    "TemporalSequenceAttention",
    "FrequencySequenceAttention",
    "ShiftedWindowAttention",
    "MultiHeadAttention",
    "RowBlockParams",
    "mha_rows",
    "scaled_dot_product_attention",
    "row_transformer_block",
]
