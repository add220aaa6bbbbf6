"""Pallas TPU kernels for the hot ops."""
from .row_attention import flash_row_attention

__all__ = ["flash_row_attention"]
