"""Torch-semantics layer primitives on NHWC layouts.

The model runs NHWC internally (channels-last is the natural TPU layout: the
channel dim lands on the 128-wide lane dim, and attention wants channels last
anyway), while reproducing the reference's PyTorch shape rules and weight
init exactly:
  - Conv2d k/s/p floor-division shapes (reference: blocks.py:151-163)
  - ConvTranspose2d k4 s2 p1 output shapes (reference: blocks.py:166-178)
  - BatchNorm2d momentum 0.1 / eps 1e-5 (torch defaults)
  - Kaiming-normal(fan_out) conv init, trunc-normal(0.02) linear init, BN=1/0
    (reference: tfswa_unet.py:149-162)
  - exact (erf) GELU, matching torch nn.GELU default

Factory helpers return configured flax modules directly so the param tree
stays flat (e.g. "qkv/kernel"), keeping torch state_dict conversion 1:1.
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — torch nn.GELU default; jax.nn.gelu defaults to tanh."""
    return jax.nn.gelu(x, approximate=False)


def kaiming_normal_fan_out() -> Callable:
    """Kaiming normal, fan_out, relu gain — torch's conv init
    (reference: tfswa_unet.py:152-153)."""
    return nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def trunc_normal_002() -> Callable:
    """Truncated normal std 0.02 (+/-2 std) — torch's linear init
    (reference: tfswa_unet.py:159-160)."""
    return nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def dense(features: int, *, use_bias: bool = True, dtype=jnp.float32,
          param_dtype=jnp.float32, name: str) -> nn.Dense:
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=trunc_normal_002(),
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        param_dtype=param_dtype,
        name=name,
    )


def conv2d(features: int, kernel_size: int, *, stride: int = 1, padding: int = 0,
           use_bias: bool = True, dtype=jnp.float32, param_dtype=jnp.float32,
           name: str) -> nn.Conv:
    """NHWC conv with torch Conv2d padding/stride semantics.
    Kernel layout (kh, kw, Cin, Cout); torch weight maps via permute(2,3,1,0)."""
    return nn.Conv(
        features,
        kernel_size=(kernel_size, kernel_size),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        use_bias=use_bias,
        kernel_init=kaiming_normal_fan_out(),
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        param_dtype=param_dtype,
        name=name,
    )


def batch_norm(*, use_running_average: bool, dtype=jnp.float32,
               param_dtype=jnp.float32, name: str,
               axis_name=None) -> nn.BatchNorm:
    """BatchNorm with torch defaults.

    Cross-replica semantics: under plain GSPMD jit with a sharded batch,
    XLA reduces over the *global* batch automatically (no axis_name).
    Under shard_map's MANUAL 'data' axis (the collective-free dp path,
    round 5) the batch reduction is per-device unless ``axis_name`` names
    the manual axis — then flax pmeans mean/var across it, restoring exact
    global-batch statistics.  axis_name is only consulted when batch stats
    are computed (train mode), so eval paths outside shard_map are safe."""
    return nn.BatchNorm(
        use_running_average=use_running_average,
        momentum=0.9,   # flax momentum = 1 - torch momentum(0.1)
        epsilon=1e-5,
        dtype=dtype,
        param_dtype=param_dtype,
        axis_name=axis_name,
        name=name,
    )


def layer_norm(*, dtype=jnp.float32, param_dtype=jnp.float32,
               name: str) -> nn.LayerNorm:
    return nn.LayerNorm(epsilon=1e-5, dtype=dtype, param_dtype=param_dtype, name=name)


def _kaiming_convtranspose_torch(key, shape, dtype):
    """torch kaiming fan_out on ConvTranspose2d weight (Cin, Cout, kh, kw)
    computes fan_out = Cin * kh * kw.  Our kernel layout is (kh, kw, Cin, Cout)."""
    kh, kw, cin, _ = shape
    std = float(np.sqrt(2.0 / (cin * kh * kw)))
    return std * jax.random.normal(key, shape, dtype)


class ConvTranspose2d(nn.Module):
    """NHWC transposed conv matching torch ConvTranspose2d(k, s, p) exactly.

    Implemented via the identity
        conv_transpose(x, W) == conv(dilate(x, s), flip(W), pad = k - 1 - p)
    as one lax.conv_general_dilated call (XLA lowers it onto the MXU).
    Kernel stored (kh, kw, Cin, Cout); torch weight (Cin, Cout, kh, kw)
    maps via permute(2, 3, 0, 1).
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s, p = self.kernel_size, self.stride, self.padding
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            _kaiming_convtranspose_torch,
            (k, k, in_ch, self.features),
            self.param_dtype,
        )
        w = jnp.flip(kernel, axis=(0, 1)).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w,
            window_strides=(1, 1),
            padding=((k - 1 - p, k - 1 - p), (k - 1 - p, k - 1 - p)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + bias.astype(self.dtype)
        return y


def bilinear_resize(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """NHWC bilinear resize matching torch F.interpolate(align_corners=False)
    (reference: tfswa_unet.py:210-216, blocks.py:136-142)."""
    B, H, W, C = x.shape
    if (H, W) == tuple(size):
        return x
    return jax.image.resize(x, (B, size[0], size[1], C), method="bilinear")
