"""INT8 quantization (reference: quantization.py:25-402), TPU-native.

The reference wraps torch.quantization (FBGEMM/QNNPACK CPU kernels).  Here:
  - ``quantize_params`` / ``dequantize_params``: symmetric per-output-channel
    int8 weight quantization of every >=2-D kernel (dynamic-quantization
    equivalent, reference: quantize_dynamic quantization.py:25-78).  4x
    smaller checkpoints; compute happens after dequantization, trading the
    reference's CPU int8 kernels for XLA's bf16 MXU path (which is already
    2x fp32 on TPU).
  - ``QuantizedModel``: applies a model from quantized weights.
  - ``compare_models`` / ``benchmark_quantized_model``: output-diff, size and
    latency A/B (reference: quantization.py:243-371).
  - ``fake_quantize_params``: quantize->dequantize in place for QAT-style
    accuracy probes (reference: prepare_qat quantization.py:155-204).
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import TFSWAUNet


def _quantize_leaf(x: np.ndarray) -> Dict:
    """Symmetric int8 with per-output-channel scales (last dim = out)."""
    x = np.asarray(x, np.float32)
    if x.ndim < 2:
        return {"kind": "raw", "value": x}
    axes = tuple(range(x.ndim - 1))
    absmax = np.max(np.abs(x), axis=axes, keepdims=True)
    scale = np.maximum(absmax, 1e-12) / 127.0
    q = np.clip(np.round(x / scale), -127, 127).astype(np.int8)
    return {"kind": "int8", "value": q, "scale": scale.astype(np.float32)}


def _dequantize_leaf(leaf: Dict) -> np.ndarray:
    if leaf["kind"] == "raw":
        return leaf["value"]
    return leaf["value"].astype(np.float32) * leaf["scale"]


def _is_qleaf(x) -> bool:
    return isinstance(x, dict) and "kind" in x


def quantize_params(params) -> Dict:
    """Quantize every >=2-D kernel to int8 (+ scales); 1-D params stay fp32."""
    return jax.tree_util.tree_map(lambda p: _quantize_leaf(np.asarray(p)), params)


def dequantize_params(qparams) -> Dict:
    return jax.tree_util.tree_map(
        _dequantize_leaf, qparams, is_leaf=_is_qleaf
    )


def fake_quantize_params(params) -> Dict:
    """Quantize->dequantize: the fp32 tree a QAT/int8 deployment would see."""
    return dequantize_params(quantize_params(params))


def quantized_size_bytes(qparams) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(qparams, is_leaf=_is_qleaf):
        total += leaf["value"].nbytes
        if leaf["kind"] == "int8":
            total += leaf["scale"].nbytes
    return total


class QuantizedModel:
    """Serve a model from int8 weights (dequantized once at load)
    (reference: QuantizableModel quantization.py:207-240)."""

    def __init__(self, model: TFSWAUNet, qparams: Dict, batch_stats: Dict):
        self.model = model
        self.qparams = qparams
        self.variables = {
            "params": jax.tree_util.tree_map(
                jnp.asarray, dequantize_params(qparams)
            ),
            "batch_stats": batch_stats,
        }
        self._forward = jax.jit(
            lambda x: self.model.apply(self.variables, x, train=False)
        )

    def __call__(self, x):
        return self._forward(x)


def quantize_dynamic(
    model: TFSWAUNet, variables: Dict
) -> Tuple[QuantizedModel, Dict]:
    """Weight-only int8 (reference: quantize_dynamic quantization.py:25-78).
    Returns (quantized model, stats incl. compression ratio)."""
    qparams = quantize_params(variables["params"])
    fp32_bytes = sum(
        np.asarray(p).nbytes for p in jax.tree_util.tree_leaves(variables["params"])
    )
    q_bytes = quantized_size_bytes(qparams)
    stats = {
        "fp32_mb": fp32_bytes / 1024 / 1024,
        "int8_mb": q_bytes / 1024 / 1024,
        "compression_ratio": fp32_bytes / q_bytes,
    }
    return QuantizedModel(model, qparams, variables["batch_stats"]), stats


def quantize_static(
    model: TFSWAUNet, variables: Dict, calibration_batches=None
) -> Tuple[QuantizedModel, Dict]:
    """Static quantization entry point (reference: quantization.py:81-152).
    Weight quantization is calibration-free (symmetric per-channel); the
    calibration argument is accepted for API parity and reserved for future
    activation quantization."""
    del calibration_batches
    return quantize_dynamic(model, variables)


def prepare_qat(model: TFSWAUNet, variables: Dict) -> Dict:
    """QAT preparation (reference: quantization.py:155-204): returns
    variables whose params carry int8 quantization error (quantize ->
    dequantize), ready to fine-tune at the quantized operating point."""
    return {
        "params": fake_quantize_params(variables["params"]),
        "batch_stats": variables["batch_stats"],
    }


import dataclasses as _dataclasses


@_dataclasses.dataclass
class QuantizationConfig:
    """Config holder (reference: quantization.py:374-402)."""

    mode: str = "dynamic"         # dynamic | static | qat
    dtype: str = "int8"
    per_channel: bool = True

    def apply(self, model: TFSWAUNet, variables: Dict):
        if self.mode in ("dynamic", "static"):
            fn = quantize_dynamic if self.mode == "dynamic" else quantize_static
            return fn(model, variables)
        if self.mode == "qat":
            return prepare_qat(model, variables)
        raise ValueError(f"unknown quantization mode {self.mode}")


def compare_models(
    model: TFSWAUNet,
    variables: Dict,
    quantized: QuantizedModel,
    input_shape: Tuple[int, ...] = (1, 2, 256, 64),
) -> Dict[str, float]:
    """Output MSE/MAE between fp32 and quantized models
    (reference: quantization.py:243-297)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(input_shape), jnp.float32)
    ref = model.apply(variables, x, train=False)
    q = quantized(x)
    diff = np.asarray(ref) - np.asarray(q)
    return {
        "mse": float(np.mean(diff ** 2)),
        "mae": float(np.mean(np.abs(diff))),
        "max_abs": float(np.max(np.abs(diff))),
    }


def benchmark_quantized_model(
    model: TFSWAUNet,
    variables: Dict,
    quantized: QuantizedModel,
    input_shape: Tuple[int, ...] = (1, 2, 256, 64),
    num_iters: int = 10,
) -> Dict[str, float]:
    """Latency A/B (reference: quantization.py:336-371)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(input_shape), jnp.float32)
    fp32 = jax.jit(lambda v: model.apply(variables, v, train=False))

    def timed(fn):
        jax.block_until_ready(fn(x))
        t0 = time.perf_counter()
        for _ in range(num_iters):
            out = fn(x)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / num_iters * 1000

    fp32_ms = timed(fp32)
    q_ms = timed(quantized)
    return {
        "fp32_ms": fp32_ms,
        "int8_ms": q_ms,
        "speedup": fp32_ms / q_ms,
    }
