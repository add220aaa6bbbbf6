"""INT8 quantization (reference: quantization.py:25-402), TPU-native.

The reference wraps torch.quantization (FBGEMM/QNNPACK CPU kernels).  Here:
  - ``quantize_params`` / ``dequantize_params``: symmetric per-output-channel
    int8 weight quantization of every >=2-D kernel (reference:
    quantize_dynamic quantization.py:25-78).  4x smaller checkpoints.
  - ``QuantizedModel``: applies a model from quantized weights; with
    compute="int8" the attention/MLP dense matmuls genuinely run
    int8 x int8 -> int32 on the MXU (ops/int8.py).
  - ``quantize_static`` / ``calibrate_act_scales``: the reference's
    calibration loop (quantization.py:116-148) — static activation scales
    observed over calibration batches, consumed by the int8 compute path.
  - ``compare_models`` / ``benchmark_quantized_model``: output-diff, size and
    latency A/B (reference: quantization.py:243-371).
  - ``fake_quantize_params``: quantize->dequantize in place for QAT-style
    accuracy probes (reference: prepare_qat quantization.py:155-204).
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional, Tuple

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
    """Serve a model from int8 weights (reference: QuantizableModel
    quantization.py:207-240).

    compute="dequant": weights dequantize once at load; matmuls run bf16/f32
    on the MXU (weight-storage quantization only).
    compute="int8":   every dense matmul in the attention/MLP stack runs
    int8 x int8 -> int32 on the MXU (ops/int8.py), with dynamic activation
    scales or the static scales calibrated by ``quantize_static``.
    """

    def __init__(self, model: TFSWAUNet, qparams: Dict, batch_stats: Dict,
                 compute: str = "dequant", act_scales: Optional[Dict] = None):
        if compute not in ("dequant", "int8"):
            raise ValueError(f"unknown compute mode {compute}")
        self.compute = compute
        self.model = (
            model.clone(attention_impl="int8") if compute == "int8" else model
        )
        self.qparams = qparams
        self.variables = {
            "params": jax.tree_util.tree_map(
                jnp.asarray, dequantize_params(qparams)
            ),
            "batch_stats": batch_stats,
        }
        if act_scales is not None:
            self.variables["act_scales"] = act_scales
        self._forward = jax.jit(
            lambda x: self.model.apply(self.variables, x, train=False)
        )

    def __call__(self, x):
        return self._forward(x)


def quantize_dynamic(
    model: TFSWAUNet, variables: Dict, compute: str = "dequant"
) -> Tuple[QuantizedModel, Dict]:
    """Dynamic int8 (reference: quantize_dynamic quantization.py:25-78):
    weights statically quantized per-channel; with compute="int8" the dense
    matmuls run in int8 with per-call dynamic activation scales (the torch
    quantize_dynamic semantics).  Returns (quantized model, stats)."""
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
    qmodel = QuantizedModel(
        model, qparams, variables["batch_stats"], compute=compute
    )
    return qmodel, stats


def calibrate_act_scales(
    model: TFSWAUNet, variables: Dict, calibration_batches, max_batches: int = 100
) -> Dict:
    """Observe per-site activation absmax over calibration data
    (reference calibration loop: quantization.py:116-148, <=100 batches).

    Runs the int8-impl model with a mutable "act_stats" collection — each
    attention module sows the running max of the dynamic scales it computed —
    and folds the per-batch stats into one static "act_scales" tree.
    """
    int8_model = model.clone(attention_impl="int8")
    apply = jax.jit(
        lambda v, x: int8_model.apply(
            v, x, train=False, mutable=["act_stats"]
        )[1]["act_stats"]
    )
    merged = None
    for i, batch in enumerate(calibration_batches):
        if i >= max_batches:
            break
        x = jnp.asarray(batch, jnp.float32)
        stats = jax.device_get(apply(variables, x))
        merged = stats if merged is None else jax.tree_util.tree_map(
            np.maximum, merged, stats
        )
    if merged is None:
        raise ValueError("calibration_batches is empty")
    return jax.tree_util.tree_map(jnp.asarray, merged)


def quantize_static(
    model: TFSWAUNet, variables: Dict, calibration_batches=None
) -> Tuple[QuantizedModel, Dict]:
    """Static int8 (reference: quantization.py:81-152): per-channel int8
    weights AND int8 compute with activation scales fixed from a calibration
    pass over ``calibration_batches`` (an iterable of model inputs).  Without
    calibration data this degrades to dynamic activation scales."""
    qparams = quantize_params(variables["params"])
    act_scales = None
    if calibration_batches is not None:
        # calibrate at the quantized-weight operating point
        deq = {
            "params": jax.tree_util.tree_map(
                jnp.asarray, dequantize_params(qparams)
            ),
            "batch_stats": variables["batch_stats"],
        }
        act_scales = calibrate_act_scales(model, deq, calibration_batches)
    qmodel = QuantizedModel(
        model, qparams, variables["batch_stats"],
        compute="int8", act_scales=act_scales,
    )
    fp32_bytes = sum(
        np.asarray(p).nbytes for p in jax.tree_util.tree_leaves(variables["params"])
    )
    q_bytes = quantized_size_bytes(qparams)
    stats = {
        "fp32_mb": fp32_bytes / 1024 / 1024,
        "int8_mb": q_bytes / 1024 / 1024,
        "compression_ratio": fp32_bytes / q_bytes,
        "calibrated": act_scales is not None,
    }
    return qmodel, stats


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
