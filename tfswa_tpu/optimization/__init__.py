"""Optimization: rematerialization, deployment export, quantization."""
from .remat import (
    CheckpointConfig,
    checkpoint_fn,
    checkpoint_sequential,
    estimate_activation_memory,
    get_memory_stats,
)
from .export import (
    aot_compile,
    benchmark_model,
    export_model_info,
    export_stablehlo,
    load_stablehlo,
    make_forward_fn,
    optimize_for_inference,
)
from .quantization import (
    QuantizationConfig,
    prepare_qat,
    QuantizedModel,
    benchmark_quantized_model,
    compare_models,
    dequantize_params,
    fake_quantize_params,
    quantize_dynamic,
    quantize_params,
    quantize_static,
)

__all__ = [
    "CheckpointConfig",
    "checkpoint_fn",
    "checkpoint_sequential",
    "estimate_activation_memory",
    "get_memory_stats",
    "export_stablehlo",
    "load_stablehlo",
    "aot_compile",
    "optimize_for_inference",
    "benchmark_model",
    "export_model_info",
    "make_forward_fn",
    "quantize_params",
    "prepare_qat",
    "QuantizationConfig",
    "dequantize_params",
    "fake_quantize_params",
    "quantize_dynamic",
    "quantize_static",
    "QuantizedModel",
    "compare_models",
    "benchmark_quantized_model",
]
