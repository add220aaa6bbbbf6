"""Deployment export + inference benchmarking.

The reference exports ONNX / TorchScript (reference: export.py:17-224).
Artifacts here:
  - real ONNX via a self-contained torch mirror (export_to_onnx);
  - a reference-loadable torch checkpoint (export_torch_checkpoint);
  - StableHLO serialization via jax.export — portable, runnable from any
    XLA-backed runtime;
  - TF SavedModel via jax2tf;
  - AOT compilation (jit(...).lower().compile()) for in-process serving.

benchmark utilities mirror the reference's (reference: export.py:287-363):
ms/iter, throughput, and audio real-time factor.
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import TFSWAUNet


def make_forward_fn(model: TFSWAUNet, variables: Dict) -> Callable:
    """Closed-over eval-mode forward: x (B, C, F, T) -> masks."""

    def forward(x):
        return model.apply(variables, x, train=False)

    return forward


def export_stablehlo(
    model: TFSWAUNet,
    variables: Dict,
    output_path: str,
    input_shape: Tuple[int, ...] = (1, 2, 1025, 259),
    verify: bool = True,
) -> Dict:
    """Serialize the eval-mode forward to StableHLO bytes
    (substitutes reference export_to_onnx, export.py:17-139; same canonical
    input shape (1, 2, 1025, 259) = n_fft 2048, ~6 s audio).

    Returns export metadata incl. max-abs-diff of a reloaded-module check
    (reference verifies ONNX vs torch < 1e-4, export.py:100-129).
    """
    from jax import export as jax_export

    forward = make_forward_fn(model, variables)
    x = jnp.zeros(input_shape, jnp.float32)
    exported = jax_export.export(jax.jit(forward))(x)
    blob = exported.serialize()
    with open(output_path, "wb") as fh:
        fh.write(blob)

    info = {
        "path": output_path,
        "bytes": len(blob),
        "input_shape": list(input_shape),
        "platforms": list(exported.platforms),
    }
    if verify:
        reloaded = jax_export.deserialize(blob)
        rng = np.random.default_rng(0)
        probe = jnp.asarray(rng.standard_normal(input_shape), jnp.float32)
        ref_out = forward(probe)
        new_out = reloaded.call(probe)
        diff = float(jnp.max(jnp.abs(ref_out - new_out)))
        info["max_abs_diff"] = diff
        if not diff < 1e-4:  # explicit raise: asserts vanish under python -O
            raise RuntimeError(f"export verification failed: {diff}")
    return info


def export_savedmodel(
    model: TFSWAUNet,
    variables: Dict,
    output_dir: str,
    input_shape: Tuple[int, ...] = (1, 2, 1025, 259),
    verify: bool = True,
) -> Dict:
    """Export the eval-mode forward as a TensorFlow SavedModel via jax2tf.

    Cross-framework interchange artifact (with export_stablehlo) standing in
    for the reference's ONNX export (reference: export.py:17-139): a
    SavedModel is loadable from TF Serving / TFLite converters / any TF
    runtime without JAX installed.  Weights are embedded as constants
    (tf.Variables of the closed-over params).
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    forward = make_forward_fn(model, variables)
    tf_fn = tf.function(
        jax2tf.convert(jax.jit(forward), with_gradient=False),
        input_signature=[tf.TensorSpec(list(input_shape), tf.float32)],
        autograph=False,
    )
    module = tf.Module()
    module.serve = tf_fn
    tf.saved_model.save(
        module, output_dir,
        signatures={"serving_default": tf_fn},
    )

    info = {"path": output_dir, "input_shape": list(input_shape)}
    if verify:
        reloaded = tf.saved_model.load(output_dir)
        rng = np.random.default_rng(0)
        probe = rng.standard_normal(input_shape).astype(np.float32)
        ref_out = np.asarray(forward(jnp.asarray(probe)))
        new_out = reloaded.serve(tf.constant(probe)).numpy()
        diff = float(np.max(np.abs(ref_out - new_out)))
        info["max_abs_diff"] = diff
        if not diff < 1e-4:  # explicit raise: asserts vanish under python -O
            raise RuntimeError(f"SavedModel verification failed: {diff}")
    return info


def _build_mirror(model: TFSWAUNet, variables: Dict):
    from .torch_mirror import mirror_from_variables

    return mirror_from_variables(
        in_channels=model.in_channels,
        out_channels=model.out_channels,
        variables=jax.device_get(variables),
        depths=tuple(model.depths),
        dims=tuple(model.dims),
        window_size=model.window_size,
        shift_size=model.shift_size,
        num_heads=model.num_heads,
        mlp_ratio=model.mlp_ratio,
        use_shift_mask=model.use_shift_mask,
    )


@contextlib.contextmanager
def _onnx_proto_passthrough():
    """Let torch.onnx.export run without the `onnx` package installed.

    The TorchScript exporter serializes the ModelProto itself; its one hard
    dependency on `onnx` is `_add_onnxscript_fn`, a post-step that scans the
    finished proto for custom onnxscript function ops and returns the bytes
    UNCHANGED when none are registered (we register none — see
    torch/onnx/_internal/torchscript_exporter/onnx_proto_utils.py).  When
    `onnx` is importable the original is kept; otherwise the step is patched
    to the identity it would have been.
    """
    try:
        import onnx  # noqa: F401

        yield
        return
    except ImportError:
        pass
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = (
        lambda model_bytes, custom_opsets: model_bytes
    )
    try:
        yield
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig


def export_to_onnx(
    model: TFSWAUNet,
    variables: Dict,
    output_path: str,
    input_shape: Tuple[int, ...] = (1, 2, 1025, 259),
    opset_version: int = 14,
    verify: bool = True,
) -> Dict:
    """Real ONNX export (reference: export.py:17-139, same canonical input
    shape and opset 14).

    The eval-mode forward is exported by tracing a self-contained torch
    mirror (optimization/torch_mirror.py) loaded with the converted JAX
    variables; `verify` checks the mirror elementwise against the JAX
    forward on a random probe (< 1e-4) — i.e. the traced graph's semantics,
    not just its serialization.  onnxruntime parity (reference:
    export.py:100-129) is documented as an offline step: this environment
    has no onnxruntime, and the traced graph equals the verified mirror.

    The batch axis is exported dynamic.  The time axis is NOT (unlike the
    reference's declared-but-unsound dynamic time axis): SWA's pad-to-window
    arithmetic is baked at trace time, so a dynamic time axis would be
    silently wrong for other lengths — export one artifact per segment
    length instead.
    """
    import torch

    mirror = _build_mirror(model, variables)
    rng = np.random.default_rng(0)
    probe = rng.standard_normal(input_shape).astype(np.float32)

    info: Dict = {
        "path": output_path,
        "input_shape": list(input_shape),
        "opset_version": opset_version,
    }
    if verify:
        forward = make_forward_fn(model, variables)
        ref_out = np.asarray(forward(jnp.asarray(probe)))
        with torch.no_grad():
            mirror_out = mirror(torch.from_numpy(probe)).numpy()
        diff = float(np.max(np.abs(ref_out - mirror_out)))
        info["max_abs_diff_vs_jax"] = diff
        if not diff < 1e-4:
            raise RuntimeError(f"torch mirror disagrees with JAX: {diff}")

    with _onnx_proto_passthrough():
        torch.onnx.export(
            mirror,
            (torch.from_numpy(probe),),
            output_path,
            opset_version=opset_version,
            dynamo=False,
            input_names=["spectrogram"],
            output_names=["masks"],
            dynamic_axes={"spectrogram": {0: "batch"}, "masks": {0: "batch"}},
        )

    import os

    size = os.path.getsize(output_path)
    n_params = sum(
        int(np.asarray(p).size)
        for p in jax.tree_util.tree_leaves(variables["params"])
    )
    if size < 4 * n_params:  # weights are embedded f32 — must dominate
        raise RuntimeError(
            f"ONNX artifact suspiciously small: {size} bytes for "
            f"{n_params} params"
        )
    info["bytes"] = size
    return info


def export_torch_checkpoint(
    model: TFSWAUNet, variables: Dict, output_path: str
) -> Dict:
    """Save trained JAX variables as a reference-format torch checkpoint.

    Closes the interop loop: evaluation.inference already loads reference
    ``.pt`` files; this emits one the REFERENCE code itself can load
    (``{'model_state_dict': ..., 'config': ...}``, the subset of the
    reference Trainer's checkpoint dict its eval loader reads, reference:
    trainer.py:525-554, inference.py:317-341).
    """
    import torch

    from ..utils.torch_compat import variables_to_torch_state_dict

    sd_np = variables_to_torch_state_dict(
        jax.device_get(variables), tuple(model.depths)
    )
    state_dict = {
        k: torch.from_numpy(np.array(v)) for k, v in sd_np.items()
    }
    ckpt = {
        "model_state_dict": state_dict,
        "config": {
            "in_channels": model.in_channels,
            "out_channels": model.out_channels,
            "depths": list(model.depths),
            "dims": list(model.dims),
            "window_size": model.window_size,
            "shift_size": model.shift_size,
            "num_heads": model.num_heads,
        },
    }
    torch.save(ckpt, output_path)
    return {
        "path": output_path,
        "num_tensors": len(state_dict),
    }


def load_stablehlo(path: str) -> Callable:
    from jax import export as jax_export

    with open(path, "rb") as fh:
        exported = jax_export.deserialize(fh.read())
    return exported.call


def aot_compile(
    model: TFSWAUNet, variables: Dict, input_shape: Tuple[int, ...]
) -> Callable:
    """Ahead-of-time compiled forward (TorchScript-equivalent serving artifact,
    reference: export.py:142-224)."""
    forward = jax.jit(make_forward_fn(model, variables))
    lowered = forward.lower(jnp.zeros(input_shape, jnp.float32))
    return lowered.compile()


def fold_batch_norms(variables: Dict) -> Dict:
    """Fold every eval-mode BatchNorm into its preceding conv, exactly.

    For y = BN(conv(x; W, b)) with per-channel scale s = gamma/sqrt(var+eps):
    W' = W * s (out-channel axis, the last kernel axis for both nn.Conv and
    ConvTranspose2d here), b' = (b - mean) * s + beta, and the BN variables
    become an exact identity (mean 0, var 1, gamma sqrt(1+eps), beta 0).
    Conv<->BN pairing follows the model's naming convention:
    ``X_bn`` pairs with ``X_conv`` (head_bn with head_conv1), and a bare
    ``bn`` pairs with its module's single conv/deconv.

    Inference-only (training BN uses batch statistics).  Removes one
    elementwise normalisation pass per conv before XLA even sees the graph.
    """
    import copy

    eps = 1e-5
    params = copy.deepcopy(jax.device_get(variables["params"]))
    stats = copy.deepcopy(jax.device_get(variables["batch_stats"]))

    def conv_key(parent_params: Dict, bn_name: str) -> Optional[str]:
        if bn_name == "bn":
            for cand in ("conv", "deconv"):
                if cand in parent_params:
                    return cand
            return None
        base = bn_name[: -len("_bn")]
        for cand in (base + "_conv", base + "_conv1", base + "_deconv"):
            if cand in parent_params:
                return cand
        return None

    def walk(p_node: Dict, s_node: Dict):
        for name, s_child in list(s_node.items()):
            if not isinstance(s_child, dict):
                continue
            if "mean" in s_child and "var" in s_child:
                ck = conv_key(p_node, name)
                bn_p = p_node.get(name, {})
                if ck is None or "scale" not in bn_p \
                        or "bias" not in p_node[ck]:
                    continue  # unknown pairing / bias-free conv: keep BN
                mean = np.asarray(s_child["mean"], np.float64)
                var = np.asarray(s_child["var"], np.float64)
                gamma = np.asarray(bn_p["scale"], np.float64)
                beta = np.asarray(bn_p["bias"], np.float64)
                s = gamma / np.sqrt(var + eps)
                conv = p_node[ck]
                kernel = np.asarray(conv["kernel"], np.float64)
                conv["kernel"] = (kernel * s).astype(np.float32)
                bias = np.asarray(conv.get("bias", np.zeros_like(mean)),
                                  np.float64)
                conv["bias"] = ((bias - mean) * s + beta).astype(np.float32)
                # BN -> exact identity
                s_child["mean"] = np.zeros_like(mean, dtype=np.float32)
                s_child["var"] = np.ones_like(var, dtype=np.float32)
                bn_p["scale"] = np.full_like(
                    gamma, np.sqrt(1.0 + eps), dtype=np.float32)
                bn_p["bias"] = np.zeros_like(beta, dtype=np.float32)
            elif name in p_node and isinstance(p_node[name], dict):
                walk(p_node[name], s_child)

    walk(params, stats)
    out = dict(variables)
    out["params"] = jax.tree_util.tree_map(jnp.asarray, params)
    out["batch_stats"] = jax.tree_util.tree_map(jnp.asarray, stats)
    return out


def optimize_for_inference(model: TFSWAUNet, variables: Dict) -> Tuple[Callable, Dict]:
    """Inference-ready closure (reference: export.py:227-284 freezes BN +
    requires_grad and stubs fusion): here BN layers are FOLDED into their
    convs exactly (fold_batch_norms), stats frozen, and the returned forward
    closes over the folded variables (XLA fuses the rest)."""
    folded = fold_batch_norms(variables)
    return make_forward_fn(model, folded), folded


def benchmark_model(
    forward: Callable,
    input_shape: Tuple[int, ...] = (1, 2, 1025, 259),
    num_warmup: int = 3,
    num_iters: int = 20,
    hop_length: int = 512,
    sample_rate: int = 44100,
) -> Dict[str, float]:
    """Latency/throughput benchmark (reference: export.py:287-363).

    Reports ms/iter, items/s, and the audio real-time factor implied by the
    spectrogram's frame count (reference: export.py:343-346)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(input_shape), jnp.float32)
    for _ in range(num_warmup):
        jax.block_until_ready(forward(x))
    t0 = time.perf_counter()
    for _ in range(num_iters):
        out = forward(x)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    ms_per_iter = 1000.0 * elapsed / num_iters
    batch, _, _, time_frames = input_shape
    audio_seconds = batch * time_frames * hop_length / sample_rate
    return {
        "ms_per_iter": ms_per_iter,
        "iters_per_sec": num_iters / elapsed,
        "batch_per_sec": batch * num_iters / elapsed,
        "audio_sec_per_sec": audio_seconds / (elapsed / num_iters),
        "rtf": (elapsed / num_iters) / audio_seconds,
    }


def export_model_info(
    model: TFSWAUNet, variables: Dict, output_path: Optional[str] = None
) -> Dict:
    """Param counts + per-top-level-module breakdown -> JSON
    (reference: export.py:366-402)."""
    params = variables["params"]
    per_module = {
        name: int(
            sum(p.size for p in jax.tree_util.tree_leaves(sub))
        )
        for name, sub in params.items()
    }
    total = int(sum(per_module.values()))
    info = {
        "architecture": "TFSWA-UNet (tfswa_tpu)",
        "num_parameters": total,
        "fp32_size_mb": total * 4 / 1024 / 1024,
        "bf16_size_mb": total * 2 / 1024 / 1024,
        "int8_size_mb": total / 1024 / 1024,
        "modules": per_module,
        "model_info": model.get_model_info(params),
    }
    if output_path:
        with open(output_path, "w") as fh:
            json.dump(info, fh, indent=2)
    return info
