"""PyTorch checkpoint conversion: reference state_dict <-> flax variables.

Enables loading reference-trained checkpoints into the TPU model (and the
golden-activation parity tests in tests/test_torch_parity.py).  Name mapping
targets the reference module tree (reference: tfswa_unet.py:56-145,
blocks.py:53-94, attention.py:46-47,116-128).

Layout transforms:
  - Conv2d weight          (Cout, Cin, kh, kw) -> (kh, kw, Cin, Cout)
  - ConvTranspose2d weight (Cin, Cout, kh, kw) -> (kh, kw, Cin, Cout)
  - Linear weight          (out, in)           -> (in, out)
  - BatchNorm running stats -> batch_stats collection
"""
from __future__ import annotations

from typing import Dict, Mapping, Sequence, Tuple

import numpy as np


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _deconv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 0, 1))


def _linear_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)


def _conv_entries(t_prefix: str, f_name: str) -> list:
    return [
        (f"{t_prefix}.weight", ("params", f_name, "kernel"), _conv_w),
        (f"{t_prefix}.bias", ("params", f_name, "bias"), None),
    ]


def _deconv_entries(t_prefix: str, f_name: str) -> list:
    return [
        (f"{t_prefix}.weight", ("params", f_name, "kernel"), _deconv_w),
        (f"{t_prefix}.bias", ("params", f_name, "bias"), None),
    ]


def _bn_entries(t_prefix: str, f_name: str) -> list:
    return [
        (f"{t_prefix}.weight", ("params", f_name, "scale"), None),
        (f"{t_prefix}.bias", ("params", f_name, "bias"), None),
        (f"{t_prefix}.running_mean", ("batch_stats", f_name, "mean"), None),
        (f"{t_prefix}.running_var", ("batch_stats", f_name, "var"), None),
    ]


def _row_block_entries(t_prefix: str, f_path: Tuple[str, ...]) -> list:
    """One attention row-block (tsa/fsa/swa): norm1/attn/norm2/mlp
    (reference: attention.py:116-128)."""
    p = lambda leaf: ("params",) + f_path + (leaf,)
    return [
        (f"{t_prefix}.norm1.weight", p("norm1_scale"), None),
        (f"{t_prefix}.norm1.bias", p("norm1_bias"), None),
        (f"{t_prefix}.attn.qkv.weight", p("qkv_kernel"), _linear_w),
        (f"{t_prefix}.attn.proj.weight", p("proj_kernel"), _linear_w),
        (f"{t_prefix}.attn.proj.bias", p("proj_bias"), None),
        (f"{t_prefix}.norm2.weight", p("norm2_scale"), None),
        (f"{t_prefix}.norm2.bias", p("norm2_bias"), None),
        (f"{t_prefix}.mlp.0.weight", p("fc1_kernel"), _linear_w),
        (f"{t_prefix}.mlp.0.bias", p("fc1_bias"), None),
        (f"{t_prefix}.mlp.3.weight", p("fc2_kernel"), _linear_w),
        (f"{t_prefix}.mlp.3.bias", p("fc2_bias"), None),
    ]


def _tfswa_block_entries(t_prefix: str, f_name: str) -> list:
    entries = []
    entries += _conv_entries(f"{t_prefix}.input_proj.0", f_name)
    # fix paths: conv entries need nested names
    entries = [
        (f"{t_prefix}.input_proj.0.weight",
         ("params", f_name, "input_proj_conv", "kernel"), _conv_w),
        (f"{t_prefix}.input_proj.0.bias",
         ("params", f_name, "input_proj_conv", "bias"), None),
        (f"{t_prefix}.input_proj.1.weight",
         ("params", f_name, "input_proj_bn", "scale"), None),
        (f"{t_prefix}.input_proj.1.bias",
         ("params", f_name, "input_proj_bn", "bias"), None),
        (f"{t_prefix}.input_proj.1.running_mean",
         ("batch_stats", f_name, "input_proj_bn", "mean"), None),
        (f"{t_prefix}.input_proj.1.running_var",
         ("batch_stats", f_name, "input_proj_bn", "var"), None),
        (f"{t_prefix}.fusion.0.weight",
         ("params", f_name, "fusion_conv", "kernel"), _conv_w),
        (f"{t_prefix}.fusion.0.bias",
         ("params", f_name, "fusion_conv", "bias"), None),
        (f"{t_prefix}.fusion.1.weight",
         ("params", f_name, "fusion_bn", "scale"), None),
        (f"{t_prefix}.fusion.1.bias",
         ("params", f_name, "fusion_bn", "bias"), None),
        (f"{t_prefix}.fusion.1.running_mean",
         ("batch_stats", f_name, "fusion_bn", "mean"), None),
        (f"{t_prefix}.fusion.1.running_var",
         ("batch_stats", f_name, "fusion_bn", "var"), None),
    ]
    for attn in ("tsa", "fsa", "swa"):
        entries += _row_block_entries(f"{t_prefix}.{attn}", (f_name, attn))
    return entries


def build_mapping(depths: Sequence[int]) -> list:
    """(torch_name, flax_path, transform) triples for the full model."""
    entries = []
    entries += _conv_entries("stem.0", "stem_conv")
    entries += _bn_entries("stem.1", "stem_bn")
    for s in range(3):
        for i in range(depths[s]):
            entries += _tfswa_block_entries(
                f"encoder_stages.{s}.{i}", f"enc{s}_block{i}"
            )
        entries += [
            (f"downsample_layers.{s}.downsample.0.weight",
             ("params", f"down{s}", "conv", "kernel"), _conv_w),
            (f"downsample_layers.{s}.downsample.0.bias",
             ("params", f"down{s}", "conv", "bias"), None),
        ]
        entries += _bn_entries(
            f"downsample_layers.{s}.downsample.1", None
        )[:0]  # placeholder, replaced below
        entries += [
            (f"downsample_layers.{s}.downsample.1.weight",
             ("params", f"down{s}", "bn", "scale"), None),
            (f"downsample_layers.{s}.downsample.1.bias",
             ("params", f"down{s}", "bn", "bias"), None),
            (f"downsample_layers.{s}.downsample.1.running_mean",
             ("batch_stats", f"down{s}", "bn", "mean"), None),
            (f"downsample_layers.{s}.downsample.1.running_var",
             ("batch_stats", f"down{s}", "bn", "var"), None),
        ]
    for i in range(depths[3]):
        entries += _tfswa_block_entries(f"bottleneck.{i}", f"bottleneck_block{i}")
    for d, s in enumerate(range(2, -1, -1)):
        entries += [
            (f"upsample_layers.{d}.upsample.0.weight",
             ("params", f"up{d}", "deconv", "kernel"), _deconv_w),
            (f"upsample_layers.{d}.upsample.0.bias",
             ("params", f"up{d}", "deconv", "bias"), None),
            (f"upsample_layers.{d}.upsample.1.weight",
             ("params", f"up{d}", "bn", "scale"), None),
            (f"upsample_layers.{d}.upsample.1.bias",
             ("params", f"up{d}", "bn", "bias"), None),
            (f"upsample_layers.{d}.upsample.1.running_mean",
             ("batch_stats", f"up{d}", "bn", "mean"), None),
            (f"upsample_layers.{d}.upsample.1.running_var",
             ("batch_stats", f"up{d}", "bn", "var"), None),
        ]
        for i in range(depths[s]):
            entries += _tfswa_block_entries(
                f"decoder_stages.{d}.{i}", f"dec{d}_block{i}"
            )
    entries += _conv_entries("output_head.0", "head_conv1")
    entries += _bn_entries("output_head.1", "head_bn")
    entries += _conv_entries("output_head.3", "head_conv2")
    return entries


_INVERSE_TRANSFORMS = {
    _conv_w: lambda a: np.transpose(a, (3, 2, 0, 1)),
    _deconv_w: lambda a: np.transpose(a, (2, 3, 0, 1)),
    _linear_w: np.transpose,
    None: lambda a: a,
}


def variables_to_torch_state_dict(
    variables: Mapping, depths: Sequence[int]
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`torch_state_dict_to_variables`: flax variables ->
    reference-named torch state_dict arrays (float32).

    The emitted keys follow the reference module tree exactly, so the dict
    loads both into :class:`..optimization.torch_mirror.TorchTFSWAUNetMirror`
    and into the reference implementation itself (reference:
    tfswa_unet.py:56-145).  ``num_batches_tracked`` buffers are emitted as 0
    for every BatchNorm (torch tracks them; flax has no equivalent).
    """
    sd: Dict[str, np.ndarray] = {}
    for t_name, f_path, transform in build_mapping(depths):
        node = variables[f_path[0]]
        for key in f_path[1:]:
            if key not in node:
                raise KeyError(f"missing flax leaf: {'/'.join(f_path)}")
            node = node[key]
        arr = np.asarray(node, dtype=np.float32)
        sd[t_name] = _INVERSE_TRANSFORMS[transform](arr)
        if t_name.endswith(".running_var"):
            tracked = t_name[: -len("running_var")] + "num_batches_tracked"
            sd[tracked] = np.asarray(0, dtype=np.int64)
    return sd


def torch_state_dict_to_variables(
    state_dict: Mapping[str, "np.ndarray"], depths: Sequence[int]
) -> Dict:
    """Convert a reference torch state_dict (tensors or ndarrays) to flax
    variables {'params': ..., 'batch_stats': ...}."""
    sd = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k] = np.asarray(v)

    out: Dict = {"params": {}, "batch_stats": {}}
    consumed = set()
    for t_name, f_path, transform in build_mapping(depths):
        if t_name not in sd:
            raise KeyError(f"missing torch param: {t_name}")
        arr = sd[t_name]
        if transform is not None:
            arr = transform(arr)
        node = out[f_path[0]]
        for key in f_path[1:-1]:
            node = node.setdefault(key, {})
        node[f_path[-1]] = arr.astype(np.float32)
        consumed.add(t_name)

    leftovers = [
        k for k in sd
        if k not in consumed
        and "num_batches_tracked" not in k
        and "attn_mask" not in k       # unused buffer (reference: attention.py:343)
    ]
    if leftovers:
        raise ValueError(f"unmapped torch params: {leftovers[:10]}")
    return out
