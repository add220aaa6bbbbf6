"""tfswa_tpu: TPU-native framework for TFSWA-UNet music source separation.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
chynggi/TFSWA-UNet (PyTorch, single-GPU), designed TPU-first:
  - models/       flax.linen TFSWA-UNet (NHWC internals, MXU-shaped matmuls)
  - ops/          framed-matmul STFT/ISTFT, masking, Pallas attention kernels
  - data/         MUSDB18 pipeline with device prefetch + wired augmentation
  - training/     jit-compiled bf16 train step, optax AdamW+cosine, orbax ckpt
  - evaluation/   overlap-add separation, SDR/SI-SDR/SIR/SAR, evaluators
  - optimization/ remat policies, StableHLO export, int8 quantization
  - parallel/     device mesh + GSPMD sharding rules (dp x tp)
"""

__version__ = "0.1.0"

from .config import (
    Config,
    DataConfig,
    EvalConfig,
    MeshConfig,
    ModelConfig,
    STFTConfig,
    TrainConfig,
)

__all__ = [
    "Config",
    "ModelConfig",
    "STFTConfig",
    "DataConfig",
    "TrainConfig",
    "EvalConfig",
    "MeshConfig",
]
