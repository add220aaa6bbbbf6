"""Gradient checkpointing (rematerialization) utilities.

The reference monkey-patches module forwards with torch.utils.checkpoint
(reference: gradient_checkpoint.py:18-173).  On TPU the equivalent is
jax.checkpoint / flax nn.remat with a selectable policy — already wired into
the model via ModelConfig.remat (models/tfswa_unet.py); this module adds the
reference's config-object / estimation API surface on top.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

POLICIES = {
    "none": None,                           # full remat: save nothing extra
    "dots": jax.checkpoint_policies.checkpoint_dots,
    "dots_no_batch": jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
    "everything": jax.checkpoint_policies.everything_saveable,
}


def checkpoint_fn(fn: Callable, policy: str = "none") -> Callable:
    """jax.checkpoint with a named save policy."""
    pol = POLICIES.get(policy)
    if pol is None and policy != "none":
        raise ValueError(f"unknown remat policy {policy}; options {list(POLICIES)}")
    return jax.checkpoint(fn, policy=pol)


def checkpoint_sequential(
    fns: Sequence[Callable], segments: int = 2
) -> Callable:
    """Segment-wise checkpointing of a function chain
    (reference: gradient_checkpoint.py:76-143)."""
    fns = list(fns)
    n = len(fns)
    seg_size = max(1, (n + segments - 1) // segments)

    def run_segment(fs):
        def seg(x):
            for f in fs:
                x = f(x)
            return x

        return jax.checkpoint(seg)

    segs = [run_segment(fns[i : i + seg_size]) for i in range(0, n, seg_size)]

    def forward(x):
        for seg in segs:
            x = seg(x)
        return x

    return forward


@dataclasses.dataclass
class CheckpointConfig:
    """Config-object API (reference: gradient_checkpoint.py:263-306).

    apply() returns a copy of a ModelConfig with remat enabled, since our
    checkpointing is declarative (model flag), not monkey-patching.
    """

    enabled: bool = True
    policy: str = "none"

    def apply(self, model_config):
        return dataclasses.replace(model_config, remat=self.enabled)


def estimate_activation_memory(
    batch: int, freq_bins: int, time_frames: int, dims: Sequence[int],
    depths: Sequence[int], bytes_per_el: int = 4,
) -> dict:
    """Analytic activation-memory estimate with/without remat, replacing the
    reference's CUDA A/B measurement (reference: gradient_checkpoint.py:176-260)
    which has no TPU equivalent for ahead-of-time planning."""
    per_stage = []
    h, w = freq_bins, time_frames
    for level, (d, c) in enumerate(zip(depths, dims)):
        # per TFSWA block: ~input + 3 attention branches + concat + fusion
        acts_per_block = 6 * batch * h * w * c
        per_stage.append(d * acts_per_block)
        if level < len(dims) - 1:
            h, w = (h + 1) // 2, (w + 1) // 2
    total = sum(per_stage) * bytes_per_el
    # remat keeps ~1 activation per block boundary instead of ~6 per block
    with_remat = total / 6.0
    return {
        "no_remat_gb": total / 1e9,
        "with_remat_gb": with_remat / 1e9,
        "savings_gb": (total - with_remat) / 1e9,
        "savings_pct": 100.0 * (1 - with_remat / max(total, 1)),
    }


def get_memory_stats() -> dict:
    """Live device memory stats (reference: gradient_checkpoint.py:176-205
    used torch.cuda memory counters)."""
    stats = {}
    for dev in jax.devices():
        try:
            m = dev.memory_stats()
            stats[str(dev)] = {
                "bytes_in_use_gb": m.get("bytes_in_use", 0) / 1e9,
                "peak_bytes_in_use_gb": m.get("peak_bytes_in_use", 0) / 1e9,
                "bytes_limit_gb": m.get("bytes_limit", 0) / 1e9,
            }
        except Exception:
            stats[str(dev)] = {}
    return stats
