"""Profiling & observability: jax.profiler traces, step timing, MFU.

The reference has no profiler integration — only wall-clock loops with
cuda.synchronize (reference: export.py:324-346, SURVEY.md section 5.1).
Here tracing is a first-class module: wrap any region in ``trace`` to get an
XPlane trace viewable in TensorBoard/Perfetto, and attach ``StepTimer`` to
a training loop for step-time and model-FLOPs-utilization counters.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional, Sequence

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


# Peak dense compute per chip, bf16 FLOP/s (public figures).
PEAK_FLOPS = {
    "v4": 275e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "cpu": 1e11,
}


def detect_chip() -> str:
    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return "v5e"
    if "v5p" in kind or "v5" in kind:
        return "v5p"
    if "v4" in kind:
        return "v4"
    return "cpu"


def flops_of(fn, *args) -> Optional[float]:
    """Compiler cost-analysis FLOPs of a jitted function, if available."""
    try:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0)) or None
    except Exception:
        return None


class StepTimer:
    """Step-time / throughput / MFU counters for a training loop."""

    def __init__(self, flops_per_step: Optional[float] = None,
                 items_per_step: Optional[int] = None):
        self.flops_per_step = flops_per_step
        self.items_per_step = items_per_step
        self.peak = PEAK_FLOPS[detect_chip()] * max(1, jax.device_count())
        self._times: list = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
        self._last = now

    def metrics(self, window: int = 50) -> Dict[str, float]:
        if not self._times:
            return {}
        recent = self._times[-window:]
        step_time = float(np.mean(recent))
        out = {
            "step_time_s": step_time,
            "steps_per_sec": 1.0 / step_time,
        }
        if self.items_per_step:
            out["items_per_sec"] = self.items_per_step / step_time
        if self.flops_per_step:
            out["mfu"] = self.flops_per_step / step_time / self.peak
        return out


def device_memory_report() -> Dict[str, Dict[str, float]]:
    """Per-device HBM usage (replaces reference utils/memory_monitor.py:6-93
    CUDA prints — and unlike the reference's, this one is actually wired:
    the Trainer can log it)."""
    report = {}
    for dev in jax.devices():
        try:
            stats = dev.memory_stats() or {}
            report[str(dev)] = {
                "in_use_gb": stats.get("bytes_in_use", 0) / 1e9,
                "peak_gb": stats.get("peak_bytes_in_use", 0) / 1e9,
                "limit_gb": stats.get("bytes_limit", 0) / 1e9,
            }
        except Exception:
            report[str(dev)] = {}
    return report
