"""Separation metrics: SDR / SI-SDR / SIR / SAR (+ helpers), pure jnp.

Formula-for-formula rebuild of the reference (reference: metrics.py:15-487)
with the loops vectorized:
  - SIR's per-batch interference loop (reference: metrics.py:166-170) becomes
    sum(sources) - sources[target_idx] via take_along_axis.
  - Framewise metrics reshape into (num_segments, ...) and evaluate all
    segments in one batched call instead of a Python loop
    (reference: metrics.py:424-433).

Median aggregation matches torch.median (lower-middle element, not the
numpy average-of-two convention).
"""
from __future__ import annotations

import warnings
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np


def _safe_db(num: jnp.ndarray, den: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """(reference: metrics.py:15-28)"""
    ratio = jnp.maximum(num / (den + eps), eps)
    return 10.0 * jnp.log10(ratio)


def _batched(*arrays):
    if arrays[0].ndim == 1:
        return tuple(a[None] for a in arrays), True
    return arrays, False


def sdr(estimate: jnp.ndarray, reference: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Signal-to-Distortion Ratio in dB (reference: metrics.py:31-71)."""
    assert estimate.shape == reference.shape
    (estimate, reference), squeeze = _batched(estimate, reference)
    signal_power = jnp.sum(reference ** 2, axis=-1)
    noise_power = jnp.sum((estimate - reference) ** 2, axis=-1)
    val = _safe_db(signal_power, noise_power, eps)
    return val[0] if squeeze else val


def si_sdr(estimate: jnp.ndarray, reference: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Scale-invariant SDR in dB (reference: metrics.py:74-125)."""
    assert estimate.shape == reference.shape
    (estimate, reference), squeeze = _batched(estimate, reference)
    estimate = estimate - jnp.mean(estimate, axis=-1, keepdims=True)
    reference = reference - jnp.mean(reference, axis=-1, keepdims=True)
    dot = jnp.sum(estimate * reference, axis=-1, keepdims=True)
    ref_energy = jnp.sum(reference ** 2, axis=-1, keepdims=True)
    scaled_target = dot / (ref_energy + eps) * reference
    error = estimate - scaled_target
    val = _safe_db(
        jnp.sum(scaled_target ** 2, axis=-1), jnp.sum(error ** 2, axis=-1), eps
    )
    return val[0] if squeeze else val


def _project(estimate: jnp.ndarray, reference: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Project estimate onto reference (reference: metrics.py:237-256)."""
    dot = jnp.sum(estimate * reference, axis=-1, keepdims=True)
    ref_energy = jnp.sum(reference ** 2, axis=-1, keepdims=True)
    return dot / (ref_energy + eps) * reference


def sir(
    estimate: jnp.ndarray,
    reference: jnp.ndarray,
    sources: jnp.ndarray,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Signal-to-Interference Ratio (reference: metrics.py:128-185).
    Target source = max-correlation match; interference = sum of the others."""
    if estimate.ndim == 1:
        estimate, reference, sources = estimate[None], reference[None], sources[None]
        squeeze = True
    else:
        squeeze = False
    correlations = jnp.sum(reference[:, None] * sources, axis=-1)  # (B, S)
    target_idx = jnp.argmax(correlations, axis=1)                  # (B,)
    target = jnp.take_along_axis(
        sources, target_idx[:, None, None], axis=1
    )[:, 0]                                                        # (B, T)
    interference = jnp.sum(sources, axis=1) - target
    ref_proj = _project(estimate, reference, eps)
    int_proj = _project(estimate, interference, eps)
    val = _safe_db(
        jnp.sum(ref_proj ** 2, axis=-1), jnp.sum(int_proj ** 2, axis=-1), eps
    )
    return val[0] if squeeze else val


def sar(
    estimate: jnp.ndarray,
    reference: jnp.ndarray,
    sources: jnp.ndarray,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Signal-to-Artifacts Ratio (reference: metrics.py:188-234)."""
    if estimate.ndim == 1:
        estimate, reference, sources = estimate[None], reference[None], sources[None]
        squeeze = True
    else:
        squeeze = False
    allowed = jnp.sum(
        _project(estimate[:, None], sources, eps), axis=1
    )                                                              # (B, T)
    artifacts = estimate - allowed
    val = _safe_db(
        jnp.sum(allowed ** 2, axis=-1), jnp.sum(artifacts ** 2, axis=-1), eps
    )
    return val[0] if squeeze else val


def bss_eval(
    estimate: jnp.ndarray,
    reference: jnp.ndarray,
    sources: jnp.ndarray,
    eps: float = 1e-10,
) -> Dict[str, jnp.ndarray]:
    """All four metrics (reference: metrics.py:259-284)."""
    return {
        "sdr": sdr(estimate, reference, eps),
        "si_sdr": si_sdr(estimate, reference, eps),
        "sir": sir(estimate, reference, sources, eps),
        "sar": sar(estimate, reference, sources, eps),
    }


def _torch_median(values: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """torch.median semantics: lower of the two middle elements."""
    n = values.shape[axis]
    sorted_vals = jnp.sort(values, axis=axis)
    return jnp.take(sorted_vals, (n - 1) // 2, axis=axis)


def median_filter_metrics(
    metrics: Dict[str, jnp.ndarray], window_size: int = 3
) -> Dict[str, jnp.ndarray]:
    """Median filter over per-frame metric arrays (reference: metrics.py:287-313)."""
    out = {}
    for key, values in metrics.items():
        v = np.asarray(values)
        if v.ndim == 0:
            out[key] = values
        else:
            from scipy.ndimage import median_filter

            out[key] = jnp.asarray(median_filter(v, size=window_size))
    return out


class MetricsCalculator:
    """Full-signal or framewise (median-aggregated) metrics
    (reference: metrics.py:316-441)."""

    def __init__(
        self,
        sample_rate: int = 44100,
        segment_length: Optional[int] = None,
        eps: float = 1e-10,
    ):
        self.sample_rate = sample_rate
        self.segment_length = segment_length
        self.eps = eps

    def compute(
        self,
        estimate,
        reference,
        sources=None,
        compute_all: bool = True,
    ) -> Dict[str, float]:
        estimate = jnp.asarray(estimate, jnp.float32)
        reference = jnp.asarray(reference, jnp.float32)
        if sources is not None:
            sources = jnp.asarray(sources, jnp.float32)
        if (
            self.segment_length is not None
            and estimate.shape[-1] > self.segment_length
        ):
            metrics = self._compute_framewise(estimate, reference, sources, compute_all)
        else:
            metrics = self._compute_full(estimate, reference, sources, compute_all)
        return {k: float(jnp.mean(v)) for k, v in metrics.items()}

    def _compute_full(self, estimate, reference, sources, compute_all):
        metrics = {
            "sdr": sdr(estimate, reference, self.eps),
            "si_sdr": si_sdr(estimate, reference, self.eps),
        }
        if compute_all and sources is not None:
            metrics["sir"] = sir(estimate, reference, sources, self.eps)
            metrics["sar"] = sar(estimate, reference, sources, self.eps)
        return metrics

    def _compute_framewise(self, estimate, reference, sources, compute_all):
        """Non-overlapping segments, median-aggregated
        (reference: metrics.py:401-441).  Vectorized over segments."""
        if estimate.ndim == 1:
            estimate, reference = estimate[None], reference[None]
            if sources is not None:
                sources = sources[None]
        B, total = estimate.shape
        seg = self.segment_length
        n_seg = total // seg

        def to_segs(x):  # (B, T) -> (n_seg, B, seg)
            return x[:, : n_seg * seg].reshape(B, n_seg, seg).swapaxes(0, 1)

        est_s, ref_s = to_segs(estimate), to_segs(reference)
        metrics = {
            "sdr": sdr(est_s.reshape(-1, seg), ref_s.reshape(-1, seg)).reshape(n_seg, B),
            "si_sdr": si_sdr(est_s.reshape(-1, seg), ref_s.reshape(-1, seg)).reshape(n_seg, B),
        }
        if compute_all and sources is not None:
            S = sources.shape[1]
            src_s = (
                sources[:, :, : n_seg * seg]
                .reshape(B, S, n_seg, seg)
                .transpose(2, 0, 1, 3)
            )
            metrics["sir"] = sir(
                est_s.reshape(-1, seg), ref_s.reshape(-1, seg),
                src_s.reshape(-1, S, seg),
            ).reshape(n_seg, B)
            metrics["sar"] = sar(
                est_s.reshape(-1, seg), ref_s.reshape(-1, seg),
                src_s.reshape(-1, S, seg),
            ).reshape(n_seg, B)
        return {k: _torch_median(v, axis=0) for k, v in metrics.items()}


def compute_musdb_metrics(
    estimates: Dict[str, np.ndarray],
    references: Dict[str, np.ndarray],
    sample_rate: int = 44100,
) -> Dict[str, Dict[str, float]]:
    """Multi-stem wrapper: all references stacked as sources for SIR/SAR
    (reference: metrics.py:444-487)."""
    calculator = MetricsCalculator(
        sample_rate=sample_rate, segment_length=sample_rate * 10
    )
    all_refs = jnp.stack(
        [jnp.asarray(r, jnp.float32) for r in references.values()]
    )
    results = {}
    for stem_name, est in estimates.items():
        if stem_name not in references:
            warnings.warn(f"Reference for {stem_name} not found, skipping")
            continue
        results[stem_name] = calculator.compute(
            estimate=est,
            reference=references[stem_name],
            sources=all_refs,
            compute_all=True,
        )
    return results
