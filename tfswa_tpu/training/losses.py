"""Separation losses (reference: losses.py:11-304), pure jnp.

All losses run in float32 regardless of model compute dtype (the reference
force-casts too, losses.py:45-46) and reproduce the reference's NaN/Inf
guard — an invalid loss contributes 0 instead of poisoning training
(reference: losses.py:49-62); in jit this is a jnp.where, not a print.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp

from ..ops.stft import stft


def _guard(loss: jnp.ndarray) -> jnp.ndarray:
    """Reference NaN/Inf guard: invalid -> 0.0 (reference: losses.py:49-62)."""
    return jnp.where(jnp.isfinite(loss), loss, 0.0)


def l1_spectrogram_loss(
    pred_spec: jnp.ndarray, target_spec: jnp.ndarray
) -> jnp.ndarray:
    """L1 on magnitudes; complex inputs are abs()'d first
    (reference: losses.py:11-64)."""
    if jnp.iscomplexobj(pred_spec):
        pred_spec = jnp.abs(pred_spec)
    if jnp.iscomplexobj(target_spec):
        target_spec = jnp.abs(target_spec)
    loss = jnp.mean(
        jnp.abs(pred_spec.astype(jnp.float32) - target_spec.astype(jnp.float32))
    )
    return _guard(loss)


def multi_resolution_stft_loss(
    pred_audio: jnp.ndarray,
    target_audio: jnp.ndarray,
    fft_sizes: Sequence[int] = (2048, 1024, 512),
    hop_sizes: Sequence[int] = (512, 256, 128),
    win_lengths: Sequence[int] = (2048, 1024, 512),
    magnitude_weight: float = 1.0,
    log_magnitude_weight: float = 1.0,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Multi-resolution STFT loss: L1 magnitude + L1 log-magnitude at each
    resolution, averaged (reference: losses.py:67-189).

    Accepts (B, C, S) (channels folded into batch, reference: losses.py:161-163)
    or (B, S).
    """
    if pred_audio.ndim == 3:
        B, C, S = pred_audio.shape
        pred_audio = pred_audio.reshape(B * C, S)
        target_audio = target_audio.reshape(B * C, S)
    total = 0.0
    for n_fft, hop, win in zip(fft_sizes, hop_sizes, win_lengths):
        pred_mag = jnp.abs(
            stft(pred_audio, n_fft=n_fft, hop_length=hop, win_length=win)
        )
        target_mag = jnp.abs(
            stft(target_audio, n_fft=n_fft, hop_length=hop, win_length=win)
        )
        if magnitude_weight > 0:
            total += magnitude_weight * jnp.mean(jnp.abs(pred_mag - target_mag))
        if log_magnitude_weight > 0:
            total += log_magnitude_weight * jnp.mean(
                jnp.abs(jnp.log(pred_mag + eps) - jnp.log(target_mag + eps))
            )
    return _guard(total / len(fft_sizes))


class PerceptualLoss:
    """Placeholder, API parity with the reference's unimplemented class
    (reference: losses.py:286-304 raises NotImplementedError)."""

    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, *args, **kwargs):
        raise NotImplementedError(
            "PerceptualLoss is a declared-but-unimplemented capability in the "
            "reference as well (reference: losses.py:296-297)"
        )


def source_separation_loss(
    pred_specs: Dict[str, jnp.ndarray],
    target_specs: Dict[str, jnp.ndarray],
    pred_audios: Optional[Dict[str, jnp.ndarray]] = None,
    target_audios: Optional[Dict[str, jnp.ndarray]] = None,
    l1_weight: float = 1.0,
    mrstft_weight: float = 0.5,
    use_mrstft: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Combined per-stem loss dict (reference: losses.py:192-283).

    Returns {'total_loss', 'l1_loss', 'l1_<stem>', ['mrstft_loss',
    'mrstft_<stem>']} with per-stem losses averaged over stems.
    """
    out: Dict[str, jnp.ndarray] = {}
    stems = list(pred_specs.keys())
    l1_total = 0.0
    for stem in stems:
        l1 = l1_spectrogram_loss(pred_specs[stem], target_specs[stem])
        out[f"l1_{stem}"] = l1
        l1_total = l1_total + l1
    l1_total = l1_total / len(stems)
    out["l1_loss"] = l1_total
    total = l1_weight * l1_total

    if use_mrstft:
        if pred_audios is None or target_audios is None:
            raise ValueError("use_mrstft requires pred/target audios")
        mr_total = 0.0
        for stem in stems:
            mr = multi_resolution_stft_loss(pred_audios[stem], target_audios[stem])
            out[f"mrstft_{stem}"] = mr
            mr_total = mr_total + mr
        mr_total = mr_total / len(stems)
        out["mrstft_loss"] = mr_total
        total = total + mrstft_weight * mr_total

    out["total_loss"] = total
    return out
