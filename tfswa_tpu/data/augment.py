"""Device-side, jittable audio/spectrogram augmentation.

The reference defines augmentation but never wires it into training
(reference: augmentation.py:12-333, absent from trainer.py — SURVEY.md
section 2.2); here it is a first-class, jit-compatible stage the Trainer
actually applies.  All ops keep static shapes (stretch/shift resample within
the fixed segment length), so a traced random rate works under jit.

Pitch shift uses a phase-vocoder + resample, the same construction as
torchaudio.transforms.PitchShift (reference: augmentation.py:95-126) — an
approximation, not bit-parity.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DataConfig, STFTConfig
from ..ops.stft import STFTProcessor


def _linear_resample_positions(x: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
    """Sample x (..., S) at fractional positions (N,); zeros outside."""
    S = x.shape[-1]
    idx0 = jnp.clip(jnp.floor(positions).astype(jnp.int32), 0, S - 1)
    idx1 = jnp.clip(idx0 + 1, 0, S - 1)
    frac = positions - idx0
    y = x[..., idx0] * (1 - frac) + x[..., idx1] * frac
    valid = (positions >= 0) & (positions <= S - 1)
    return jnp.where(valid, y, 0.0)


def time_stretch(x: jnp.ndarray, rate: jnp.ndarray) -> jnp.ndarray:
    """Linear-interpolation time stretch, output length preserved
    (reference: augmentation.py:53-93: interpolate then pad/trim — same
    result as sampling at stride ``rate`` with zero tail)."""
    S = x.shape[-1]
    positions = jnp.arange(S) * rate
    return _linear_resample_positions(x, positions)


def gain(x: jnp.ndarray, gain_db: jnp.ndarray) -> jnp.ndarray:
    """Volume gain in dB (reference: augmentation.py:128-146)."""
    return x * (10.0 ** (gain_db / 20.0))


def phase_vocoder(
    spec: jnp.ndarray, rate: jnp.ndarray, hop_length: int,
    out_frames: Optional[int] = None,
) -> jnp.ndarray:
    """Phase-vocoder time stretch of a complex spectrogram (..., F, T).
    Output has ``out_frames`` frames (static; default T); output frame t
    reads input position t*rate with magnitude interpolation + phase
    accumulation (librosa/torchaudio construction)."""
    F_, T = spec.shape[-2:]
    if out_frames is None:
        out_frames = T
    n_fft = 2 * (F_ - 1)
    phi_advance = (
        2.0 * jnp.pi * hop_length * jnp.arange(F_, dtype=jnp.float32) / n_fft
    )[:, None]
    steps = jnp.arange(out_frames, dtype=jnp.float32) * rate
    idx0 = jnp.clip(jnp.floor(steps).astype(jnp.int32), 0, T - 1)
    idx1 = jnp.clip(idx0 + 1, 0, T - 1)
    frac = steps - idx0

    s0 = spec[..., idx0]
    s1 = spec[..., idx1]
    mag = jnp.abs(s0) * (1 - frac) + jnp.abs(s1) * frac
    mag = jnp.where(steps < T, mag, 0.0)

    dphase = jnp.angle(s1) - jnp.angle(s0) - phi_advance
    dphase = dphase - 2.0 * jnp.pi * jnp.round(dphase / (2.0 * jnp.pi))
    dphase = dphase + phi_advance
    phase0 = jnp.angle(s0[..., :1])
    phase = phase0 + jnp.concatenate(
        [jnp.zeros_like(dphase[..., :1]), jnp.cumsum(dphase[..., :-1], axis=-1)],
        axis=-1,
    )
    return mag * jnp.exp(1j * phase)


def pitch_shift(
    x: jnp.ndarray,
    semitones: jnp.ndarray,
    stft: STFTProcessor,
) -> jnp.ndarray:
    """Pitch shift by fractional semitones at constant duration
    (reference: augmentation.py:95-126 via torchaudio PitchShift, which is
    phase_vocoder(rate=2^(-s/12)) followed by resampling by 2^(s/12)).

    The stretched intermediate is given 2T static frames so pitch-up shifts
    to +12 semitones keep full coverage under jit's static shapes.
    """
    S = x.shape[-1]
    rate = 2.0 ** (-semitones / 12.0)      # pv rate; < 1 stretches longer
    factor = 1.0 / rate
    spec = stft.stft(x)
    T = spec.shape[-1]
    stretched = phase_vocoder(spec, rate, stft.hop_length, out_frames=2 * T)
    wav = stft.istft(stretched, length=2 * S)
    positions = jnp.arange(S) * factor
    return _linear_resample_positions(wav, positions)


def frequency_masking(
    spec: jnp.ndarray, rng: jax.Array, max_width: int = 30
) -> jnp.ndarray:
    """Zero a random frequency band of a (..., F, T) magnitude spectrogram
    (reference: augmentation.py:148-172)."""
    F_ = spec.shape[-2]
    k1, k2 = jax.random.split(rng)
    width = jax.random.randint(k1, (), 0, max_width + 1)
    start = jax.random.randint(k2, (), 0, jnp.maximum(F_ - width, 1))
    f = jnp.arange(F_)[:, None]
    mask = (f >= start) & (f < start + width)
    return jnp.where(mask, 0.0, spec)


def time_masking(
    spec: jnp.ndarray, rng: jax.Array, max_width: int = 40
) -> jnp.ndarray:
    """Zero a random time band (reference: augmentation.py:174-198)."""
    T = spec.shape[-1]
    k1, k2 = jax.random.split(rng)
    width = jax.random.randint(k1, (), 0, max_width + 1)
    start = jax.random.randint(k2, (), 0, jnp.maximum(T - width, 1))
    t = jnp.arange(T)[None, :]
    mask = (t >= start) & (t < start + width)
    return jnp.where(mask, 0.0, spec)


class AudioAugmentation:
    """Waveform augmentation bundle applied with per-op probability
    (reference: augmentation.py:200-248).  Applies the SAME transform to the
    mixture and every stem so the separation identity mixture = sum(stems)
    is preserved.
    """

    def __init__(
        self,
        stft: STFTProcessor,
        time_stretch_range: Tuple[float, float] = (0.9, 1.1),
        pitch_shift_range: Tuple[float, float] = (-2.0, 2.0),
        gain_range_db: Tuple[float, float] = (-6.0, 6.0),
        prob: float = 0.5,
        use_pitch_shift: bool = True,
    ):
        self.stft = stft
        self.time_stretch_range = time_stretch_range
        self.pitch_shift_range = pitch_shift_range
        self.gain_range_db = gain_range_db
        self.prob = prob
        self.use_pitch_shift = use_pitch_shift

    def __call__(
        self, rng: jax.Array, mixture: jnp.ndarray, targets: Dict[str, jnp.ndarray]
    ):
        """mixture (B, C, S), targets {stem: (B, C, S)} -> augmented pair."""
        keys = jax.random.split(rng, 6)
        stack = jnp.concatenate(
            [mixture[:, None]] + [targets[k][:, None] for k in targets], axis=1
        )  # (B, 1+n_stems, C, S)

        # time stretch
        do = jax.random.bernoulli(keys[0], self.prob)
        rate = jax.random.uniform(
            keys[1], (), minval=self.time_stretch_range[0],
            maxval=self.time_stretch_range[1],
        )
        stack = jnp.where(do, time_stretch(stack, rate), stack)

        # pitch shift
        if self.use_pitch_shift:
            do = jax.random.bernoulli(keys[2], self.prob)
            semi = jax.random.uniform(
                keys[3], (), minval=self.pitch_shift_range[0],
                maxval=self.pitch_shift_range[1],
            )
            stack = jnp.where(do, pitch_shift(stack, semi, self.stft), stack)

        # gain
        do = jax.random.bernoulli(keys[4], self.prob)
        g = jax.random.uniform(
            keys[5], (), minval=self.gain_range_db[0], maxval=self.gain_range_db[1],
        )
        stack = jnp.where(do, gain(stack, g), stack)

        mixture_out = stack[:, 0]
        targets_out = {k: stack[:, i + 1] for i, k in enumerate(targets)}
        return mixture_out, targets_out


class MixupAugmentation:
    """lambda ~ Beta(alpha, alpha) convex mix of a batch with its roll
    (reference: augmentation.py:285-333 mixes two samples)."""

    def __init__(self, alpha: float = 0.4, prob: float = 0.5):
        self.alpha = alpha
        self.prob = prob

    def __call__(
        self, rng: jax.Array, mixture: jnp.ndarray, targets: Dict[str, jnp.ndarray]
    ):
        k1, k2 = jax.random.split(rng)
        lam = jax.random.beta(k1, self.alpha, self.alpha)
        do = jax.random.bernoulli(k2, self.prob)
        lam = jnp.where(do, lam, 1.0)

        def mix(x):
            return lam * x + (1 - lam) * jnp.roll(x, 1, axis=0)

        return mix(mixture), {k: mix(v) for k, v in targets.items()}


class SpectrogramAugmentation:
    """Per-item freq/time masking of the model-input spectrogram, each with
    probability ``prob`` (reference: augmentation.py:148-198 transforms,
    227-248 application points — defined there but never wired; wired here
    into the jitted train step).  Applied to the INPUT only, so it acts as
    SpecAugment-style regularization against unmasked targets."""

    def __init__(self, freq_mask_param: int = 30, time_mask_param: int = 40,
                 prob: float = 0.5):
        self.freq_mask_param = freq_mask_param
        self.time_mask_param = time_mask_param
        self.prob = prob

    def __call__(self, rng: jax.Array, spec: jnp.ndarray) -> jnp.ndarray:
        """spec (B, C, F, T) — same mask across channels, fresh per item."""
        B = spec.shape[0]

        def one(key, s):
            k0, k1, k2, k3 = jax.random.split(key, 4)
            masked = frequency_masking(s, k1, self.freq_mask_param)
            s = jnp.where(jax.random.bernoulli(k0, self.prob), masked, s)
            masked = time_masking(s, k3, self.time_mask_param)
            return jnp.where(jax.random.bernoulli(k2, self.prob), masked, s)

        return jax.vmap(one)(jax.random.split(rng, B), spec)


def build_augmentations(cfg: DataConfig, stft: STFTProcessor):
    """Wire augmentation from config (the wiring the reference lacks).
    Returns (waveform_bundle, mixup, spec_augment)."""
    audio_aug = (
        AudioAugmentation(
            stft,
            time_stretch_range=cfg.aug_time_stretch,
            pitch_shift_range=cfg.aug_pitch_shift_semitones,
            gain_range_db=cfg.aug_gain_db,
            prob=cfg.aug_prob,
        )
        if cfg.augment
        else None
    )
    mixup = MixupAugmentation(cfg.mixup_alpha) if cfg.mixup else None
    spec_aug = (
        SpectrogramAugmentation(
            freq_mask_param=cfg.aug_freq_mask_param,
            time_mask_param=cfg.aug_time_mask_param,
            prob=cfg.aug_prob,
        )
        if cfg.spec_augment
        else None
    )
    return audio_aug, mixup, spec_aug
