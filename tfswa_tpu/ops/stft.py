"""STFT/ISTFT as framed matmuls against precomputed DFT bases.

TPU-native replacement for the reference's per-(batch, channel) Python loops
over ``torchaudio.transforms.Spectrogram`` (reference: stft_processor.py:116-124,
171-177).  Everything here is a pure, jittable function batched over arbitrary
leading dims: frames are gathered with a static index matrix and projected with
one (n_fft, 2F) matmul that maps straight onto the MXU.  Matches
``torch.stft(center=True, pad_mode='reflect', periodic window)`` semantics,
validated by round-trip tests (reference tolerance: test_phase2.py:41-52).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import STFTConfig

_EPS = 1e-11


def get_window(name: str, win_length: int) -> np.ndarray:
    """Periodic analysis windows matching torch.*_window(periodic=True)
    (reference: stft_processor.py:76-85)."""
    n = np.arange(win_length, dtype=np.float64)
    if name == "hann":
        w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    elif name == "hamming":
        w = 0.54 - 0.46 * np.cos(2.0 * np.pi * n / win_length)
    elif name == "blackman":
        x = 2.0 * np.pi * n / win_length
        w = 0.42 - 0.5 * np.cos(x) + 0.08 * np.cos(2.0 * x)
    else:
        raise ValueError(f"Unknown window function: {name}")
    return w.astype(np.float64)


def _padded_window(name: str, win_length: int, n_fft: int) -> np.ndarray:
    """Center-pad a win_length window to n_fft (torch.stft semantics)."""
    w = get_window(name, win_length)
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        w = np.pad(w, (left, n_fft - win_length - left))
    return w


@functools.lru_cache(maxsize=16)
def _forward_basis(n_fft: int, win_length: int, window: str) -> np.ndarray:
    """(n_fft, 2F) windowed real-DFT basis: columns [cos | -sin]."""
    freqs = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    f = np.arange(freqs, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * f / n_fft
    w = _padded_window(window, win_length, n_fft)[:, None]
    basis = np.concatenate([np.cos(ang) * w, -np.sin(ang) * w], axis=1)
    return basis.astype(np.float32)


@functools.lru_cache(maxsize=16)
def _inverse_basis(n_fft: int, win_length: int, window: str) -> np.ndarray:
    """(2F, n_fft) windowed inverse real-DFT basis.

    Row block 0 multiplies Re, row block 1 multiplies Im.  Hermitian-symmetry
    doubling folded in (DC and Nyquist bins weighted 1, the rest 2).
    """
    freqs = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    f = np.arange(freqs, dtype=np.float64)[:, None]
    ang = 2.0 * np.pi * n * f / n_fft
    scale = np.full((freqs, 1), 2.0 / n_fft)
    scale[0] = 1.0 / n_fft
    if n_fft % 2 == 0:
        scale[-1] = 1.0 / n_fft
    w = _padded_window(window, win_length, n_fft)[None, :]
    basis = np.concatenate(
        [np.cos(ang) * scale * w, -np.sin(ang) * scale * w], axis=0
    )
    return basis.astype(np.float32)


@functools.lru_cache(maxsize=64)
def _ola_envelope(
    n_fft: int, win_length: int, window: str, hop: int, num_frames: int
) -> np.ndarray:
    """Sum of squared windows at each output sample (torch.istft denominator)."""
    w2 = _padded_window(window, win_length, n_fft) ** 2
    total = n_fft + hop * (num_frames - 1)
    env = np.zeros(total, dtype=np.float64)
    for t in range(num_frames):
        env[t * hop : t * hop + n_fft] += w2
    return env.astype(np.float32)


def frame_signal(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(..., S) -> (..., T, n_fft) strided frames (gather with static indices)."""
    num_frames = 1 + (x.shape[-1] - n_fft) // hop
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[..., idx]


def stft(
    x: jnp.ndarray,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: Optional[int] = None,
    window: str = "hann",
    center: bool = True,
    pad_mode: str = "reflect",
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Batched STFT.  (..., S) float -> (..., F, T) complex64.

    Matches torch.stft / torchaudio Spectrogram(power=None) up to float32
    accumulation order (reference: stft_processor.py:54-63).
    """
    if win_length is None:
        win_length = n_fft
    x = x.astype(jnp.float32)
    if center:
        pad = n_fft // 2
        pad_widths = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, pad_widths, mode=pad_mode)
    frames = frame_signal(x, n_fft, hop_length)          # (..., T, n_fft)
    basis = jnp.asarray(_forward_basis(n_fft, win_length, window))
    # HIGHEST precision default: TPU f32 matmuls default to bf16 passes —
    # too coarse for torch-parity DFT; serving may lower it (STFTConfig
    # .precision, SDR-validated).
    proj = jnp.einsum(
        "...tn,nf->...tf", frames, basis,
        preferred_element_type=jnp.float32,
        precision=precision,
    )                                                     # (..., T, 2F)
    freqs = n_fft // 2 + 1
    re, im = proj[..., :freqs], proj[..., freqs:]
    spec = jax.lax.complex(re, im)
    return jnp.swapaxes(spec, -1, -2)                     # (..., F, T)


def istft(
    spec: jnp.ndarray,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: Optional[int] = None,
    window: str = "hann",
    center: bool = True,
    length: Optional[int] = None,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Batched inverse STFT.  (..., F, T) complex -> (..., S) float32.

    Windowed-overlap-add with sum-of-squared-windows normalization
    (torch.istft semantics; reference: stft_processor.py:66-74).
    """
    if win_length is None:
        win_length = n_fft
    num_frames = spec.shape[-1]
    re = jnp.real(spec).astype(jnp.float32)
    im = jnp.imag(spec).astype(jnp.float32)
    stacked = jnp.concatenate([re, im], axis=-2)          # (..., 2F, T)
    stacked = jnp.swapaxes(stacked, -1, -2)               # (..., T, 2F)
    ibasis = jnp.asarray(_inverse_basis(n_fft, win_length, window))
    frames = jnp.einsum(
        "...tf,fn->...tn", stacked, ibasis,
        preferred_element_type=jnp.float32,
        precision=precision,
    )                                                     # (..., T, n_fft), windowed
    total = n_fft + hop_length * (num_frames - 1)
    idx = np.arange(num_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    out_shape = spec.shape[:-2] + (total,)
    out = jnp.zeros(out_shape, dtype=jnp.float32)
    out = out.at[..., idx].add(frames)
    env = jnp.asarray(
        _ola_envelope(n_fft, win_length, window, hop_length, num_frames)
    )
    out = out / jnp.maximum(env, _EPS)
    if center:
        pad = n_fft // 2
        out = out[..., pad : total - pad]
    if length is not None:
        cur = out.shape[-1]
        if cur >= length:
            out = out[..., :length]
        else:
            pad_widths = [(0, 0)] * (out.ndim - 1) + [(0, length - cur)]
            out = jnp.pad(out, pad_widths)
    return out


def num_frames(num_samples: int, n_fft: int, hop_length: int, center: bool = True) -> int:
    """Static frame count for a given signal length."""
    if center:
        return 1 + num_samples // hop_length
    return 1 + (num_samples - n_fft) // hop_length


class STFTProcessor:
    """Jit-friendly STFT front-end with the reference's API surface
    (reference: stft_processor.py:11-237).

    All methods are pure functions of their array arguments; the instance only
    carries static config, so methods can be called inside jit.
    """

    def __init__(self, config: Optional[STFTConfig] = None, **kwargs):
        if config is None:
            config = STFTConfig(**kwargs)
        elif kwargs:
            import dataclasses

            config = dataclasses.replace(config, **kwargs)
        self.config = config
        self.n_fft = config.n_fft
        self.hop_length = config.hop_length
        self.win_length = config.win_length or config.n_fft
        self.window = config.window
        self.center = config.center
        self.pad_mode = config.pad_mode
        self.sample_rate = config.sample_rate
        self.precision = {
            "highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT,
        }[getattr(config, "precision", "highest")]

    # ------------------------------------------------------------- forward
    def stft(self, waveform: jnp.ndarray, return_magnitude_phase: bool = False):
        """(B, C, S) | (C, S) -> complex (B, C, F, T) | (C, F, T)
        (reference: stft_processor.py:87-134)."""
        spec = stft(
            waveform,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
            window=self.window,
            center=self.center,
            pad_mode=self.pad_mode,
            precision=self.precision,
        )
        if return_magnitude_phase:
            return jnp.abs(spec), jnp.angle(spec)
        return spec

    def istft(
        self,
        complex_spec: Optional[jnp.ndarray] = None,
        magnitude: Optional[jnp.ndarray] = None,
        phase: Optional[jnp.ndarray] = None,
        length: Optional[int] = None,
    ) -> jnp.ndarray:
        """Inverse of :meth:`stft` (reference: stft_processor.py:136-184)."""
        if complex_spec is None:
            if magnitude is None or phase is None:
                raise ValueError(
                    "Either complex_spec or (magnitude, phase) must be provided"
                )
            complex_spec = magnitude * jnp.exp(1j * phase)
        return istft(
            complex_spec,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
            window=self.window,
            center=self.center,
            length=length,
            precision=self.precision,
        )

    # ------------------------------------------------------ model adapters
    @staticmethod
    def to_model_input(complex_spec: jnp.ndarray) -> jnp.ndarray:
        """complex (B, C, F, T) -> real (B, 2C, F, T) as [re..., im...]
        (reference: stft_processor.py:186-204)."""
        return jnp.concatenate(
            [jnp.real(complex_spec), jnp.imag(complex_spec)], axis=1
        )

    @staticmethod
    def from_model_output(
        model_output: jnp.ndarray, mixture_spec: jnp.ndarray
    ) -> jnp.ndarray:
        """Masks (B, n_stems*C, F, T) x mixture (B, C, F, T) ->
        (B, n_stems, C, F, T) complex (reference: stft_processor.py:206-237)."""
        B, _, F, T = model_output.shape
        C = mixture_spec.shape[1]
        n_stems = model_output.shape[1] // C
        masks = model_output.reshape(B, n_stems, C, F, T)
        return mixture_spec[:, None] * masks


class SpectrogramNormalizer:
    """Per-frequency-bin instance / global batch normalization with
    denormalization stats (reference: stft_processor.py:240-312).

    Matches torch's unbiased std (ddof=1).
    """

    def __init__(self, mode: str = "instance", eps: float = 1e-8):
        if mode not in ("instance", "batch", "none"):
            raise ValueError(f"Unknown normalization mode: {mode}")
        self.mode = mode
        self.eps = eps

    def __call__(self, spec: jnp.ndarray, return_stats: bool = False):
        if self.mode == "none":
            if return_stats:
                zeros = jnp.zeros_like(spec[..., :1])
                return spec, zeros, jnp.ones_like(zeros)
            return spec
        if self.mode == "instance":
            mean = jnp.mean(spec, axis=-1, keepdims=True)
            std = jnp.std(spec, axis=-1, keepdims=True, ddof=1) + self.eps
        else:  # batch
            mean = jnp.mean(spec, keepdims=True)
            std = jnp.std(spec, keepdims=True, ddof=1) + self.eps
        normed = (spec - mean) / std
        if return_stats:
            return normed, mean, std
        return normed

    # reference naming parity
    forward = __call__

    @staticmethod
    def denormalize(
        normalized_spec: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray
    ) -> jnp.ndarray:
        return normalized_spec * std + mean
