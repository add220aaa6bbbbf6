"""Import shims that let the read-only reference repo run in this image.

The reference imports soundfile / musdb / torchaudio at module scope
(reference: musdb_dataset.py:11-14, stft_processor.py:8); none are
installed here.  Tests that drive reference *code paths that never touch
those libraries* install these stand-ins first:

  * ``soundfile`` / ``musdb``: empty placeholder modules (import-time only).
  * ``torchaudio.transforms``: real ``Spectrogram`` / ``InverseSpectrogram``
    equivalents over ``torch.stft`` / ``torch.istft`` — torchaudio's own
    implementations are exactly these wrappers (power=None complex mode),
    so reference STFT numerics are preserved.  Augmentation-only transforms
    (PitchShift etc.) are import-safe placeholders that raise if used.
"""
from __future__ import annotations

import sys
import types

import torch


class _Spectrogram(torch.nn.Module):
    def __init__(self, n_fft=400, win_length=None, hop_length=None,
                 pad=0, window_fn=torch.hann_window, power=None,
                 normalized=False, wkwargs=None, center=True,
                 pad_mode="reflect", onesided=True):
        super().__init__()
        assert power is None, "shim supports complex mode only"
        self.n_fft = n_fft
        self.win_length = win_length or n_fft
        self.hop_length = hop_length or self.win_length // 2
        self.center = center
        self.pad_mode = pad_mode
        self.normalized = normalized
        self.onesided = onesided
        self.register_buffer(
            "window", window_fn(self.win_length, **(wkwargs or {})))

    def forward(self, waveform):
        return torch.stft(
            waveform, self.n_fft, hop_length=self.hop_length,
            win_length=self.win_length, window=self.window,
            center=self.center, pad_mode=self.pad_mode,
            normalized=self.normalized, onesided=self.onesided,
            return_complex=True,
        )


class _InverseSpectrogram(torch.nn.Module):
    def __init__(self, n_fft=400, win_length=None, hop_length=None,
                 pad=0, window_fn=torch.hann_window, normalized=False,
                 wkwargs=None, center=True, pad_mode="reflect",
                 onesided=True):
        super().__init__()
        self.n_fft = n_fft
        self.win_length = win_length or n_fft
        self.hop_length = hop_length or self.win_length // 2
        self.center = center
        self.normalized = normalized
        self.onesided = onesided
        self.register_buffer(
            "window", window_fn(self.win_length, **(wkwargs or {})))

    def forward(self, spectrogram, length=None):
        return torch.istft(
            spectrogram, self.n_fft, hop_length=self.hop_length,
            win_length=self.win_length, window=self.window,
            center=self.center, normalized=self.normalized,
            onesided=self.onesided, length=length,
        )


class _Unavailable:
    """Placeholder for augmentation-only transforms; raises on use."""

    def __init__(self, *a, **k):
        raise RuntimeError("torchaudio is not installed in this image")


def install() -> None:
    """Install the shims into sys.modules (idempotent)."""
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        tr = types.ModuleType("torchaudio.transforms")
        tr.Spectrogram = _Spectrogram
        tr.InverseSpectrogram = _InverseSpectrogram
        for name in ("PitchShift", "TimeStretch", "FrequencyMasking",
                     "TimeMasking", "Resample"):
            setattr(tr, name, type(name, (_Unavailable,), {}))
        ta.transforms = tr
        ta.functional = types.ModuleType("torchaudio.functional")
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tr
        sys.modules["torchaudio.functional"] = ta.functional
    for name in ("soundfile", "musdb", "museval"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
