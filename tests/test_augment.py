"""Augmentation: jittability, shape preservation, spectral behaviour."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tfswa_tpu.config import STFTConfig
from tfswa_tpu.data.augment import (
    AudioAugmentation,
    MixupAugmentation,
    frequency_masking,
    gain,
    pitch_shift,
    time_masking,
    time_stretch,
)
from tfswa_tpu.ops.stft import STFTProcessor

SR = 8000


def _sine(freq, n, sr=SR):
    return np.sin(2 * np.pi * freq * np.arange(n) / sr).astype(np.float32)


def _dominant_freq(x, sr=SR):
    spec = np.abs(np.fft.rfft(np.asarray(x)))
    return np.argmax(spec) * sr / len(x)


def test_time_stretch_shape_and_rate():
    x = jnp.asarray(_sine(440, SR))
    y = time_stretch(x, jnp.asarray(1.25))
    assert y.shape == x.shape
    # faster rate compresses content -> dominant frequency scales up
    assert abs(_dominant_freq(y) - 440 * 1.25) < 15


def test_time_stretch_slow_pads():
    x = jnp.asarray(_sine(440, SR))
    y = time_stretch(x, jnp.asarray(0.8))
    assert abs(_dominant_freq(np.asarray(y)) - 440 * 0.8) < 15


def test_gain():
    x = jnp.ones((4,))
    np.testing.assert_allclose(np.asarray(gain(x, jnp.asarray(6.0))),
                               10 ** 0.3, rtol=1e-4)


def test_pitch_shift_moves_frequency():
    proc = STFTProcessor(STFTConfig(n_fft=512, hop_length=128, sample_rate=SR))
    x = jnp.asarray(_sine(440, SR * 2))
    y = pitch_shift(x, jnp.asarray(4.0), proc)   # +4 semitones = x1.26
    assert y.shape == x.shape
    f = _dominant_freq(np.asarray(y)[SR // 2 : 3 * SR // 2])
    assert abs(f - 440 * 2 ** (4 / 12)) < 25


def test_masking():
    rng = jax.random.PRNGKey(0)
    spec = jnp.ones((64, 50))
    fm = frequency_masking(spec, rng, max_width=16)
    tm = time_masking(spec, rng, max_width=16)
    assert fm.shape == spec.shape and tm.shape == spec.shape
    assert float(jnp.sum(fm)) <= float(jnp.sum(spec))


def test_audio_augmentation_jit_and_identity_preserved():
    """Same linear transform applied to mixture and stems keeps
    mixture ~= sum(stems).  Pitch shift is excluded here: the phase vocoder's
    magnitude interpolation is nonlinear, so it cannot preserve the identity
    exactly (true of the reference construction too)."""
    proc = STFTProcessor(STFTConfig(n_fft=256, hop_length=64, sample_rate=SR))
    aug = AudioAugmentation(proc, prob=1.0, use_pitch_shift=False)
    rng = np.random.default_rng(0)
    v = rng.standard_normal((2, 2, SR)).astype(np.float32) * 0.1
    o = rng.standard_normal((2, 2, SR)).astype(np.float32) * 0.1
    mixture = jnp.asarray(v + o)
    targets = {"vocals": jnp.asarray(v), "other": jnp.asarray(o)}

    jit_aug = jax.jit(aug)
    m2, t2 = jit_aug(jax.random.PRNGKey(1), mixture, targets)
    assert m2.shape == mixture.shape
    recon = t2["vocals"] + t2["other"]
    np.testing.assert_allclose(np.asarray(m2), np.asarray(recon), atol=2e-3)


def test_mixup():
    mix = MixupAugmentation(alpha=0.4, prob=1.0)
    rng = np.random.default_rng(1)
    m = jnp.asarray(rng.standard_normal((4, 2, 100)).astype(np.float32))
    t = {"vocals": jnp.asarray(rng.standard_normal((4, 2, 100)).astype(np.float32))}
    m2, t2 = jax.jit(mix)(jax.random.PRNGKey(2), m, t)
    assert m2.shape == m.shape
    assert t2["vocals"].shape == t["vocals"].shape
