"""SourceSeparator invariants (reference: test_phase3.py:243-290):
shape/length preservation, both mask modes, OLA consistency, batch separator.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tfswa_tpu.config import STFTConfig
from tfswa_tpu.evaluation.inference import BatchSeparator, SourceSeparator
from tfswa_tpu.models import TFSWAUNet
from tfswa_tpu.ops.stft import STFTProcessor

pytestmark = pytest.mark.slow  # heavy tier: run via plain pytest / -m slow

SR = 8000


@pytest.fixture(scope="module")
def separator():
    model = TFSWAUNet(
        in_channels=4, out_channels=4, depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
        window_size=4, shift_size=2, num_heads=2,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 129, 20)))
    proc = STFTProcessor(STFTConfig(n_fft=256, hop_length=64, sample_rate=SR))
    return SourceSeparator(
        model, variables, proc,
        segment_length=1.0, overlap=0.25, mask_mode="trainer",
        segment_batch=4,
    )


def _sine(freq, n, sr=SR):
    return np.sin(2 * np.pi * freq * np.arange(n) / sr).astype(np.float32)


def test_short_segment_shapes(separator):
    audio = _sine(440, SR // 2)  # shorter than one segment
    out = separator.separate(audio)
    assert set(out) == {"vocals", "other"}
    for stem in out.values():
        assert stem.shape == (1, SR // 2)
        assert np.isfinite(stem).all()


def test_long_overlap_add_shapes(separator):
    audio = _sine(440, int(SR * 3.3))  # multiple segments + ragged tail
    out = separator.separate(audio)
    for stem in out.values():
        assert stem.shape == (1, int(SR * 3.3))
        assert np.isfinite(stem).all()


def test_stereo_input_forced_mono(separator):
    """Reference forces mono (reference: inference.py:83-85)."""
    audio = np.stack([_sine(440, SR), _sine(880, SR)])
    out = separator.separate(audio)
    assert out["vocals"].shape == (1, SR)


def test_mask_conservation_trainer_mode(separator):
    """Trainer masks are bounded to [sigma(0), sigma(sqrt(2))]: each stem's
    energy is below mixture energy (masks < 1)."""
    audio = _sine(440, SR)
    out = separator.separate(audio)
    mix_energy = float(np.sum(audio ** 2))
    for stem in out.values():
        assert float(np.sum(stem ** 2)) < mix_energy


def test_direct_mask_mode():
    model = TFSWAUNet(
        in_channels=2, out_channels=4, depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
        window_size=4, shift_size=2, num_heads=2,
    )
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 2, 129, 20)))
    proc = STFTProcessor(STFTConfig(n_fft=256, hop_length=64, sample_rate=SR))
    sep = SourceSeparator(
        model, variables, proc, segment_length=1.0, mask_mode="direct"
    )
    out = sep.separate(_sine(440, int(SR * 1.5)))
    for stem in out.values():
        assert stem.shape == (1, int(SR * 1.5))
        assert np.isfinite(stem).all()


def test_ola_constant_region_consistency(separator):
    """A time-invariant input should produce nearly time-invariant output in
    the OLA interior (window normalization is correct)."""
    audio = _sine(440, SR * 4)
    out = separator.separate(audio)["vocals"][0]
    # compare energy of two interior seconds
    e1 = float(np.sum(out[SR : 2 * SR] ** 2))
    e2 = float(np.sum(out[2 * SR : 3 * SR] ** 2))
    assert abs(e1 - e2) / max(e1, 1e-9) < 0.05


@pytest.mark.parametrize("dtype", ["float16", "int16", "int8"])
def test_transfer_dtype_matches_f32(separator, dtype):
    """Reduced-precision transfer codecs (f16 / scaled-PCM int16 /
    dynamic-scaled int8 output) must match the f32 path within their
    quantization noise, on both the batched host path and the device-OLA
    path (int8 applies to the device-OLA d2h; elsewhere it rides f16)."""
    # tolerance follows each codec's design SNR: f16/int16 ~66+ dB;
    # int8's dynamic scaling bounds error at smax/254 per accumulation
    # (~2.5x headroom here); a wiring bug (scale/transpose) would miss
    # by orders of magnitude
    atol = 2e-2 if dtype == "int8" else 5e-3
    model, variables, proc = (separator.model, separator.variables,
                              separator.stft_processor)
    audio = _sine(440, int(SR * 3.0)) * 0.7
    ref = separator.separate(audio)
    for device_ola in (False, True):
        sep = SourceSeparator(
            model, variables, proc, segment_length=1.0, overlap=0.25,
            mask_mode="trainer", segment_batch=4, transfer_dtype=dtype,
            device_ola=device_ola, ola_bucket_seconds=2.0,
        )
        out = sep.separate(audio)
        # interior only: at the track edges the OLA/ISTFT envelope is tiny
        # and input-quantization noise amplifies through the division
        interior = slice(
            separator.segment_samples,
            int(SR * 3.0) - separator.segment_samples,
        )
        np.testing.assert_allclose(
            out["vocals"][0][interior], ref["vocals"][0][interior], atol=atol
        )


def test_separate_stream_matches_sequential(separator):
    """Pipelined multi-track streaming must return EXACTLY the per-track
    separate() results, in order, including the short-track fallback
    interleaved mid-stream."""
    model, variables, proc = (separator.model, separator.variables,
                              separator.stft_processor)
    dev = SourceSeparator(
        model, variables, proc, segment_length=1.0, overlap=0.25,
        mask_mode="trainer", segment_batch=4, device_ola=True,
        ola_bucket_seconds=2.0,
    )
    tracks = [
        _sine(440, int(SR * 2.7)),
        _sine(330, int(SR * 0.5)),        # <= one segment: fallback path
        _sine(550, int(SR * 3.3)) * 0.5,
        _sine(220, int(SR * 2.2)),
    ]
    streamed = dev.separate_stream(tracks, max_in_flight=2)
    for audio, got in zip(tracks, streamed):
        want = dev.separate(audio)
        for stem in want:
            np.testing.assert_array_equal(got[stem], want[stem])


def test_batch_separator_error_capture(separator, tmp_path):
    bs = BatchSeparator(separator)
    results = bs.separate_files(["/nonexistent/file.wav"], str(tmp_path))
    assert results["/nonexistent/file.wav"]["status"] == "error"


def test_device_ola_matches_host(separator):
    """Device-side OLA must match the host path in the interior (they differ
    only within the final partial hop by construction)."""
    model, variables, proc = separator.model, separator.variables, separator.stft_processor
    dev = SourceSeparator(
        model, variables, proc, segment_length=1.0, overlap=0.25,
        mask_mode="trainer", segment_batch=4, device_ola=True,
        ola_bucket_seconds=2.0,
    )
    audio = _sine(440, int(SR * 3.0))
    host = separator.separate(audio)
    device = dev.separate(audio)
    # identical until the host path's clamped final segment begins
    # (host clamps the last window start; device uses a uniform padded grid)
    interior = slice(0, int(SR * 3.0) - separator.segment_samples)
    np.testing.assert_allclose(
        device["vocals"][0][interior], host["vocals"][0][interior], atol=2e-3
    )
    assert device["vocals"].shape == (1, int(SR * 3.0))
    assert np.isfinite(device["vocals"]).all()
