"""Native C++ WAV reader: parity vs the stdlib wave module, seek/pad
semantics, round-trip write, and the full MUSDB18Dataset path on generated
wav fixtures (exercising the loader without soundfile/musdb installed).
"""
import os
import struct
import wave

import numpy as np
import pytest

from tfswa_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ toolchain unavailable"
)

SR = 8000


def _write_wav_stdlib(path, data, sr=SR):
    """data: planar float32 (channels, frames) -> PCM16 via stdlib wave."""
    channels, frames = data.shape
    pcm = np.clip(data, -1, 1) * 32767.0
    interleaved = pcm.T.astype(np.int16).tobytes()
    with wave.open(path, "wb") as fh:
        fh.setnchannels(channels)
        fh.setsampwidth(2)
        fh.setframerate(sr)
        fh.writeframes(interleaved)


@pytest.fixture
def stereo_wav(tmp_path):
    rng = np.random.default_rng(0)
    data = (rng.standard_normal((2, SR)) * 0.3).astype(np.float32)
    path = str(tmp_path / "test.wav")
    _write_wav_stdlib(path, data)
    return path, data


def test_wav_info(stereo_wav):
    path, data = stereo_wav
    frames, channels, sr = native.wav_info(path)
    assert (frames, channels, sr) == (SR, 2, SR)


def test_full_read_matches_stdlib(stereo_wav):
    path, data = stereo_wav
    out = native.wav_read(path, 0, SR, 2)
    # PCM16 quantization error bound
    np.testing.assert_allclose(out, np.clip(data, -1, 1), atol=2.5 / 32768)


def test_seek_read(stereo_wav):
    path, data = stereo_wav
    out = native.wav_read(path, 1000, 500, 2)
    np.testing.assert_allclose(
        out, np.clip(data[:, 1000:1500], -1, 1), atol=2.5 / 32768
    )


def test_past_eof_zero_pad(stereo_wav):
    path, _ = stereo_wav
    out = native.wav_read(path, SR - 100, 300, 2)
    assert out.shape == (2, 300)
    assert np.all(out[:, 100:] == 0.0)
    assert np.any(out[:, :100] != 0.0)


def test_mono_duplicated(tmp_path):
    data = np.linspace(-0.5, 0.5, 256, dtype=np.float32)[None]
    path = str(tmp_path / "mono.wav")
    _write_wav_stdlib(path, data)
    out = native.wav_read(path, 0, 256, 2)
    np.testing.assert_array_equal(out[0], out[1])


def test_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    data = (rng.standard_normal((2, 2048)) * 0.2).astype(np.float32)
    path = str(tmp_path / "rt.wav")
    native.wav_write(path, data, SR)
    frames, channels, sr = native.wav_info(path)
    assert (frames, channels, sr) == (2048, 2, SR)
    out = native.wav_read(path, 0, 2048, 2)
    np.testing.assert_allclose(out, data, atol=2 / 32768)
    # stdlib can read what we write
    with wave.open(path, "rb") as fh:
        assert fh.getnframes() == 2048


@pytest.fixture
def musdb_fixture(tmp_path):
    """Two-track MUSDB18-HQ-style tree from generated wavs."""
    rng = np.random.default_rng(2)
    n = SR * 2
    for subset, names in (("train", ["Track A", "Track B"]), ("test", ["Track T"])):
        for name in names:
            d = tmp_path / subset / name
            os.makedirs(d)
            for stem in ("vocals", "drums", "bass", "other"):
                data = (rng.standard_normal((2, n)) * 0.1).astype(np.float32)
                _write_wav_stdlib(str(d / f"{stem}.wav"), data)
    return str(tmp_path)


def test_musdb_dataset_end_to_end(musdb_fixture):
    from tfswa_tpu.data.musdb import MUSDB18Dataset, collate

    ds = MUSDB18Dataset(
        musdb_fixture, split="train", stems=("vocals", "other"),
        segment_seconds=0.5, sample_rate=SR, random_segments=True,
    )
    assert len(ds) == 2
    mixture, targets = ds[0]
    assert mixture.shape == (2, SR // 2)
    assert set(targets) == {"vocals", "other"}
    # binary mode: mixture == vocals + other (= drums+bass+other)
    np.testing.assert_allclose(
        mixture, targets["vocals"] + targets["other"], atol=1e-6
    )

    batch_mix, batch_tgt = collate([ds[0], ds[1]])
    assert batch_mix.shape == (2, 2, SR // 2)
    assert batch_tgt["vocals"].shape == (2, 2, SR // 2)


def test_musdb_sequential_and_full_track(musdb_fixture):
    from tfswa_tpu.data.musdb import MUSDB18Dataset

    ds = MUSDB18Dataset(
        musdb_fixture, split="test", stems=("vocals", "drums", "bass", "other"),
        segment_seconds=0.5, sample_rate=SR, random_segments=False,
        max_segments_per_track=3,
    )
    assert len(ds) == 3  # capped sequential index
    mixture, targets = ds.get_full_track(0)
    assert mixture.shape == (2, SR * 2)
    assert set(targets) == {"vocals", "drums", "bass", "other"}
    np.testing.assert_allclose(
        mixture, sum(targets.values()), atol=1e-6
    )


def test_musdb_validation_split(musdb_fixture):
    """Train split excludes the musdb validation tracks; our fixture tracks
    are not in the list, so valid is empty and train has both."""
    from tfswa_tpu.data.musdb import MUSDB18Dataset

    ds = MUSDB18Dataset(
        musdb_fixture, split="train", segment_seconds=0.5, sample_rate=SR
    )
    assert ds.track_names == ["Track A", "Track B"]
    with pytest.raises(FileNotFoundError):
        MUSDB18Dataset(musdb_fixture, split="valid", segment_seconds=0.5,
                       sample_rate=SR)


def test_dataloader_threads(musdb_fixture):
    from tfswa_tpu.data.musdb import MUSDB18Dataset
    from tfswa_tpu.data.pipeline import DataLoader

    ds = MUSDB18Dataset(
        musdb_fixture, split="train", segment_seconds=0.25, sample_rate=SR
    )
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == len(loader) == 1
    mix, tgt = batches[0]
    assert mix.shape == (2, 2, SR // 4)
