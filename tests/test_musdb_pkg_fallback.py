"""The .stem.mp4 / musdb-package fallback path, exercised through a fake
musdb module (the real package decodes mp4 stems via stempeg; our glue is
what needs testing — reference fallback loader: musdb_dataset.py:326-410).
"""
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: run via plain pytest / -m slow

SR = 8000
TRACK_SECONDS = 2.0


class _FakeTarget:
    def __init__(self, audio):
        self.audio = audio


class _FakeTrack:
    def __init__(self, name, seed):
        self.name = name
        self.rate = SR
        self.duration = TRACK_SECONDS
        self.chunk_start = 0.0
        self.chunk_duration = None
        rng = np.random.default_rng(seed)
        n = int(SR * TRACK_SECONDS)
        self._sources = {
            s: (rng.standard_normal((n, 2)) * 0.1).astype(np.float32)
            for s in ("vocals", "drums", "bass", "other")
        }

    def _window(self, audio):
        start = int(self.chunk_start * self.rate)
        if self.chunk_duration is None:
            return audio[start:]
        end = start + int(self.chunk_duration * self.rate)
        return audio[start:end]

    @property
    def audio(self):
        return self._window(sum(self._sources.values()))

    @property
    def targets(self):
        return {
            s: _FakeTarget(self._window(a)) for s, a in self._sources.items()
        }


class _FakeDB:
    def __init__(self, root=None, subsets=None, split=None):
        self.tracks = [_FakeTrack("Fake A", 0), _FakeTrack("Fake B", 1)]


@pytest.fixture
def fake_musdb(monkeypatch, tmp_path):
    mod = types.ModuleType("musdb")
    mod.DB = _FakeDB
    monkeypatch.setitem(sys.modules, "musdb", mod)
    # empty root: no HQ wavs -> triggers the pkg fallback
    return str(tmp_path)


def test_pkg_fallback_segments(fake_musdb):
    from tfswa_tpu.data.musdb import MUSDB18Dataset

    ds = MUSDB18Dataset(
        fake_musdb, split="train", stems=("vocals", "other"),
        segment_seconds=0.5, sample_rate=SR,
    )
    assert ds._mode == "pkg"
    assert ds.track_names == ["Fake A", "Fake B"]
    mixture, targets = ds[0]
    assert mixture.shape == (2, SR // 2)
    np.testing.assert_allclose(
        mixture, targets["vocals"] + targets["other"], atol=1e-5
    )


def test_pkg_fallback_full_track(fake_musdb):
    from tfswa_tpu.data.musdb import MUSDB18Dataset

    ds = MUSDB18Dataset(
        fake_musdb, split="test", stems=("vocals", "drums", "bass", "other"),
        segment_seconds=0.5, sample_rate=SR, random_segments=False,
    )
    mixture, targets = ds.get_full_track(0)
    assert mixture.shape == (2, int(SR * TRACK_SECONDS))
    np.testing.assert_allclose(mixture, sum(targets.values()), atol=1e-5)


def test_pkg_fallback_sequential_index(fake_musdb):
    from tfswa_tpu.data.musdb import MUSDB18Dataset

    ds = MUSDB18Dataset(
        fake_musdb, split="valid", segment_seconds=0.5, sample_rate=SR,
        random_segments=False, max_segments_per_track=2,
    )
    assert len(ds) == 4  # 2 tracks x capped 2 segments
    mixture, _ = ds[3]
    assert mixture.shape == (2, SR // 2)
