"""Evaluator: per-track metrics, aggregation, JSON output on the synthetic
dataset (reference capability: evaluator.py:28-357).
"""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tfswa_tpu.config import STFTConfig
from tfswa_tpu.data.synthetic import SyntheticDataset
from tfswa_tpu.evaluation import MUSDB18Evaluator, SourceSeparator, aggregate_track_metrics
from tfswa_tpu.models import TFSWAUNet
from tfswa_tpu.ops.stft import STFTProcessor

SR = 8000


@pytest.fixture(scope="module")
def separator():
    model = TFSWAUNet(
        in_channels=4, out_channels=4, depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
        window_size=4, shift_size=2, num_heads=2,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 129, 20)))
    proc = STFTProcessor(STFTConfig(n_fft=256, hop_length=64, sample_rate=SR))
    return SourceSeparator(model, variables, proc, segment_length=1.0, overlap=0.5)


def test_evaluate_dataset(separator, tmp_path):
    ds = SyntheticDataset(
        num_tracks=2, track_seconds=2.5, sample_rate=SR, seed=3
    )
    ev = MUSDB18Evaluator(
        separator, ds, output_dir=str(tmp_path), use_museval=False,
        segment_seconds=1.0,
    )
    results = ev.evaluate()
    assert len(results["tracks"]) == 2
    track = next(iter(results["tracks"].values()))
    assert set(track) == {"vocals", "other"}
    assert {"sdr", "si_sdr", "sir", "sar"} <= set(track["vocals"])
    agg = results["aggregated"]
    assert "overall" in agg
    assert np.isfinite(agg["vocals"]["sdr"]["mean"])
    assert os.path.isfile(tmp_path / "results.json")
    with open(tmp_path / "results.json") as fh:
        json.load(fh)
    MUSDB18Evaluator.print_summary(results)


def test_aggregate_metrics():
    per_track = {
        "a": {"vocals": {"sdr": 5.0, "sar": 6.0}},
        "b": {"vocals": {"sdr": 7.0, "sar": 8.0}},
    }
    agg = aggregate_track_metrics(per_track)
    assert agg["vocals"]["sdr"]["mean"] == 6.0
    assert agg["vocals"]["sdr"]["median"] == 6.0
    assert agg["overall"]["sdr_mean"] == 6.0


def test_max_tracks(separator):
    ds = SyntheticDataset(num_tracks=3, track_seconds=1.5, sample_rate=SR)
    ev = MUSDB18Evaluator(separator, ds, use_museval=False, max_tracks=1,
                          segment_seconds=1.0)
    results = ev.evaluate()
    assert len(results["tracks"]) == 1


def test_evaluator_skips_failing_tracks(separator):
    """Per-track error capture: one broken track must not kill the run
    (reference: evaluator.py:105-109)."""

    class FlakyDataset:
        track_names = ["good", "bad"]

        def get_full_track(self, i):
            if i == 1:
                raise IOError("corrupt track")
            ds = SyntheticDataset(num_tracks=1, track_seconds=1.5,
                                  sample_rate=SR, seed=5)
            return ds.get_full_track(0)

    ev = MUSDB18Evaluator(separator, FlakyDataset(), use_museval=False,
                          segment_seconds=1.0)
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        results = ev.evaluate()
    assert list(results["tracks"]) == ["good"]
