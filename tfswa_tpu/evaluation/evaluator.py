"""Dataset evaluators: per-track separation -> metrics -> JSON aggregation
(reference: evaluator.py:28-491).

MUSDB18Evaluator prefers official museval metrics when the package is
installed (reference: evaluator.py:221-239) and falls back to the built-in
jnp metrics otherwise (reference: evaluator.py:176-185).  Aggregation is
mean/std/median per stem + overall (reference: evaluator.py:260-317).
"""
from __future__ import annotations

import json
import os
import warnings
from typing import Dict, List, Optional, Sequence

import numpy as np

from .inference import SourceSeparator
from .metrics import MetricsCalculator

def _museval_available() -> bool:
    """Checked at evaluator construction (not import) so environments that
    install/inject museval later — including the fixture test — get the
    official-metrics branch."""
    try:
        import museval  # noqa: F401

        return True
    except Exception:  # pragma: no cover - optional dep
        return False


HAS_MUSEVAL = _museval_available()


def _nanmedian(x) -> float:
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return float(np.nanmedian(np.asarray(x, dtype=np.float64)))


class MUSDB18Evaluator:
    """Evaluate a separator over a MUSDB18-style dataset
    (reference: evaluator.py:28-357).

    ``dataset`` must expose get_full_track(i) -> (mixture (2, S),
    {stem: (2, S)}) and track_names — both MUSDB18Dataset and
    SyntheticDataset qualify.
    """

    def __init__(
        self,
        separator: SourceSeparator,
        dataset,
        output_dir: Optional[str] = None,
        use_museval: bool = True,
        segment_seconds: float = 10.0,
        save_estimates: bool = False,
        max_tracks: Optional[int] = None,
    ):
        self.separator = separator
        self.dataset = dataset
        self.output_dir = output_dir
        self.use_museval = use_museval and _museval_available()
        self.segment_seconds = segment_seconds
        self.save_estimates = save_estimates
        self.max_tracks = max_tracks

    # ----------------------------------------------------------- per track
    def evaluate_track(self, track_idx: int) -> Dict[str, Dict[str, float]]:
        """(reference: evaluator.py:124-239)"""
        mixture, references = self.dataset.get_full_track(track_idx)
        estimates = self.separator.separate(mixture)

        if self.save_estimates and self.output_dir:
            self._save_estimates(
                self.dataset.track_names[track_idx], estimates
            )

        refs_mono = {k: np.asarray(v).mean(axis=0) for k, v in references.items()}
        ests_mono = {k: np.asarray(v)[0] for k, v in estimates.items()}

        if self.use_museval:
            return self._museval_metrics(refs_mono, ests_mono)
        return self._custom_metrics(refs_mono, ests_mono)

    def _save_estimates(self, track_name: str, estimates: Dict) -> None:
        """Write per-stem estimate wavs (reference: evaluator.py:241-258),
        via the native C++ writer with a soundfile fallback."""
        track_dir = os.path.join(
            self.output_dir, "estimates", track_name.replace(os.sep, "_")
        )
        os.makedirs(track_dir, exist_ok=True)
        sr = self.separator.sample_rate
        for stem, wav in estimates.items():
            path = os.path.join(track_dir, f"{stem}.wav")
            data = np.asarray(wav, dtype=np.float32)
            try:
                from ..native import wav_write

                wav_write(path, data, sr)
            except Exception:
                import soundfile as sf

                sf.write(path, data.T, sr)

    def _custom_metrics(self, refs, ests) -> Dict[str, Dict[str, float]]:
        sr = self.separator.sample_rate
        calc = MetricsCalculator(
            sample_rate=sr, segment_length=int(self.segment_seconds * sr)
        )
        sources = np.stack([refs[k] for k in refs])
        out = {}
        for stem in ests:
            if stem not in refs:
                continue
            out[stem] = calc.compute(ests[stem], refs[stem], sources)
        return out

    def _museval_metrics(self, refs, ests) -> Dict[str, Dict[str, float]]:
        """Official museval metrics, nan-median over frames
        (reference: evaluator.py:221-239)."""
        import museval

        stems = [s for s in ests if s in refs]
        ref_arr = np.stack([refs[s] for s in stems])[..., None]   # (S, T, 1)
        est_arr = np.stack([ests[s] for s in stems])[..., None]
        sdr, isr, sir, sar = museval.evaluate(
            ref_arr, est_arr,
            win=int(self.segment_seconds * self.separator.sample_rate),
            hop=int(self.segment_seconds * self.separator.sample_rate),
        )
        out = {}
        for i, stem in enumerate(stems):
            out[stem] = {
                "sdr": _nanmedian(sdr[i]),
                "isr": _nanmedian(isr[i]),
                "sir": _nanmedian(sir[i]),
                "sar": _nanmedian(sar[i]),
            }
        return out

    # ------------------------------------------------------------ full run
    def evaluate(self) -> Dict:
        """(reference: evaluator.py:73-122) — per-track loop with error
        capture, then aggregate + optional JSON dump."""
        names = self.dataset.track_names
        n = len(names) if self.max_tracks is None else min(self.max_tracks, len(names))
        per_track: Dict[str, Dict] = {}
        for i in range(n):
            try:
                per_track[names[i]] = self.evaluate_track(i)
            except Exception as exc:  # noqa: BLE001 (parity: skip bad tracks)
                warnings.warn(f"track {names[i]} failed: {exc}")
        results = {
            "tracks": per_track,
            "aggregated": aggregate_track_metrics(per_track),
        }
        if self.output_dir:
            os.makedirs(self.output_dir, exist_ok=True)
            with open(os.path.join(self.output_dir, "results.json"), "w") as fh:
                json.dump(results, fh, indent=2)
        return results

    @staticmethod
    def print_summary(results: Dict) -> None:
        """(reference: evaluator.py:335-357)"""
        agg = results["aggregated"]
        print(f"Evaluated {len(results['tracks'])} tracks")
        for stem, stats in agg.items():
            if stem == "overall":
                continue
            line = ", ".join(
                f"{m}: {v['mean']:.2f}+/-{v['std']:.2f} (median {v['median']:.2f})"
                for m, v in stats.items()
            )
            print(f"  {stem}: {line}")
        if "overall" in agg:
            print(f"  overall: {agg['overall']}")


def aggregate_track_metrics(per_track: Dict[str, Dict]) -> Dict:
    """mean/std/median per stem per metric + overall mean SDR
    (reference: evaluator.py:260-317)."""
    stems: Dict[str, Dict[str, List[float]]] = {}
    for track_metrics in per_track.values():
        for stem, metrics in track_metrics.items():
            for metric, value in metrics.items():
                stems.setdefault(stem, {}).setdefault(metric, []).append(value)
    agg: Dict = {}
    for stem, metrics in stems.items():
        agg[stem] = {
            m: {
                "mean": float(np.mean(v)),
                "std": float(np.std(v)),
                "median": float(np.median(v)),
            }
            for m, v in metrics.items()
        }
    sdr_means = [
        agg[stem]["sdr"]["mean"] for stem in agg if "sdr" in agg[stem]
    ]
    if sdr_means:
        agg["overall"] = {"sdr_mean": float(np.mean(sdr_means))}
    return agg


class CustomDatasetEvaluator:
    """Evaluate over directories of mixture/reference wav files
    (reference: evaluator.py:360-491)."""

    def __init__(
        self,
        separator: SourceSeparator,
        mixtures_dir: str,
        references_dir: str,
        stems: Sequence[str] = ("vocals", "other"),
        output_dir: Optional[str] = None,
        segment_seconds: float = 10.0,
    ):
        self.separator = separator
        self.mixtures_dir = mixtures_dir
        self.references_dir = references_dir
        self.stems = tuple(stems)
        self.output_dir = output_dir
        self.segment_seconds = segment_seconds

    def evaluate(self) -> Dict:
        import soundfile as sf

        per_track: Dict[str, Dict] = {}
        files = sorted(
            f for f in os.listdir(self.mixtures_dir) if f.endswith(".wav")
        )
        sr = self.separator.sample_rate
        calc = MetricsCalculator(
            sample_rate=sr, segment_length=int(self.segment_seconds * sr)
        )
        for fname in files:
            base = os.path.splitext(fname)[0]
            try:
                mixture, _ = sf.read(
                    os.path.join(self.mixtures_dir, fname),
                    dtype="float32", always_2d=True,
                )
                refs = {}
                for stem in self.stems:
                    path = os.path.join(self.references_dir, base, f"{stem}.wav")
                    ref, _ = sf.read(path, dtype="float32", always_2d=True)
                    refs[stem] = ref.T.mean(axis=0)
                ests = self.separator.separate(mixture.T)
                sources = np.stack([refs[s] for s in self.stems])
                per_track[base] = {
                    stem: calc.compute(ests[stem][0], refs[stem], sources)
                    for stem in self.stems
                }
            except Exception as exc:  # noqa: BLE001
                warnings.warn(f"{base} failed: {exc}")
        results = {
            "tracks": per_track,
            "aggregated": aggregate_track_metrics(per_track),
        }
        if self.output_dir:
            os.makedirs(self.output_dir, exist_ok=True)
            with open(os.path.join(self.output_dir, "results.json"), "w") as fh:
                json.dump(results, fh, indent=2)
        return results
