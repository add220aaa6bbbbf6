"""Evaluation: metrics, overlap-add inference, dataset evaluators."""
from .metrics import (
    MetricsCalculator,
    bss_eval,
    compute_musdb_metrics,
    median_filter_metrics,
    sar,
    sdr,
    si_sdr,
    sir,
)
from .inference import (
    BatchSeparator,
    SourceSeparator,
    load_separator_from_checkpoint,
)
from .evaluator import (
    CustomDatasetEvaluator,
    MUSDB18Evaluator,
    aggregate_track_metrics,
)

__all__ = [
    "sdr",
    "si_sdr",
    "sir",
    "sar",
    "bss_eval",
    "median_filter_metrics",
    "MetricsCalculator",
    "compute_musdb_metrics",
    "SourceSeparator",
    "BatchSeparator",
    "load_separator_from_checkpoint",
    "MUSDB18Evaluator",
    "CustomDatasetEvaluator",
    "aggregate_track_metrics",
]
