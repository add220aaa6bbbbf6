"""Data: MUSDB18 + synthetic datasets, loader/prefetch pipeline, augmentation."""
from .augment import (
    AudioAugmentation,
    MixupAugmentation,
    build_augmentations,
    frequency_masking,
    gain,
    phase_vocoder,
    pitch_shift,
    time_masking,
    time_stretch,
)
from .musdb import MUSDB18Dataset, collate, load_chunk
from .pipeline import DataLoader, prefetch_to_device
from .synthetic import SyntheticDataset

__all__ = [
    "MUSDB18Dataset",
    "SyntheticDataset",
    "DataLoader",
    "prefetch_to_device",
    "collate",
    "load_chunk",
    "AudioAugmentation",
    "MixupAugmentation",
    "build_augmentations",
    "time_stretch",
    "pitch_shift",
    "gain",
    "phase_vocoder",
    "frequency_masking",
    "time_masking",
]
