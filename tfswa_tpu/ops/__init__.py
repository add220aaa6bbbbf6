"""TPU-native compute ops: STFT front-end, windowing, masking, resize."""
from .stft import STFTProcessor, SpectrogramNormalizer, stft, istft, num_frames

__all__ = [
    "STFTProcessor",
    "SpectrogramNormalizer",
    "stft",
    "istft",
    "num_frames",
]
