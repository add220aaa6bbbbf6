"""Config system: defaults match the reference recipe, YAML round-trip,
dotted overrides."""
import pytest

from tfswa_tpu.config import Config, ModelConfig


def test_reference_defaults():
    cfg = Config()
    assert cfg.model.depths == (2, 2, 6, 2)
    assert cfg.model.dims == (32, 64, 128, 256)
    assert cfg.model.window_size == 8 and cfg.model.shift_size == 4
    assert cfg.model.num_heads == 8
    assert cfg.stft.n_fft == 2048 and cfg.stft.hop_length == 512
    assert cfg.train.gradient_clip_val == 1.0
    assert cfg.train.lr_min == 1e-6
    assert cfg.train.weight_decay == 1e-4
    assert cfg.data.stems == ("vocals", "other")


def test_yaml_round_trip(tmp_path):
    cfg = Config()
    path = str(tmp_path / "config.yaml")
    cfg.to_yaml(path)
    loaded = Config.from_yaml(path)
    assert loaded.model.dims == cfg.model.dims
    assert loaded.stft.n_fft == cfg.stft.n_fft
    assert loaded.data.stems == cfg.data.stems


def test_overrides():
    cfg = Config().apply_overrides([
        "model.dims=(16,32,64,128)",
        "model.remat=true",
        "train.learning_rate=0.001",
        "data.batch_size=8",
        "model.dtype=bfloat16",
    ])
    assert cfg.model.dims == (16, 32, 64, 128)
    assert cfg.model.remat is True
    assert cfg.train.learning_rate == 0.001
    assert cfg.data.batch_size == 8
    assert cfg.model.dtype == "bfloat16"
    # original untouched (dataclass replace semantics)
    assert Config().model.remat is False


def test_low_vram_recipe():
    """The reference's low-VRAM script settings express cleanly
    (reference: scripts/train_low_vram.sh:1-22)."""
    cfg = Config().apply_overrides([
        "data.batch_size=1", "data.segment_seconds=3.0",
        "stft.n_fft=1024", "stft.hop_length=256",
        "model.remat=true", "train.learning_rate=1e-4",
    ])
    assert cfg.stft.n_fft == 1024
    assert cfg.model.remat


def test_from_dict_tuple_coercion():
    cfg = Config.from_dict({"model": {"dims": [8, 16, 32, 64]}})
    assert cfg.model.dims == (8, 16, 32, 64)
