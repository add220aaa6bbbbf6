"""CLI argument -> Config wiring (reference: scripts/train.py:23-121)."""
from tfswa_tpu.cli.train import build_parser, config_from_args

import pytest

pytestmark = pytest.mark.slow  # heavy tier: run via plain pytest / -m slow


def test_defaults():
    args = build_parser().parse_args(["--synthetic"])
    cfg = config_from_args(args)
    assert cfg.model.in_channels == 4
    assert cfg.model.out_channels == 4  # 2 stems x 2 channels
    assert cfg.stft.n_fft == 2048


def test_reference_flag_shortcuts():
    args = build_parser().parse_args([
        "--data_root", "/data/musdb", "--batch_size", "8",
        "--segment_seconds", "3.0", "--n_fft", "1024", "--hop_length", "256",
        "--lr", "1e-4", "--num_epochs", "10", "--use_checkpointing", "--bf16",
        "--augment", "--mixup", "--use_mrstft", "--seed", "7",
    ])
    cfg = config_from_args(args)
    assert cfg.data.musdb_root == "/data/musdb"
    assert cfg.data.batch_size == 8
    assert cfg.data.segment_seconds == 3.0
    assert cfg.stft.n_fft == 1024 and cfg.stft.hop_length == 256
    assert cfg.train.learning_rate == 1e-4
    assert cfg.train.max_epochs == 10
    assert cfg.model.remat is True
    assert cfg.model.dtype == "bfloat16"
    assert cfg.data.augment and cfg.data.mixup
    assert cfg.train.use_mrstft_loss
    assert cfg.train.seed == 7


def test_four_stem_channels():
    args = build_parser().parse_args(
        ["--synthetic", "--stems", "vocals,drums,bass,other"]
    )
    cfg = config_from_args(args)
    assert cfg.data.stems == ("vocals", "drums", "bass", "other")
    assert cfg.model.out_channels == 8


def test_dotted_overrides_win():
    args = build_parser().parse_args(
        ["--synthetic", "--set", "model.dims=(8,16,32,64)",
         "--set", "model.depths=(1,1,1,1)"]
    )
    cfg = config_from_args(args)
    assert cfg.model.dims == (8, 16, 32, 64)
    assert cfg.model.depths == (1, 1, 1, 1)


def test_yaml_config_load(tmp_path):
    from tfswa_tpu.config import Config

    path = str(tmp_path / "c.yaml")
    Config().apply_overrides(["stft.n_fft=1024"]).to_yaml(path)
    args = build_parser().parse_args(["--config", path, "--synthetic"])
    cfg = config_from_args(args)
    assert cfg.stft.n_fft == 1024
