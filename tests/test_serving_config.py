"""Serving-config productization (VERDICT round-4 weak #4): every measured
fast-serving lever must be reachable through EvalConfig ->
load_separator_from_checkpoint -> the CLIs, not only by copying bench.py
internals."""
import dataclasses
import os

import numpy as np
import pytest

import jax

from tfswa_tpu.config import (
    Config,
    DataConfig,
    EvalConfig,
    ModelConfig,
    STFTConfig,
    TrainConfig,
)

pytestmark = pytest.mark.slow  # builds a real separator from a checkpoint

SR = 8000


def test_fast_serving_preset_values():
    cfg = EvalConfig.fast_serving()
    assert cfg.device_ola is True
    assert cfg.transfer_dtype == "float16"
    assert cfg.freq_policy == "crop_pow2"
    assert cfg.stft_precision == "default"
    assert cfg.ola_bucket_seconds == 60.0
    # parity knobs untouched by the preset
    assert cfg.overlap == 0.25
    assert cfg.mask_mode == "trainer"


def test_fast_serving_preset_overrides():
    cfg = EvalConfig.fast_serving(transfer_dtype="int8", overlap=0.5)
    assert cfg.transfer_dtype == "int8"
    assert cfg.overlap == 0.5
    assert cfg.device_ola is True  # rest of the preset intact


def test_cli_preset_and_flag_overrides():
    from tfswa_tpu.cli.separate import eval_config_from_args

    class Args:
        preset = "fast"
        segment_seconds = 10.0
        overlap = 0.25
        mask_mode = "trainer"
        segment_batch = None
        transfer_dtype = "int16"      # explicit flag beats the preset
        device_ola = None
        ola_bucket_seconds = None
        freq_policy = None
        stft_precision = None

    cfg = eval_config_from_args(Args())
    assert cfg.device_ola is True          # from the preset
    assert cfg.transfer_dtype == "int16"   # from the flag
    assert cfg.freq_policy == "crop_pow2"

    Args.preset = "parity"
    Args.transfer_dtype = None
    cfg = eval_config_from_args(Args())
    assert cfg == EvalConfig()  # parity defaults, untouched


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    """A real (tiny) orbax checkpoint via the Trainer's manager."""
    from tfswa_tpu.data.synthetic import SyntheticDataset
    from tfswa_tpu.training.trainer import Trainer

    tmp = tmp_path_factory.mktemp("serving_ckpt")
    cfg = Config(
        model=ModelConfig(
            in_channels=4, out_channels=4, depths=(1, 1, 1, 1),
            dims=(8, 16, 32, 64), window_size=4, shift_size=2, num_heads=2,
        ),
        stft=STFTConfig(n_fft=256, hop_length=64, sample_rate=SR),
        data=DataConfig(
            stems=("vocals", "other"), segment_seconds=0.5, sample_rate=SR,
            batch_size=2, num_workers=0, prefetch=1,
        ),
        train=TrainConfig(
            max_epochs=1, checkpoint_dir=str(tmp / "ckpt"),
            log_dir=str(tmp / "logs"), sdr_eval_num_tracks=0,
        ),
    )
    ds = SyntheticDataset(
        num_tracks=2, track_seconds=1.0, segment_seconds=0.5, sample_rate=SR
    )
    trainer = Trainer(cfg, ds)
    trainer.ckpt.save(trainer.state, epoch=0, global_step=1,
                      best_val_loss=1.0, is_best=True)
    return cfg.train.checkpoint_dir


def test_loader_honors_fast_serving_config(ckpt_dir):
    from tfswa_tpu.evaluation import load_separator_from_checkpoint

    sep = load_separator_from_checkpoint(
        ckpt_dir,
        stft_config=STFTConfig(n_fft=256, hop_length=64, sample_rate=SR),
        eval_config=EvalConfig.fast_serving(
            segment_seconds=1.0, ola_bucket_seconds=2.0
        ),
    )
    assert sep.device_ola is True
    assert sep.transfer_dtype == np.float16
    assert sep.freq_policy == "crop_pow2"
    assert sep.segment_batch == 8
    # stft_precision plumbed into the processor
    assert sep.stft_processor.config.precision == "default"

    # ... and it actually separates through the device-OLA path
    audio = np.sin(
        2 * np.pi * 440 * np.arange(int(SR * 2.6)) / SR
    ).astype(np.float32)
    out = sep.separate(audio)
    assert out["vocals"].shape == (1, int(SR * 2.6))
    assert np.isfinite(out["vocals"]).all()


def test_loader_parity_default_unchanged(ckpt_dir):
    from tfswa_tpu.evaluation import load_separator_from_checkpoint

    sep = load_separator_from_checkpoint(
        ckpt_dir,
        stft_config=STFTConfig(n_fft=256, hop_length=64, sample_rate=SR),
        eval_config=EvalConfig(segment_seconds=1.0),
    )
    assert sep.device_ola is False
    assert sep.transfer_dtype == np.float32
    assert sep.freq_policy == "full"
    assert sep.stft_processor.config.precision == "highest"
