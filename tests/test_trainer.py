"""End-to-end Trainer loop on the synthetic dataset: epochs run, metrics are
logged, checkpoints (epoch/best/latest) appear, resume works, augmentation
path executes.
"""
import json
import os

import jax
import numpy as np
import pytest

from tfswa_tpu.config import (
    Config,
    DataConfig,
    EvalConfig,
    ModelConfig,
    STFTConfig,
    TrainConfig,
)
from tfswa_tpu.data.synthetic import SyntheticDataset
from tfswa_tpu.training.trainer import Trainer

pytestmark = pytest.mark.slow  # heavy tier: run via plain pytest / -m slow

SR = 8000


def make_config(tmp_path, **train_kw) -> Config:
    return Config(
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
            learning_rate=1e-3, max_epochs=2, log_every_n_steps=1,
            sdr_eval_num_tracks=1,
            checkpoint_dir=str(tmp_path / "ckpt"),
            log_dir=str(tmp_path / "logs"),
            **train_kw,
        ),
    )


@pytest.fixture(scope="module")
def datasets():
    train = SyntheticDataset(
        num_tracks=2, track_seconds=2.0, segment_seconds=0.5,
        sample_rate=SR, random_segments=True,
    )
    val = SyntheticDataset(
        num_tracks=1, track_seconds=2.0, segment_seconds=0.5,
        sample_rate=SR, random_segments=False, seed=1,
    )
    return train, val


def test_trainer_end_to_end(tmp_path, datasets):
    train_ds, val_ds = datasets
    cfg = make_config(tmp_path)
    trainer = Trainer(cfg, train_ds, val_ds)
    metrics = trainer.train()
    assert np.isfinite(metrics["total_loss"])

    # checkpoints with best/latest semantics
    ckpt_dir = cfg.train.checkpoint_dir
    assert os.path.isdir(os.path.join(ckpt_dir, "latest"))
    assert os.path.isdir(os.path.join(ckpt_dir, "best"))
    assert os.path.isfile(os.path.join(ckpt_dir, "config.json"))

    # metric log stream
    with open(os.path.join(cfg.train.log_dir, "metrics.jsonl")) as fh:
        records = [json.loads(line) for line in fh]
    assert any("train/total_loss" in r for r in records)
    assert any(any(k.startswith("val/") for k in r) for r in records)
    assert any(any(k.startswith("sdr/") for k in r) for r in records)


def test_trainer_resume(tmp_path, datasets):
    train_ds, val_ds = datasets
    cfg = make_config(tmp_path)
    t1 = Trainer(cfg, train_ds, val_ds)
    t1.train()
    step_before = t1.global_step

    t2 = Trainer(cfg, train_ds, val_ds)
    t2.load_checkpoint("latest")
    assert t2.current_epoch == cfg.train.max_epochs
    assert t2.global_step == step_before


def test_trainer_sdr_eval_on_tp_mesh(tmp_path, datasets):
    """In-training SDR eval under a dp=4 x tp=2 mesh (VERDICT round-4 weak
    #6): evaluate_sdr's separator must carry the trainer's mesh so the
    TP-sharded params hit a matching sharded jit, and its numbers must agree
    with the single-device eval of the same weights."""
    from tfswa_tpu.parallel.mesh import create_mesh

    _, val_ds = datasets
    train_ds = SyntheticDataset(
        num_tracks=4, track_seconds=2.0, segment_seconds=0.5,
        sample_rate=SR, random_segments=True,
    )
    mesh = create_mesh(shape=(4, 2))
    cfg = make_config(
        tmp_path, sdr_eval_segment_seconds=0.5, sdr_eval_overlap=0.5
    )
    cfg.data.batch_size = 4  # must tile the dp=4 axis
    trainer = Trainer(cfg, train_ds, val_ds, mesh=mesh)
    trainer.train_epoch()
    sdr_mesh = trainer.evaluate_sdr()
    assert trainer._sdr_separator.mesh is mesh
    assert np.isfinite(sdr_mesh["sdr/avg"])
    # the refresh path (update_variables) must reshard, not just assign
    trainer.evaluate_sdr()

    # value check: single-device eval of the SAME weights must agree
    # (GSPMD only partitions; the math is identical)
    ref_trainer = Trainer(cfg, train_ds, val_ds)
    ref_trainer.state = ref_trainer.state.replace(
        params=jax.device_get(trainer.state.params),
        batch_stats=jax.device_get(trainer.state.batch_stats),
    )
    sdr_single = ref_trainer.evaluate_sdr()
    assert abs(sdr_single["sdr/avg"] - sdr_mesh["sdr/avg"]) < 1e-3


def test_trainer_with_augmentation(tmp_path, datasets):
    train_ds, _ = datasets
    cfg = make_config(tmp_path)
    cfg.data.augment = True
    cfg.data.mixup = True
    cfg.data.aug_prob = 1.0
    trainer = Trainer(cfg, train_ds, None)
    metrics = trainer.train_epoch()
    assert np.isfinite(metrics["total_loss"])
