"""Reference-checkpoint interop: load a torch .pt training checkpoint
directly into a SourceSeparator (reference: inference.py:300-364 — which
crashes as shipped; ours must work)."""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "src", "models")),
    reason="reference repo unavailable",
)


def test_load_separator_from_torch_pt(tmp_path):
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from src.models.tfswa_unet import TFSWAUNet as TorchTFSWAUNet

    torch.manual_seed(0)
    cfg = dict(in_channels=2, out_channels=4, depths=[1, 1, 1, 1],
               dims=[8, 16, 32, 64], window_size=4, shift_size=2, num_heads=2)
    t_model = TorchTFSWAUNet(**cfg)
    ckpt_path = str(tmp_path / "checkpoint_epoch_3.pt")
    torch.save(
        {
            "epoch": 3,
            "global_step": 300,
            "model_state_dict": t_model.state_dict(),
            "config": cfg,
        },
        ckpt_path,
    )

    from tfswa_tpu.config import EvalConfig, STFTConfig
    from tfswa_tpu.evaluation import load_separator_from_checkpoint

    sep = load_separator_from_checkpoint(
        ckpt_path,
        stft_config=STFTConfig(n_fft=256, hop_length=64, sample_rate=8000),
        eval_config=EvalConfig(segment_seconds=1.0, mask_mode="direct"),
    )
    assert sep.n_stems == 2
    assert sep.model_audio_channels == 1  # in_channels=2 -> mono

    audio = np.sin(2 * np.pi * 440 * np.arange(8000) / 8000).astype(np.float32)
    out = sep.separate(audio)
    assert set(out) == {"vocals", "other"}
    assert out["vocals"].shape == (1, 8000)
    assert np.isfinite(out["vocals"]).all()


def test_load_bare_state_dict(tmp_path):
    """The reference loader also accepts a bare state_dict
    (reference: inference.py:317-341)."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from src.models.tfswa_unet import TFSWAUNet as TorchTFSWAUNet

    cfg = dict(in_channels=2, out_channels=2, depths=[1, 1, 1, 1],
               dims=[8, 16, 32, 64], window_size=4, shift_size=2, num_heads=2)
    t_model = TorchTFSWAUNet(**cfg)
    ckpt_path = str(tmp_path / "bare.pt")
    torch.save(t_model.state_dict(), ckpt_path)

    from tfswa_tpu.config import EvalConfig, ModelConfig, STFTConfig
    from tfswa_tpu.evaluation import load_separator_from_checkpoint

    sep = load_separator_from_checkpoint(
        ckpt_path,
        model_config=ModelConfig(
            in_channels=2, out_channels=2, depths=(1, 1, 1, 1),
            dims=(8, 16, 32, 64), window_size=4, shift_size=2, num_heads=2,
        ),
        stft_config=STFTConfig(n_fft=256, hop_length=64, sample_rate=8000),
        eval_config=EvalConfig(segment_seconds=0.5),
    )
    out = sep.separate(np.zeros(4000, np.float32))
    assert out["vocals"].shape == (1, 4000)
