"""Spectrogram augmentation wiring (reference capability:
augmentation.py:148-198,227-248 — defined there, wired here)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tfswa_tpu.config import Config
from tfswa_tpu.data.augment import (
    SpectrogramAugmentation,
    build_augmentations,
    frequency_masking,
    time_masking,
)
from tfswa_tpu.ops.stft import STFTProcessor


def test_spectrogram_augmentation_masks_input():
    aug = SpectrogramAugmentation(freq_mask_param=8, time_mask_param=8,
                                  prob=1.0)
    spec = jnp.ones((2, 4, 32, 24))
    out = aug(jax.random.PRNGKey(0), spec)
    assert out.shape == spec.shape
    # with prob=1 at least one of the two masks zeros something (width can
    # randomly be 0 for one, so check across a few keys)
    zeros = [float(jnp.sum(aug(jax.random.PRNGKey(k), spec) == 0))
             for k in range(4)]
    assert max(zeros) > 0
    # per-item independence: the two batch items get different masks
    out = aug(jax.random.PRNGKey(5), spec)
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_masking_bounded_width():
    spec = jnp.ones((2, 16, 12))
    out = frequency_masking(spec, jax.random.PRNGKey(1), max_width=4)
    frac = float(jnp.mean(out == 0))
    assert frac <= 4 / 16 + 1e-6
    out = time_masking(spec, jax.random.PRNGKey(2), max_width=5)
    assert float(jnp.mean(out == 0)) <= 5 / 12 + 1e-6


def test_build_augmentations_spec_flag():
    cfg = Config()
    cfg.data.spec_augment = True
    proc = STFTProcessor(cfg.stft)
    _, _, spec_aug = build_augmentations(cfg.data, proc)
    assert isinstance(spec_aug, SpectrogramAugmentation)
    cfg.data.spec_augment = False
    _, _, none_aug = build_augmentations(cfg.data, proc)
    assert none_aug is None


@pytest.mark.slow  # full train step on CPU (~8 min on this box)
def test_train_step_spec_augment_changes_loss():
    """The wired spec-augment must change the training loss (input masked,
    targets clean) while leaving the no-augment step untouched."""
    from tfswa_tpu.training.train_state import create_train_state, make_train_step

    cfg = Config()
    cfg.model.depths = (1, 1, 1, 1)
    cfg.model.dims = (8, 16, 32, 64)
    cfg.model.num_heads = 2
    cfg.model.window_size = 4
    cfg.model.shift_size = 2
    cfg.stft.n_fft = 256
    cfg.stft.hop_length = 64
    cfg.data.stems = ("vocals", "other")
    proc = STFTProcessor(cfg.stft)
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), (1, 4, 129, 20), steps_per_epoch=4
    )
    mixtures = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 1280)) * 0.1
    targets = {
        "vocals": mixtures * 0.5,
        "other": mixtures * 0.5,
    }
    plain = make_train_step(model, proc, ("vocals", "other"))
    augd = make_train_step(
        model, proc, ("vocals", "other"),
        spec_augment=SpectrogramAugmentation(prob=1.0, freq_mask_param=40,
                                             time_mask_param=10),
    )
    _, loss_plain = plain(state, mixtures, targets)
    _, loss_augd = augd(state, mixtures, targets)
    assert not np.isclose(float(loss_plain["total_loss"]),
                          float(loss_augd["total_loss"]))
