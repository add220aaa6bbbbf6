"""Train-time mask conventions (quality-ceiling fix, VERDICT round-2 #8).

The reference trains under a double-sigmoid mask capped to [0.5, 0.80]
(reference: trainer.py:179-186 on top of tfswa_unet.py:144).  The
framework preserves that as "parity" and ships "direct" (single-sigmoid
head channels as [0, 1] magnitude masks) as the fix; these tests pin the
plumbing: the convention changes the mask range, flows through config ->
train/eval steps -> SourceSeparator, and use_shift_mask reaches the model.
"""
import jax
import jax.numpy as jnp
import numpy as np

from tfswa_tpu.config import Config
from tfswa_tpu.models import TFSWAUNet
from tfswa_tpu.ops.masking import apply_magnitude_masks, apply_trainer_masks


def test_parity_masks_are_capped_direct_are_not():
    rng = np.random.default_rng(0)
    # head output is sigmoid-activated: values in (0, 1)
    out = jax.nn.sigmoid(
        jnp.asarray(rng.standard_normal((2, 4, 8, 6)), jnp.float32) * 4
    )
    mag = jnp.ones((2, 8, 6), jnp.float32)

    parity = apply_magnitude_masks(out, mag, 2, "parity")
    direct = apply_magnitude_masks(out, mag, 2, "direct")

    # parity == the reference trainer mask path
    np.testing.assert_allclose(
        parity, apply_trainer_masks(out, mag, 2), rtol=1e-6
    )
    # the documented cap: sigma(0)..sigma(sqrt(2 + eps))
    assert float(parity.min()) >= 0.5 - 1e-6
    assert float(parity.max()) <= float(jax.nn.sigmoid(jnp.sqrt(2.0))) + 1e-6
    # direct masks span (0, 1): can actually silence and pass bins
    assert float(direct.min()) < 0.2
    assert float(direct.max()) > 0.9


def test_mask_mode_flows_from_config_to_train_step():
    from tfswa_tpu.ops.stft import STFTProcessor
    from tfswa_tpu.training.train_state import (
        create_train_state, make_train_step,
    )

    cfg = Config()
    cfg.model.in_channels = 4
    cfg.model.out_channels = 4
    cfg.model.depths = (1, 1, 1, 1)
    cfg.model.dims = (8, 16, 32, 64)
    cfg.model.window_size = 4
    cfg.model.shift_size = 2
    cfg.model.num_heads = 2
    cfg.stft.n_fft = 256
    cfg.stft.hop_length = 64
    cfg.stft.sample_rate = 8000
    cfg.train.train_mask_mode = "direct"

    proc = STFTProcessor(cfg.stft)
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), (1, 4, 129, 17), steps_per_epoch=4
    )
    step = jax.jit(make_train_step(
        model, proc, ("vocals", "other"),
        mask_mode=cfg.train.train_mask_mode,
    ))
    rng = np.random.default_rng(0)
    mixtures = jnp.asarray(rng.standard_normal((2, 2, 1024)), jnp.float32)
    targets = {
        k: jnp.asarray(rng.standard_normal((2, 2, 1024)), jnp.float32)
        for k in ("vocals", "other")
    }
    new_state, losses = step(state, mixtures, targets)
    assert np.isfinite(float(losses["total_loss"]))
    # the two conventions produce different losses on the same weights
    step_p = jax.jit(make_train_step(
        model, proc, ("vocals", "other"), mask_mode="parity",
    ))
    _, losses_p = step_p(state, mixtures, targets)
    assert float(losses["total_loss"]) != float(losses_p["total_loss"])


def test_mag_direct_separator_mode():
    from tfswa_tpu.config import STFTConfig
    from tfswa_tpu.evaluation import SourceSeparator
    from tfswa_tpu.ops.stft import STFTProcessor

    model = TFSWAUNet(
        in_channels=4, out_channels=4, depths=(1, 1, 1, 1),
        dims=(8, 16, 32, 64), window_size=4, shift_size=2, num_heads=2,
    )
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 4, 129, 20), np.float32)
    )
    proc = STFTProcessor(STFTConfig(n_fft=256, hop_length=64, sample_rate=8000))
    sep = SourceSeparator(
        model, variables, proc, segment_length=1.0, mask_mode="mag_direct",
    )
    out = sep.separate(
        np.sin(2 * np.pi * 440 * np.arange(4000) / 8000).astype(np.float32)
    )
    assert set(out) == {"vocals", "other"}
    for v in out.values():
        assert v.shape == (1, 4000)
        assert np.isfinite(v).all()


def test_use_shift_mask_from_config():
    cfg = Config()
    cfg.model.use_shift_mask = True
    model = TFSWAUNet.from_config(cfg.model)
    assert model.use_shift_mask is True
    # config round-trips through dict (checkpoint config.json path)
    assert Config.from_dict(cfg.to_dict()).model.use_shift_mask is True
    assert Config.from_dict(cfg.to_dict()).train.train_mask_mode == "parity"
