"""Loss behaviour parity (reference: losses.py + test_loss_fix.py)."""
import numpy as np
import jax.numpy as jnp

from tfswa_tpu.training.losses import (
    l1_spectrogram_loss,
    multi_resolution_stft_loss,
    source_separation_loss,
)


def test_l1_nonzero_on_random():
    """Regression guard from the reference (reference: test_loss_fix.py)."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((2, 64, 100)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, 64, 100)), jnp.float32)
    loss = float(l1_spectrogram_loss(a, b))
    assert loss > 0.1


def test_l1_complex_inputs():
    rng = np.random.default_rng(1)
    a = (rng.standard_normal((1, 8, 8)) + 1j * rng.standard_normal((1, 8, 8))).astype(np.complex64)
    loss = float(l1_spectrogram_loss(jnp.asarray(a), jnp.asarray(a)))
    assert loss == 0.0
    b = 2 * a
    loss2 = float(l1_spectrogram_loss(jnp.asarray(a), jnp.asarray(b)))
    assert loss2 > 0


def test_l1_nan_guard():
    """Invalid loss collapses to 0 instead of NaN (reference: losses.py:49-62)."""
    a = jnp.full((2, 4), jnp.nan)
    b = jnp.zeros((2, 4))
    assert float(l1_spectrogram_loss(a, b)) == 0.0


def test_mrstft_zero_for_identical():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 2, 8192)), jnp.float32)
    assert float(multi_resolution_stft_loss(x, x)) < 1e-6
    y = jnp.asarray(rng.standard_normal((1, 2, 8192)), jnp.float32)
    assert float(multi_resolution_stft_loss(x, y)) > 0.01


def test_source_separation_loss_dict():
    rng = np.random.default_rng(3)
    pred = {s: jnp.asarray(rng.random((2, 33, 20)), jnp.float32) for s in ("vocals", "other")}
    tgt = {s: jnp.asarray(rng.random((2, 33, 20)), jnp.float32) for s in ("vocals", "other")}
    out = source_separation_loss(pred, tgt)
    assert set(out) == {"total_loss", "l1_loss", "l1_vocals", "l1_other"}
    np.testing.assert_allclose(
        float(out["l1_loss"]),
        (float(out["l1_vocals"]) + float(out["l1_other"])) / 2,
        rtol=1e-6,
    )
    np.testing.assert_allclose(float(out["total_loss"]), float(out["l1_loss"]), rtol=1e-6)


def test_source_separation_loss_with_mrstft():
    rng = np.random.default_rng(4)
    pred_s = {"vocals": jnp.asarray(rng.random((1, 16, 10)), jnp.float32)}
    tgt_s = {"vocals": jnp.asarray(rng.random((1, 16, 10)), jnp.float32)}
    pred_a = {"vocals": jnp.asarray(rng.standard_normal((1, 1, 4096)), jnp.float32)}
    tgt_a = {"vocals": jnp.asarray(rng.standard_normal((1, 1, 4096)), jnp.float32)}
    out = source_separation_loss(
        pred_s, tgt_s, pred_a, tgt_a, use_mrstft=True, mrstft_weight=0.5
    )
    assert "mrstft_loss" in out
    np.testing.assert_allclose(
        float(out["total_loss"]),
        float(out["l1_loss"]) + 0.5 * float(out["mrstft_loss"]),
        rtol=1e-5,
    )
