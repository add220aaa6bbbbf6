"""Mask conventions for converting model outputs to separated spectrograms.

The reference ships TWO different mask conventions (SURVEY.md section 2.3):

  1. "trainer": per-stem channel pair -> sigmoid(sqrt(re^2 + im^2 + 1e-8))
     applied to the MONO mixture magnitude (reference: trainer.py:179-186,
     419-424).  Note the double sigmoid: the model head already ends in
     sigmoid (reference: tfswa_unet.py:144), bounding effective masks to
     [sigma(0), sigma(sqrt(2))] ~ [0.5, 0.80].  This is the convention the
     model is trained under, so it is the default.

  2. "direct": raw head channels 0..n_stems-1 applied elementwise to the
     complex mixture spectrogram (reference: inference.py:139-150).

Both are exposed; pick via EvalConfig.mask_mode.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def trainer_magnitude_masks(model_output: jnp.ndarray, n_stems: int) -> jnp.ndarray:
    """(B, 2*n_stems, F, T) head output -> (B, n_stems, F, T) magnitude masks,
    sigmoid(|re, im|) per stem (reference: trainer.py:179-183)."""
    B, C, F, T = model_output.shape
    assert C == 2 * n_stems, f"expected {2 * n_stems} channels, got {C}"
    pairs = model_output.reshape(B, n_stems, 2, F, T)
    mag = jnp.sqrt(pairs[:, :, 0] ** 2 + pairs[:, :, 1] ** 2 + 1e-8)
    return jax.nn.sigmoid(mag)


def apply_trainer_masks(
    model_output: jnp.ndarray, mixture_mag_mono: jnp.ndarray, n_stems: int
) -> jnp.ndarray:
    """-> (B, n_stems, F, T) predicted mono magnitudes
    (reference: trainer.py:186)."""
    masks = trainer_magnitude_masks(model_output, n_stems)
    return masks * mixture_mag_mono[:, None]


def trainer_masked_complex(
    model_output: jnp.ndarray,
    mixture_mag_mono: jnp.ndarray,
    mixture_phase_mono: jnp.ndarray,
    n_stems: int,
) -> jnp.ndarray:
    """-> (B, n_stems, F, T) complex spectrograms: masked mono magnitude with
    the mixture's phase (reference: trainer.py:420-427)."""
    pred_mags = apply_trainer_masks(model_output, mixture_mag_mono, n_stems)
    return pred_mags * jnp.exp(1j * mixture_phase_mono[:, None])


def apply_magnitude_masks(
    model_output: jnp.ndarray,
    mixture_mag_mono: jnp.ndarray,
    n_stems: int,
    convention: str = "parity",
) -> jnp.ndarray:
    """-> (B, n_stems, F, T) predicted mono magnitudes, by convention:

      "parity": the reference's double sigmoid (apply_trainer_masks);
      "direct": head channels 0..n_stems-1 (already sigmoid, [0, 1])
        applied directly as magnitude masks — removes the parity
        convention's [0.5, 0.80] mask cap (quality A/B: runs/quality_ab).
    """
    if convention == "parity":
        return apply_trainer_masks(model_output, mixture_mag_mono, n_stems)
    if convention == "direct":
        return direct_masks(model_output, n_stems) * mixture_mag_mono[:, None]
    raise ValueError(f"unknown mask convention: {convention!r}")


def direct_masks(model_output: jnp.ndarray, n_stems: int) -> jnp.ndarray:
    """First n_stems head channels used directly as (real-valued) masks
    (reference: inference.py:137-145 indexes masks[:, i:i+1])."""
    return model_output[:, :n_stems]


def apply_direct_masks(
    model_output: jnp.ndarray, mixture_spec: jnp.ndarray, n_stems: int
) -> jnp.ndarray:
    """Direct masks x complex mixture (B, C, F, T) -> (B, n_stems, C, F, T)
    (reference: inference.py:139-150)."""
    masks = direct_masks(model_output, n_stems)          # (B, S, F, T)
    return mixture_spec[:, None] * masks[:, :, None]
