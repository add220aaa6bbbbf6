"""Metric sanity on synthetic signals (reference: test_phase3.py:23-120)
plus elementwise parity vs the reference torch implementation when available.
"""
import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from tfswa_tpu.evaluation.metrics import (
    MetricsCalculator,
    bss_eval,
    compute_musdb_metrics,
    sar,
    sdr,
    si_sdr,
    sir,
)

REFERENCE = "/root/reference"


def _sine_mix(noise=0.1, seed=0, n=44100):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 44100.0
    clean = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    noisy = clean + noise * rng.standard_normal(n).astype(np.float32)
    return clean, noisy


def test_sdr_perfect():
    clean, _ = _sine_mix()
    val = float(sdr(jnp.asarray(clean), jnp.asarray(clean)))
    assert val > 90  # eps-clamped, not inf


def test_sdr_noisy_sine():
    """SDR > 15 dB at noise 0.1 (reference: test_phase3.py:54-55)."""
    clean, noisy = _sine_mix(0.1)
    val = float(sdr(jnp.asarray(noisy), jnp.asarray(clean)))
    assert 15 < val < 20


def test_si_sdr_scale_invariance():
    clean, noisy = _sine_mix(0.1)
    v1 = float(si_sdr(jnp.asarray(noisy), jnp.asarray(clean)))
    v2 = float(si_sdr(jnp.asarray(3.7 * noisy), jnp.asarray(clean)))
    np.testing.assert_allclose(v1, v2, atol=1e-3)


def test_sir_sar_synthetic():
    clean, _ = _sine_mix()
    t = np.arange(44100) / 44100.0
    other = np.sin(2 * np.pi * 880 * t).astype(np.float32)
    sources = jnp.stack([jnp.asarray(clean), jnp.asarray(other)])
    est = jnp.asarray(clean + 0.1 * other)
    sir_val = float(sir(est, jnp.asarray(clean), sources))
    sar_val = float(sar(est, jnp.asarray(clean), sources))
    assert sir_val > 15
    assert sar_val > 40  # est is a pure combination of sources


def test_bss_eval_keys():
    clean, noisy = _sine_mix()
    sources = jnp.stack([jnp.asarray(clean), jnp.asarray(clean * 0 + 0.01)])
    out = bss_eval(jnp.asarray(noisy), jnp.asarray(clean), sources)
    assert set(out) == {"sdr", "si_sdr", "sir", "sar"}


def test_batched_matches_single():
    clean, noisy = _sine_mix(0.1)
    single = float(sdr(jnp.asarray(noisy), jnp.asarray(clean)))
    batched = sdr(jnp.asarray(np.stack([noisy, noisy])), jnp.asarray(np.stack([clean, clean])))
    np.testing.assert_allclose(np.asarray(batched), single, rtol=1e-5)


def test_framewise_median():
    clean, noisy = _sine_mix(0.1, n=44100 * 3)
    calc = MetricsCalculator(segment_length=44100)
    m = calc.compute(noisy, clean)
    full = MetricsCalculator().compute(noisy, clean)
    assert abs(m["sdr"] - full["sdr"]) < 1.0


def test_compute_musdb_metrics():
    clean, noisy = _sine_mix(0.1, n=44100 * 2)
    t = np.arange(44100 * 2) / 44100.0
    other = np.sin(2 * np.pi * 880 * t).astype(np.float32)
    res = compute_musdb_metrics(
        {"vocals": noisy, "other": other},
        {"vocals": clean, "other": other},
    )
    assert set(res) == {"vocals", "other"}
    assert res["vocals"]["sdr"] > 10
    assert set(res["vocals"]) == {"sdr", "si_sdr", "sir", "sar"}


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "src")), reason="no reference"
)
def test_reference_parity():
    """Elementwise parity with the reference torch metrics."""
    torch = pytest.importorskip("torch")
    # Load the reference metrics module directly; its package __init__ pulls
    # torchaudio, which this image doesn't ship.
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_metrics", os.path.join(REFERENCE, "src", "evaluation", "metrics.py")
    )
    ref_metrics = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_metrics)
    t_sdr, t_si_sdr = ref_metrics.sdr, ref_metrics.si_sdr
    t_sir, t_sar = ref_metrics.sir, ref_metrics.sar

    rng = np.random.default_rng(7)
    est = rng.standard_normal((3, 8000)).astype(np.float32)
    ref = rng.standard_normal((3, 8000)).astype(np.float32)
    srcs = rng.standard_normal((3, 2, 8000)).astype(np.float32)

    np.testing.assert_allclose(
        np.asarray(sdr(jnp.asarray(est), jnp.asarray(ref))),
        t_sdr(torch.from_numpy(est), torch.from_numpy(ref)).numpy(),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(si_sdr(jnp.asarray(est), jnp.asarray(ref))),
        t_si_sdr(torch.from_numpy(est), torch.from_numpy(ref)).numpy(),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(sir(jnp.asarray(est), jnp.asarray(ref), jnp.asarray(srcs))),
        t_sir(torch.from_numpy(est), torch.from_numpy(ref), torch.from_numpy(srcs)).numpy(),
        rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(sar(jnp.asarray(est), jnp.asarray(ref), jnp.asarray(srcs))),
        t_sar(torch.from_numpy(est), torch.from_numpy(ref), torch.from_numpy(srcs)).numpy(),
        rtol=1e-3,
    )
