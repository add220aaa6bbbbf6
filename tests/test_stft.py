"""STFT/ISTFT numerics: round-trip and direct parity vs torch.stft.

Mirrors reference test tolerances (reference: test_phase2.py:41-84) and adds
what the reference lacks: elementwise parity against torch.stft/istft.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tfswa_tpu.config import STFTConfig
from tfswa_tpu.ops.stft import STFTProcessor, SpectrogramNormalizer, stft, istft

try:
    import torch

    HAS_TORCH = True
except ImportError:
    HAS_TORCH = False


@pytest.fixture(scope="module")
def proc():
    return STFTProcessor(STFTConfig(n_fft=512, hop_length=128))


def test_round_trip(proc):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 2, 8192)).astype(np.float32)
    spec = proc.stft(jnp.asarray(x))
    assert spec.shape == (2, 2, 257, 8192 // 128 + 1)
    assert spec.dtype == jnp.complex64
    y = proc.istft(spec, length=8192)
    err = np.max(np.abs(np.asarray(y) - x))
    assert err < 1e-4, f"round-trip error {err}"


def test_round_trip_north_star():
    proc = STFTProcessor(STFTConfig(n_fft=2048, hop_length=512))
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 2, 44032)).astype(np.float32)  # hop multiple
    y = proc.istft(proc.stft(jnp.asarray(x)), length=44032)
    assert np.max(np.abs(np.asarray(y) - x)) < 1e-3


def test_round_trip_non_hop_multiple_interior():
    """Signal length not a hop multiple: the final partial hop is never
    analyzed (same as torch.stft), but the interior must stay exact."""
    proc = STFTProcessor(STFTConfig(n_fft=2048, hop_length=512))
    rng = np.random.default_rng(11)
    x = rng.standard_normal((1, 44100)).astype(np.float32)
    y = np.asarray(proc.istft(proc.stft(jnp.asarray(x)), length=44100))
    assert np.max(np.abs(y[:, :-600] - x[:, :-600])) < 1e-3


@pytest.mark.skipif(not HAS_TORCH, reason="torch unavailable")
@pytest.mark.parametrize("n_fft,hop", [(512, 128), (1024, 256), (2048, 512)])
def test_torch_stft_parity(n_fft, hop):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, n_fft * 4)).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(x), n_fft=n_fft, hop_length=hop))
    theirs = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=2e-4)


@pytest.mark.skipif(not HAS_TORCH, reason="torch unavailable")
def test_torch_istft_parity():
    n_fft, hop = 512, 128
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    spec_t = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    ours = np.asarray(
        istft(jnp.asarray(spec_t.numpy()), n_fft=n_fft, hop_length=hop, length=4096)
    )
    theirs = torch.istft(
        spec_t,
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        center=True,
        length=4096,
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=2e-4)


def test_windows():
    for w in ("hann", "hamming", "blackman"):
        p = STFTProcessor(STFTConfig(n_fft=256, hop_length=64, window=w))
        x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 1, 2048)), jnp.float32)
        y = p.istft(p.stft(x), length=2048)
        assert np.max(np.abs(np.asarray(y) - np.asarray(x))) < 1e-3


def test_magnitude_phase(proc):
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, 1, 2048)), jnp.float32
    )
    mag, phase = proc.stft(x, return_magnitude_phase=True)
    spec = proc.stft(x)
    np.testing.assert_allclose(np.asarray(mag), np.abs(np.asarray(spec)), rtol=1e-5, atol=1e-5)
    y = proc.istft(magnitude=mag, phase=phase, length=2048)
    assert np.max(np.abs(np.asarray(y) - np.asarray(x))) < 1e-3


def test_model_io_adapters(proc):
    rng = np.random.default_rng(6)
    spec = (rng.standard_normal((2, 2, 257, 17)) + 1j * rng.standard_normal((2, 2, 257, 17))).astype(np.complex64)
    spec = jnp.asarray(spec)
    mi = proc.to_model_input(spec)
    assert mi.shape == (2, 4, 257, 17)
    np.testing.assert_allclose(np.asarray(mi[:, :2]), np.real(np.asarray(spec)))
    np.testing.assert_allclose(np.asarray(mi[:, 2:]), np.imag(np.asarray(spec)))

    masks = jnp.asarray(rng.random((2, 4, 257, 17)).astype(np.float32))
    sep = proc.from_model_output(masks, spec)
    assert sep.shape == (2, 2, 2, 257, 17)
    np.testing.assert_allclose(
        np.asarray(sep[:, 1]),
        np.asarray(spec) * np.asarray(masks.reshape(2, 2, 2, 257, 17)[:, 1]),
        rtol=1e-6,
    )


def test_normalizer_round_trip():
    norm = SpectrogramNormalizer(mode="instance")
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 2, 64, 100)).astype(np.float32)
    )
    normed, mean, std = norm(x, return_stats=True)
    back = norm.denormalize(normed, mean, std)
    assert np.max(np.abs(np.asarray(back) - np.asarray(x))) < 1e-5
    # normalized stats
    assert abs(float(jnp.mean(normed))) < 1e-3


@pytest.mark.skipif(not HAS_TORCH, reason="torch unavailable")
def test_normalizer_torch_std_parity():
    """Reference uses torch.std (unbiased); ours must match (ddof=1)."""
    x = np.random.default_rng(8).standard_normal((1, 1, 4, 50)).astype(np.float32)
    _, _, std = SpectrogramNormalizer()(jnp.asarray(x), return_stats=True)
    t_std = torch.from_numpy(x).std(dim=-1, keepdim=True) + 1e-8
    np.testing.assert_allclose(np.asarray(std), t_std.numpy(), rtol=1e-4)
