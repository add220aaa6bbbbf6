"""Headline benchmark: full-track separation throughput on one chip.

Measures audio-seconds separated per wall-clock second (the BASELINE.json
metric) using the flagship 15.4M-param TFSWA-UNet in the trainer mask
convention: 10 s segments, 25% overlap Hann OLA, n_fft 2048 / hop 512 —
the reference SourceSeparator pipeline (reference: inference.py:31-58) with
the trainer's mask semantics (reference: trainer.py:415-436).

Baseline: the reference paper separates 30 s of audio in 1.25 s on
2x RTX 3090 => 24 audio-sec/sec (BASELINE.md "Paper inference time").
vs_baseline = ours / 24.

Prints ONE JSON line.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_AUDIO_SEC_PER_SEC = 24.0  # paper: 30 s / 1.25 s on 2x RTX 3090


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tfswa_tpu.config import STFTConfig
    from tfswa_tpu.evaluation.inference import SourceSeparator
    from tfswa_tpu.models import TFSWAUNet
    from tfswa_tpu.ops.stft import STFTProcessor

    # Flagship config: stereo-complex in, 2 stems out, bf16 compute on MXU,
    # fused Pallas attention (6-7x the chunked-XLA path at full resolution,
    # tools/bench_attention.py).
    model = TFSWAUNet(
        in_channels=4, out_channels=4, dtype=jnp.bfloat16,
        attention_impl="pallas",
    )
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 4, 1025, 259), jnp.float32))

    proc = STFTProcessor(STFTConfig(n_fft=2048, hop_length=512))
    separator = SourceSeparator(
        model, variables, proc,
        segment_length=10.0, overlap=0.25, mask_mode="trainer",
        stem_names=("vocals", "other"), segment_batch=8,
        transfer_dtype="float16",   # halve audio IO on the slow dev tunnel
        device_ola=True,            # pipelined windowed OLA: one h2d, d2h
                                    # of window k rides under window k+1's
                                    # compute (measured A/B in
                                    # tools/bench_ola_windows.py: 60 s
                                    # windows, K=8 segments at batch 8)
        ola_bucket_seconds=60.0,
    )

    track_seconds = 120.0
    sr = proc.sample_rate
    n = int(track_seconds * sr)
    t = np.arange(n) / sr
    audio = (
        0.3 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 440 * t)
        + 0.1 * np.random.default_rng(0).standard_normal(n)
    ).astype(np.float32)

    # warmup (compile) — same length as the timed run: device-OLA compiles
    # per track-length bucket
    separator.separate(audio)

    t0 = time.perf_counter()
    out = separator.separate(audio)
    elapsed = time.perf_counter() - t0
    assert all(np.isfinite(v).all() for v in out.values())

    value = track_seconds / elapsed
    print(json.dumps({
        "metric": "separation_throughput",
        "value": round(value, 2),
        "unit": "audio_sec_per_sec_per_chip",
        "vs_baseline": round(value / BASELINE_AUDIO_SEC_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
