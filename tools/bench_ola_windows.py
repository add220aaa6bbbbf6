"""A/B the device-OLA window size (ola_bucket_seconds) on the headline
separation config: window K trades per-batch size and d2h overlap against
dispatch count through the dev tunnel.

    python tools/bench_ola_windows.py --buckets 60 121
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", type=float, nargs="+", default=[60.0, 121.0])
    ap.add_argument("--track_seconds", type=float, default=120.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tfswa_tpu.config import STFTConfig
    from tfswa_tpu.evaluation.inference import SourceSeparator
    from tfswa_tpu.models import TFSWAUNet
    from tfswa_tpu.ops.stft import STFTProcessor

    model = TFSWAUNet(
        in_channels=4, out_channels=4, dtype=jnp.bfloat16,
        attention_impl="pallas",
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 1025, 259), jnp.float32)
    )
    proc = STFTProcessor(STFTConfig(n_fft=2048, hop_length=512))

    sr = proc.sample_rate
    n = int(args.track_seconds * sr)
    t = np.arange(n) / sr
    audio = (
        0.3 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 440 * t)
        + 0.1 * np.random.default_rng(0).standard_normal(n)
    ).astype(np.float32)

    for bucket in args.buckets:
        sep = SourceSeparator(
            model, variables, proc,
            segment_length=10.0, overlap=0.25, mask_mode="trainer",
            stem_names=("vocals", "other"), segment_batch=8,
            transfer_dtype="float16", device_ola=True,
            ola_bucket_seconds=bucket,
        )
        sep.separate(audio)  # compile + warmup
        t0 = time.perf_counter()
        out = sep.separate(audio)
        dt = time.perf_counter() - t0
        assert all(np.isfinite(v).all() for v in out.values())
        print(
            f"bucket {bucket:6.1f}s  K={sep.ola_window_segments:3d}"
            f"  {args.track_seconds / dt:6.2f} audio-sec/sec"
            f"  ({dt:.2f} s)", flush=True,
        )


if __name__ == "__main__":
    main()
