"""Sweep the device-OLA serving geometry on the headline separation config:
window size (ola_bucket_seconds), segment length, segment batch and the
transfer codec all trade per-batch MXU efficiency, OLA overlap redundancy
and (dev-tunnel) transfer exposure against each other.

    python tools/bench_ola_windows.py --buckets 60 121
    python tools/bench_ola_windows.py --buckets 30 60 --segment_lengths 6 10 \
        --dtypes float16 int16 --repeats 2
"""
from __future__ import annotations

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", type=float, nargs="+", default=[60.0])
    ap.add_argument("--segment_lengths", type=float, nargs="+", default=[10.0])
    ap.add_argument("--batches", type=int, nargs="+", default=[8])
    ap.add_argument("--dtypes", nargs="+", default=["float16"])
    ap.add_argument("--overlaps", type=float, nargs="+", default=[0.25])
    ap.add_argument("--freq_policy", default="full")
    ap.add_argument("--stft_precision", default="highest")
    ap.add_argument("--track_seconds", type=float, default=120.0)
    ap.add_argument("--repeats", type=int, default=1)
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
    proc = STFTProcessor(STFTConfig(n_fft=2048, hop_length=512,
                                    precision=args.stft_precision))

    sr = proc.sample_rate
    n = int(args.track_seconds * sr)
    t = np.arange(n) / sr
    audio = (
        0.3 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 440 * t)
        + 0.1 * np.random.default_rng(0).standard_normal(n)
    ).astype(np.float32)

    best = None
    for bucket, seg_len, bs, dt_name, ov in itertools.product(
        args.buckets, args.segment_lengths, args.batches, args.dtypes,
        args.overlaps,
    ):
        sep = SourceSeparator(
            model, variables, proc,
            segment_length=seg_len, overlap=ov, mask_mode="trainer",
            stem_names=("vocals", "other"), segment_batch=bs,
            transfer_dtype=dt_name, device_ola=True,
            ola_bucket_seconds=bucket, freq_policy=args.freq_policy,
        )
        sep.separate(audio)  # compile + warmup
        rate = 0.0
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = sep.separate(audio)
            dt = time.perf_counter() - t0
            rate = max(rate, args.track_seconds / dt)
        assert all(np.isfinite(v).all() for v in out.values())
        print(
            f"bucket {bucket:6.1f}s seg {seg_len:4.1f}s ov {ov:.2f} bs {bs:2d}"
            f" {dt_name:>7}  K={sep.ola_window_segments:3d}"
            f"  {rate:6.2f} audio-sec/sec", flush=True,
        )
        if best is None or rate > best[0]:
            best = (rate, bucket, seg_len, bs, dt_name, ov)
    if best:
        print(f"best: {best[0]:.2f} as/s at bucket={best[1]} seg={best[2]}"
              f" bs={best[3]} dtype={best[4]} overlap={best[5]}")


if __name__ == "__main__":
    main()
