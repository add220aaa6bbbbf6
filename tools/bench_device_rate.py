"""Pure DEVICE throughput of the headline separation pipeline.

The headline bench (bench.py) measures wall time through the dev tunnel,
which serializes transfers/dispatch with compute (~440 ms/window of
overhead that locally-attached TPUs do not pay — BENCH.md round 4).
This tool measures the device-only rate by CHAINING M identical OLA
window executions on device-resident input (output k feeds a trivial
mix into input k+1, so the device runs windows back-to-back with no
host round-trips; block_until_ready does not sync through the tunnel,
so chaining + a final fetch is the only sound timing method here).

    python tools/bench_device_rate.py [--windows 6] [--repeats 2]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=6)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--stft_precision", default="highest")
    ap.add_argument("--freq_policy", default="full")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tfswa_tpu.config import STFTConfig
    from tfswa_tpu.evaluation.inference import SourceSeparator
    from tfswa_tpu.models import TFSWAUNet
    from tfswa_tpu.ops.stft import STFTProcessor

    model = TFSWAUNet(in_channels=4, out_channels=4, dtype=jnp.bfloat16,
                      attention_impl="pallas")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 1025, 259), jnp.float32))
    proc = STFTProcessor(STFTConfig(n_fft=2048, hop_length=512,
                                    precision=args.stft_precision))
    sep = SourceSeparator(
        model, variables, proc, segment_length=10.0, overlap=0.25,
        mask_mode="trainer", stem_names=("vocals", "other"),
        segment_batch=8, transfer_dtype="float16", device_ola=True,
        ola_bucket_seconds=60.0, freq_policy=args.freq_policy,
    )
    K, seg, hop = sep.ola_window_segments, sep.segment_samples, sep.hop_samples
    W = (K - 1) * hop + seg
    audio_per_window = K * hop / sep.sample_rate  # new audio per window step

    rng = np.random.default_rng(0)
    win_host = sep._encode_host(
        rng.standard_normal(W).astype(np.float32) * 0.3)
    win = jnp.asarray(win_host)
    nv = jnp.asarray([K], jnp.int32)

    # chain: window output (stems, W) in the transfer dtype feeds a
    # zero-weighted mix back into the next window's input — a pure data
    # dependency, numerically the original input
    @jax.jit
    def chain(acc, w):
        return (w.astype(jnp.float32)
                + 0.0 * acc[0].astype(jnp.float32)).astype(w.dtype)

    def run_chain(m: int) -> float:
        cur = win
        t0 = time.perf_counter()
        for _ in range(m):
            acc = sep._jit_device_ola(sep.variables, cur, nv)
            cur = chain(acc, win)
        # fetch a small slice to force completion (single-element d2h is
        # UNIMPLEMENTED through the tunnel)
        np.asarray(cur[:8])
        return time.perf_counter() - t0

    run_chain(1)  # compile both programs
    best = None
    for _ in range(args.repeats):
        t1 = run_chain(1)
        tm = run_chain(args.windows)
        # per-window marginal device time: the chain shares one h2d and
        # one tiny fetch, so (tM - t1) / (M - 1) isolates pure device
        # pipeline time per window
        per_win = (tm - t1) / (args.windows - 1)
        rate = audio_per_window / per_win
        print(f"t1 {t1:.3f}s  t{args.windows} {tm:.3f}s  "
              f"-> {per_win*1e3:.0f} ms/window = {rate:.2f} audio-sec/sec "
              f"device-only", flush=True)
        best = max(best or 0.0, rate)
    print(json.dumps({
        "metric": "device_only_separation_rate",
        "value": round(best, 2),
        "unit": "audio_sec_per_sec_per_chip",
        "vs_baseline": round(best / 24.0, 3),
        "note": "marginal per-window device time via on-device chaining; "
                "excludes tunnel dispatch/transfer overhead",
    }))


if __name__ == "__main__":
    main()
