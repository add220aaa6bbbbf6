"""Per-component timing of the separation pipeline on TPU.

Breaks one (B, 10 s) segment batch into: STFT, model forward, masking+ISTFT,
and host transfer, to locate the next optimization target.

    python tools/bench_pipeline.py [--batch 4] [--precision highest]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fetch(x):
    # axon quirk: complex64 and single-element transfers are UNIMPLEMENTED;
    # reduce to an f32 scalar on device instead.
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(jnp.abs(leaf)))


def timeit(fn, *args, iters=4):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--attention", default="pallas")
    args = ap.parse_args()

    from tfswa_tpu.config import STFTConfig
    from tfswa_tpu.models import TFSWAUNet
    from tfswa_tpu.ops.masking import trainer_masked_complex
    from tfswa_tpu.ops.stft import STFTProcessor

    B = args.batch
    sr = 44100
    S = int(args.seconds * sr)
    proc = STFTProcessor(STFTConfig(n_fft=2048, hop_length=512))
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((B, 2, S)), jnp.float32)

    stft_fn = jax.jit(proc.stft)
    spec = stft_fn(wav)
    print(f"spec shape {spec.shape}")
    t_stft = timeit(stft_fn, wav)
    print(f"stft      : {t_stft*1e3:8.1f} ms")

    model = TFSWAUNet(in_channels=4, out_channels=4, dtype=jnp.bfloat16,
                      attention_impl=args.attention)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4, spec.shape[2], spec.shape[3])))
    fwd = jax.jit(lambda s: model.apply(
        variables, proc.to_model_input(s), train=False))
    t_fwd = timeit(fwd, spec)
    print(f"forward   : {t_fwd*1e3:8.1f} ms")

    out = fwd(spec)

    def mask_istft(out, spec):
        mono = jnp.mean(spec, axis=1)
        masked = trainer_masked_complex(out, jnp.abs(mono), jnp.angle(mono), 2)
        return proc.istft(masked, length=S)

    mi = jax.jit(mask_istft)
    t_mi = timeit(mi, out, spec)
    print(f"mask+istft: {t_mi*1e3:8.1f} ms")

    audio = mi(out, spec)

    t0 = time.perf_counter()
    for _ in range(4):
        np.asarray(audio)
    t_xfer = (time.perf_counter() - t0) / 4
    print(f"d2h xfer  : {t_xfer*1e3:8.1f} ms ({audio.size*4/1e6:.0f} MB)")

    total = t_stft + t_fwd + t_mi + t_xfer
    audio_sec = B * args.seconds
    print(f"total     : {total*1e3:8.1f} ms -> {audio_sec/total:.1f} audio-sec/sec")


if __name__ == "__main__":
    main()
