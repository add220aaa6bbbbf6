"""Train-step throughput benchmark at the flagship config (TPU).

Measures steps/sec, audio-sec/sec and MFU of the full jitted train step
(STFT -> model fwd/bwd -> clip -> AdamW) in bf16 + remat — the numbers
VERDICT round 1 flagged as missing (the reference spends its life inside
trainer.py:120-257; our headline training metric must exist and be measured).

Timing: state chains through the loop (step t+1 consumes step t's state), and
we sync by fetching the final loss scalar — `block_until_ready` does not
actually sync through the axon tunnel.

    python tools/bench_train.py [--batch 4] [--steps 8] [--remat none]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tfswa_tpu.config import Config
from tfswa_tpu.ops.stft import STFTProcessor
from tfswa_tpu.training.train_state import create_train_state, make_train_step
from tfswa_tpu.utils.profiling import PEAK_FLOPS, detect_chip, flops_of


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=6.0)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--remat", default="tfswa_block",
                    choices=["none", "tfswa_block"])
    ap.add_argument("--attention_impl", default="pallas",
                    choices=["pallas", "xla"])
    args = ap.parse_args()

    cfg = Config()
    cfg.model.dtype = "bfloat16"
    cfg.model.remat = args.remat
    cfg.model.attention_impl = args.attention_impl
    cfg.data.segment_seconds = args.seconds
    cfg.train.use_mrstft = False

    sr = cfg.stft.sample_rate
    S = int(args.seconds * sr)
    B = args.batch
    proc = STFTProcessor(cfg.stft)
    F = cfg.stft.n_fft // 2 + 1
    T = S // cfg.stft.hop_length + 1

    rng = jax.random.PRNGKey(0)
    model, state = create_train_state(
        cfg, rng, (1, 4, F, T), steps_per_epoch=1000
    )
    train_step = jax.jit(make_train_step(
        model, proc, stems=("vocals", "other"),
        use_mrstft=cfg.train.use_mrstft,
    ))

    gen = np.random.default_rng(0)
    mixtures = jnp.asarray(gen.standard_normal((B, 2, S)), jnp.float32)
    targets = {
        "vocals": jnp.asarray(gen.standard_normal((B, 2, S)), jnp.float32),
        "other": jnp.asarray(gen.standard_normal((B, 2, S)), jnp.float32),
    }

    # compile + warmup
    state, loss = train_step(state, mixtures, targets)
    _ = float(loss["total_loss"])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, loss = train_step(state, mixtures, targets)
    _ = float(loss["total_loss"])          # host pull = real sync
    dt = (time.perf_counter() - t0) / args.steps

    flops = flops_of(
        lambda s, m, t: train_step(s, m, t)[1]["total_loss"],
        state, mixtures, targets,
    )
    peak = PEAK_FLOPS[detect_chip()]
    out = {
        "metric": "train_step",
        "config": f"B={B} {args.seconds}s bf16 remat={args.remat} "
                  f"attn={args.attention_impl}",
        "step_time_ms": round(dt * 1e3, 1),
        "steps_per_sec": round(1.0 / dt, 3),
        "audio_sec_per_sec": round(B * args.seconds / dt, 2),
        "mfu": round(flops / dt / peak, 4) if flops else None,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
