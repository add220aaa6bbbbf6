"""Attribute the train-step time: STFT glue vs forward vs backward vs
optimizer (VERDICT round-2 weak #2: ~2 s/step was unprofiled glue).

Times five jitted variants of the flagship train step at B=4 x 6 s
(bf16 + remat), each a strict subset of the full pipeline:

  pre     STFT of mixture + targets, mono mags, model input (no model)
  fwd     pre + model forward + mask + loss                  (no grad)
  fwdbwd  fwd + jax.grad                                     (no optimizer)
  opt     clip + AdamW update alone, on captured gradients   (no model)
  full    the production make_train_step

Differences attribute time: STFT glue = pre, backward = fwdbwd - fwd,
optimizer+dispatch = full - fwdbwd.  Timing chains state/outputs and syncs
by fetching an f32 scalar (block_until_ready does not sync the tunnel).

    python tools/bench_train_ablate.py [--batch 4] [--seconds 6]
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
from tfswa_tpu.ops.masking import apply_trainer_masks
from tfswa_tpu.ops.stft import STFTProcessor
from tfswa_tpu.training.losses import source_separation_loss
from tfswa_tpu.training.train_state import create_train_state, make_train_step

STEMS = ("vocals", "other")


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(jnp.abs(leaf).astype(jnp.float32)))


def timeit(fn, *args, iters=6):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=6.0)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--chunk-sweep", type=str, default=None,
                    help="comma-separated TFSWA_CHUNK_MB budgets: time the "
                         "fwdbwd variant at each in-flight prob-plane budget "
                         "and exit (re-sweeps the round-2 32 MB optimum "
                         "after the dense/paired layout changes)")
    ap.add_argument("--no-remat", action="store_true",
                    help="store block inputs instead of nn.remat: the fused "
                         "kernel's custom VJP already recomputes internally, "
                         "so nn.remat buys only the glue between blocks")
    ap.add_argument("--freq_policy", default="full",
                    help="'crop_pow2' drops the Nyquist row (1025 -> 1024 "
                         "bins) like train.freq_policy")
    args = ap.parse_args()

    cfg = Config()
    cfg.model.dtype = "bfloat16"
    cfg.model.remat = not args.no_remat
    cfg.model.attention_impl = "pallas"
    cfg.data.segment_seconds = args.seconds
    cfg.train.use_mrstft = False

    sr = cfg.stft.sample_rate
    S = int(args.seconds * sr)
    B = args.batch
    proc = STFTProcessor(cfg.stft)
    F = cfg.stft.n_fft // 2 + 1
    T = S // cfg.stft.hop_length + 1

    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), (1, 4, F, T), steps_per_epoch=1000
    )

    gen = np.random.default_rng(0)
    mixtures = jnp.asarray(gen.standard_normal((B, 2, S)), jnp.float32)
    targets = {
        k: jnp.asarray(gen.standard_normal((B, 2, S)), jnp.float32)
        for k in STEMS
    }

    def preprocess(mixtures, targets):
        from tfswa_tpu.training.train_state import _crop_nyquist

        mixture_spec = proc.stft(mixtures)
        if args.freq_policy == "crop_pow2":
            mixture_spec = _crop_nyquist(mixture_spec)
        mono = jnp.mean(mixture_spec, axis=1)
        mixture_mag = jnp.abs(mono)
        target_mags = {
            k: jnp.abs(jnp.mean(proc.stft(v), axis=1))
            for k, v in targets.items()
        }
        if args.freq_policy == "crop_pow2":
            target_mags = {k: _crop_nyquist(v) for k, v in target_mags.items()}
        return proc.to_model_input(mixture_spec), mixture_mag, target_mags

    def loss_value(params, batch_stats, mixtures, targets):
        model_input, mixture_mag, target_mags = preprocess(mixtures, targets)
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            model_input, train=True, mutable=["batch_stats"],
        )
        pred = apply_trainer_masks(out, mixture_mag, len(STEMS))
        pred_mags = {k: pred[:, i] for i, k in enumerate(STEMS)}
        return source_separation_loss(
            pred_mags, target_mags, use_mrstft=False
        )["total_loss"]

    if args.chunk_sweep:
        # Each budget is read at trace time (_chunk_target_bytes), so a
        # fresh jit wrapper per value retraces with the new chunk sizes.
        sweep = {}
        for mb in args.chunk_sweep.split(","):
            os.environ["TFSWA_CHUNK_MB"] = mb
            f = jax.jit(jax.grad(loss_value))
            t = timeit(f, state.params, state.batch_stats, mixtures,
                       targets, iters=args.iters)
            sweep[mb] = round(t * 1e3, 1)
            print(f"fwdbwd @ {mb:>4} MB  {t * 1e3:8.1f} ms", flush=True)
        print(json.dumps({"chunk_sweep_fwdbwd_ms": sweep,
                          "device": str(jax.devices()[0])}))
        return

    jit_pre = jax.jit(preprocess)
    jit_fwd = jax.jit(loss_value)
    jit_fwdbwd = jax.jit(jax.grad(loss_value))

    def opt_update(state, grads):
        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params
        )
        return jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        ), new_opt_state

    jit_opt = jax.jit(opt_update)
    jit_full = jax.jit(make_train_step(model, proc, stems=STEMS))

    results = {}
    t = timeit(jit_pre, mixtures, targets, iters=args.iters)
    results["pre_ms"] = round(t * 1e3, 1)
    print(f"pre     {t * 1e3:8.1f} ms", flush=True)

    t = timeit(jit_fwd, state.params, state.batch_stats, mixtures, targets,
               iters=args.iters)
    results["fwd_ms"] = round(t * 1e3, 1)
    print(f"fwd     {t * 1e3:8.1f} ms", flush=True)

    grads = jit_fwdbwd(state.params, state.batch_stats, mixtures, targets)
    t = timeit(jit_fwdbwd, state.params, state.batch_stats, mixtures, targets,
               iters=args.iters)
    results["fwdbwd_ms"] = round(t * 1e3, 1)
    print(f"fwdbwd  {t * 1e3:8.1f} ms", flush=True)

    t = timeit(jit_opt, state, grads, iters=args.iters)
    results["opt_ms"] = round(t * 1e3, 1)
    print(f"opt     {t * 1e3:8.1f} ms", flush=True)

    t = timeit(jit_full, state, mixtures, targets, iters=args.iters)
    results["full_ms"] = round(t * 1e3, 1)
    print(f"full    {t * 1e3:8.1f} ms", flush=True)

    results["backward_ms"] = round(results["fwdbwd_ms"] - results["fwd_ms"], 1)
    results["residual_ms"] = round(
        results["full_ms"] - results["fwdbwd_ms"], 1
    )
    results["device"] = str(jax.devices()[0])
    results["config"] = (
        f"B={B} {args.seconds}s bf16 "
        f"{'remat' if cfg.model.remat else 'no-remat'} pallas"
    )

    # Full-MUSDB wall-clock projection (VERDICT round-3 #2): 100 train
    # tracks x ~3.5 min, random-offset segments -> ~860 steps/epoch at
    # batch 4, the reference recipe's 300 epochs
    # (reference: scripts/train.py:64, PROJECT_SUMMARY.md:303 <48 h A100).
    steps_per_epoch = 860 * 4 // B
    proj_h = results["full_ms"] / 1e3 * steps_per_epoch * 300 / 3600
    results["musdb_300ep_proj_hours"] = round(proj_h, 1)
    print(f"projected full-MUSDB training (300 epochs, "
          f"{steps_per_epoch} steps/epoch at B={B}): {proj_h:.1f} h "
          f"on one chip (reference target: <48 h on A100)")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
