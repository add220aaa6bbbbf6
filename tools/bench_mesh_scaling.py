"""Multi-chip scaling instrument: measured per-device work + collective
traffic of the sharded serving and training paths at dp = 1/2/4/8.

The single-chip bf16 forward is at its measured VMEM byte floor (BENCH.md
round 4), so every further headline gain routes through the mesh.  This
tool turns that from an assertion into an artifact: on the 8-virtual-CPU
mesh it compiles (and optionally executes) the FLAGSHIP 15.4M-param model's
sharded separator forward and train step at each dp, extracts per-device
FLOPs from ``compiled.cost_analysis()`` and collective bytes from the
partitioned HLO, asserts

  - the serving forward is COLLECTIVE-FREE (embarrassingly parallel over
    segments — each chip separates its own batch shard), and
  - per-device work scales ~1/d for both paths,

and emits a projected audio-sec/sec-vs-chips table from the measured
single-chip device rate (tools/bench_device_rate.py) plus the measured
gradient all-reduce payload.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
          python tools/bench_mesh_scaling.py [--execute] [--json out.json]

(The reference is single-GPU only — reference: trainer.py:104,
scripts/train.py:110; SURVEY.md section 2.7 scopes this as the rebuild's
own first-class territory.)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# Measured single-chip anchors (BENCH.md round 4, v5e-1):
DEVICE_ONLY_AS_PER_SEC = 24.21       # chained-window device rate, serving cfg
TRAIN_STEP_SECONDS = 3.148           # B=4 x 5.938 s crop_pow2 full step
TRAIN_STEP_AUDIO_SECONDS = 4 * 5.938
MUSDB_TRAIN_HOURS_1CHIP = 225.6      # projected 300-epoch full MUSDB run
BASELINE_AS_PER_SEC = 24.0           # reference paper bar (BASELINE.md)
# v5e ICI: ~4.5e10 B/s effective per direction is a conservative public
# figure (v5e "How to Scale Your Model" book's 1D ring numbers); the
# projection below also reports a 10x-worse bound to show the conclusion
# does not hinge on it.
ICI_BYTES_PER_SEC = 4.5e10


def build_flagship(segment_seconds: float, batch: int, mesh):
    """Flagship 15.4M model + sharded separator jit at a small segment.

    Segment length does not change the dp-scaling ratios or the gradient
    payload (those depend on batch partitioning and parameter count), so a
    CPU-tractable segment measures the same structure the TPU runs at 10 s.
    """
    from tfswa_tpu.config import STFTConfig
    from tfswa_tpu.evaluation.inference import SourceSeparator
    from tfswa_tpu.models import TFSWAUNet
    from tfswa_tpu.ops.stft import STFTProcessor

    model = TFSWAUNet(in_channels=4, out_channels=4)  # 15.4M flagship
    proc = STFTProcessor(STFTConfig(n_fft=2048, hop_length=512))
    F = 2048 // 2 + 1
    T = int(segment_seconds * 44100) // 512 + 1
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, F, T), jnp.float32)
    )
    sep = SourceSeparator(
        model, variables, proc,
        segment_length=segment_seconds, overlap=0.25, mask_mode="trainer",
        segment_batch=batch, mesh=mesh,
    )
    return model, proc, sep


def analyze_serving(dp: int, segment_seconds: float, batch: int,
                    execute: bool) -> dict:
    from tfswa_tpu.parallel import analyze_jitted, create_mesh

    mesh = create_mesh(shape=(dp, 1), devices=jax.devices()[:dp])
    model, proc, sep = build_flagship(segment_seconds, batch, mesh)
    S = sep.segment_samples
    block = jnp.zeros((batch, S), sep.transfer_dtype)
    flops, coll, compiled = analyze_jitted(
        sep._jit_separate, sep.variables, block)
    out = {
        "dp": dp,
        "per_device_flops": flops,
        "collective_count": coll.total_count,
        "collective_bytes": coll.total_bytes,
        "collectives": dict(coll.counts),
    }
    if execute:
        t0 = time.perf_counter()
        np.asarray(sep._jit_separate(sep.variables, block))
        out["exec_seconds"] = round(time.perf_counter() - t0, 3)
    return out


def analyze_train(dp: int, segment_seconds: float, batch: int,
                  execute: bool) -> dict:
    from tfswa_tpu.config import Config, ModelConfig, STFTConfig
    from tfswa_tpu.ops.stft import STFTProcessor
    from tfswa_tpu.parallel import analyze_jitted, create_mesh, shard_batch
    from tfswa_tpu.training import create_train_state, make_sharded_train_step

    mesh = create_mesh(shape=(dp, 1), devices=jax.devices()[:dp])
    cfg = Config(
        model=ModelConfig(in_channels=4, out_channels=4),
        stft=STFTConfig(n_fft=2048, hop_length=512),
    )
    proc = STFTProcessor(cfg.stft)
    samples = int(segment_seconds * 44100)
    F = cfg.stft.n_fft // 2 + 1
    T = samples // cfg.stft.hop_length + 1
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), (1, 4, F, T), steps_per_epoch=10,
        mesh=mesh,
    )
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(state.params)
    )
    stems = ("vocals", "other")
    rng = np.random.default_rng(0)
    mixtures = shard_batch(
        jnp.asarray(rng.standard_normal((batch, 2, samples)), jnp.float32),
        mesh,
    )
    targets = {
        s: shard_batch(
            jnp.asarray(
                rng.standard_normal((batch, 2, samples)), jnp.float32),
            mesh,
        )
        for s in stems
    }
    step = jax.jit(make_sharded_train_step(model, proc, stems, mesh))
    flops, coll, compiled = analyze_jitted(step, state, mixtures, targets)
    out = {
        "dp": dp,
        "per_device_flops": flops,
        "collective_count": coll.total_count,
        "collective_bytes": coll.total_bytes,
        "collectives": dict(coll.counts),
        "n_params": n_params,
    }
    if execute:
        t0 = time.perf_counter()
        _, loss = step(state, mixtures, targets)
        float(loss["total_loss"])
        out["exec_seconds"] = round(time.perf_counter() - t0, 3)
    return out


def project(serving_rows, train_rows) -> dict:
    """Projected throughput vs chips from the measured single-chip anchors
    + the measured collective payloads."""
    from tfswa_tpu.parallel import ring_all_reduce_link_bytes

    n_params = train_rows[-1]["n_params"]
    grad_bytes = 4 * n_params  # f32 gradient all-reduce payload
    table = []
    for d in (1, 2, 4, 8, 16):
        # serving: forward verified collective-free -> linear in chips
        serve = DEVICE_ONLY_AS_PER_SEC * d
        # training: compute splits 1/d; the gradient ring all-reduce is the
        # only cross-chip traffic (measured in the dp HLO)
        link_bytes = ring_all_reduce_link_bytes(grad_bytes, d)
        ar_s = link_bytes / ICI_BYTES_PER_SEC
        ar_s_slow = link_bytes / (ICI_BYTES_PER_SEC / 10)
        step_s = TRAIN_STEP_SECONDS / d + ar_s
        step_slow = TRAIN_STEP_SECONDS / d + ar_s_slow
        table.append({
            "chips": d,
            "serving_as_per_sec": round(serve, 2),
            "serving_vs_baseline": round(serve / BASELINE_AS_PER_SEC, 3),
            "train_step_s": round(step_s, 4),
            "train_step_s_ici_div10": round(step_slow, 4),
            "train_scaling_eff": round(
                (TRAIN_STEP_SECONDS / d) / step_s, 4),
            "musdb_300ep_hours": round(
                MUSDB_TRAIN_HOURS_1CHIP / d
                * (step_s / (TRAIN_STEP_SECONDS / d)), 1),
        })
    return {
        "anchors": {
            "device_only_as_per_sec_1chip": DEVICE_ONLY_AS_PER_SEC,
            "train_step_seconds_1chip": TRAIN_STEP_SECONDS,
            "musdb_300ep_hours_1chip": MUSDB_TRAIN_HOURS_1CHIP,
            "ici_bytes_per_sec_assumed": ICI_BYTES_PER_SEC,
            "grad_allreduce_payload_bytes": grad_bytes,
        },
        "projection": table,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--execute", action="store_true",
                   help="also run one real call per dp (slower on CPU)")
    p.add_argument("--serve_seconds", type=float, default=1.0)
    p.add_argument("--train_seconds", type=float, default=0.5)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--json", type=str, default=None)
    p.add_argument("--dps", type=str, default="1,2,4,8")
    args = p.parse_args()

    dps = [int(x) for x in args.dps.split(",")]
    result = {"serving": [], "train": []}

    for dp in dps:
        row = analyze_serving(dp, args.serve_seconds, args.batch, args.execute)
        result["serving"].append(row)
        print(f"[serving dp={dp}] per-device GFLOPs="
              f"{row['per_device_flops']/1e9:.2f} "
              f"collectives={row['collective_count']} "
              f"({row['collective_bytes']} B)"
              + (f" exec={row.get('exec_seconds')}s"
                 if args.execute else ""),
              flush=True)

    for dp in dps:
        row = analyze_train(dp, args.train_seconds, args.batch, args.execute)
        result["train"].append(row)
        print(f"[train   dp={dp}] per-device GFLOPs="
              f"{row['per_device_flops']/1e9:.2f} "
              f"collectives={row['collective_count']} "
              f"({row['collective_bytes']/1e6:.1f} MB)"
              + (f" exec={row.get('exec_seconds')}s"
                 if args.execute else ""),
              flush=True)

    # ------------------------------------------------------------- verdicts
    s0 = result["serving"][0]["per_device_flops"]
    for row in result["serving"]:
        assert row["collective_count"] == 0, (
            f"serving forward at dp={row['dp']} is NOT collective-free: "
            f"{row['collectives']}"
        )
        ratio = row["per_device_flops"] / s0
        expect = 1.0 / row["dp"]
        assert abs(ratio - expect) / expect < 0.05, (
            f"serving per-device work at dp={row['dp']}: {ratio:.3f} of "
            f"dp=1, expected ~{expect:.3f}"
        )
    t0_flops = result["train"][0]["per_device_flops"]
    for row in result["train"]:
        # fraction of per-device work eliminated vs ideal 1-1/d (robust to
        # the dp-independent replicated-optimizer term)
        eliminated = (t0_flops - row["per_device_flops"]) / t0_flops
        ideal = 1.0 - 1.0 / row["dp"]
        assert eliminated >= 0.9 * ideal, (
            f"train per-device work at dp={row['dp']}: only "
            f"{eliminated:.3f} eliminated (ideal {ideal:.3f})"
        )
        assert row["collective_count"] >= 1 or row["dp"] == 1
    print("VERDICT: serving forward collective-free at every dp; "
          "per-device work scales ~1/d on both paths.")

    result.update(project(result["serving"], result["train"]))
    print("\nProjected throughput vs chips "
          "(anchored on measured single-chip rates):")
    print(f"{'chips':>5} {'serving as/s':>13} {'vs bar':>7} "
          f"{'train step s':>13} {'scaling eff':>12} {'MUSDB 300ep h':>14}")
    for r in result["projection"]:
        print(f"{r['chips']:>5} {r['serving_as_per_sec']:>13} "
              f"{r['serving_vs_baseline']:>7} {r['train_step_s']:>13} "
              f"{r['train_scaling_eff']:>12} {r['musdb_300ep_hours']:>14}")

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(result, fh, indent=2)
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
