"""Quality-ceiling A/B (VERDICT round-2 #8): can the stack beat the
reference's mask ceiling?

Three training arms, identical data/steps/seed (the runs/converge recipe:
flagship 15.4M bf16+remat+Pallas, 16-track SyntheticDataset, B=2 x 2 s,
600 steps):

  parity   reference double-sigmoid trainer mask (caps masks to [0.5, 0.80])
  direct   train.train_mask_mode=direct — sigmoid head channels as [0, 1]
           magnitude masks (the documented fix)
  shift    parity mask + model.use_shift_mask=true (correct Swin masking)

Each arm trains via cli.train --synthetic (its own process: clean device
state), logging under runs/quality_ab/<arm>/; the in-training SDR eval uses
the convention each arm trained under.  Afterwards this script summarizes
the sdr/avg curves into runs/quality_ab/summary.json.

    python tools/quality_ab.py [--arms parity direct shift] [--epochs 10]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "runs", "quality_ab")

ARM_OVERRIDES = {
    "parity": [],
    "direct": ["train.train_mask_mode=direct"],
    "shift": ["model.use_shift_mask=true"],
}


def run_arm(arm: str, epochs: int) -> None:
    log_dir = os.path.join(OUT, arm)
    ck_dir = os.path.join(OUT, arm, "ck")
    os.makedirs(log_dir, exist_ok=True)
    cmd = [
        sys.executable, "-m", "tfswa_tpu.cli.train", "--synthetic",
        "--batch_size", "2", "--num_epochs", str(epochs),
        "--bf16", "--use_checkpointing",
        "--segment_seconds", "2.0",
        "--checkpoint_dir", ck_dir, "--log_dir", log_dir,
        "--set", "model.attention_impl=pallas",
        "--set", "train.steps_per_epoch=60",
        "--set", "data.num_workers=0",
        "--set", "train.log_every_n_steps=50",
    ]
    for ov in ARM_OVERRIDES[arm]:
        cmd += ["--set", ov]
    print(f"=== arm {arm}: {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)


def summarize(arms) -> dict:
    summary = {}
    for arm in arms:
        path = os.path.join(OUT, arm, "metrics.jsonl")
        if not os.path.exists(path):
            continue
        sdr_points, val_points = [], []
        with open(path) as fh:
            for line in fh:
                rec = json.loads(line)
                if "sdr/avg" in rec:
                    sdr_points.append(
                        {k: rec[k] for k in rec if k.startswith(("sdr", "si_sdr", "step"))}
                    )
                if "val/total_loss" in rec:
                    val_points.append(
                        {"step": rec["step"], "val_loss": rec["val/total_loss"]}
                    )
        summary[arm] = {
            "sdr_curve": sdr_points,
            "val_curve": val_points,
            "best_sdr_avg": max(
                (p["sdr/avg"] for p in sdr_points), default=None
            ),
            "final_val_loss": val_points[-1]["val_loss"] if val_points else None,
        }
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", nargs="+", default=["parity", "direct", "shift"])
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--summarize-only", action="store_true")
    args = ap.parse_args()

    if not args.summarize_only:
        for arm in args.arms:
            run_arm(arm, args.epochs)

    summary = summarize(args.arms)
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    for arm, s in summary.items():
        print(f"{arm:8s} best sdr/avg {s['best_sdr_avg']}  "
              f"final val loss {s['final_val_loss']}")


if __name__ == "__main__":
    main()
