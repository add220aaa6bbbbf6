"""Offline SDR eval of a quality-A/B arm checkpoint.

Rebuilds the arm's Trainer (same synthetic val split as cli.train
--synthetic), restores the requested checkpoint(s), and runs the identical
in-training SDR eval (Trainer.evaluate_sdr) — used to recover the `shift`
arm's SDR curve after its in-run evals failed on the dev tunnel's
remote-compile size limit (HTTP 413, fixed by the device-side Swin mask).

    python tools/eval_ab_checkpoint.py --arm shift \
        --checkpoints epoch_000001 epoch_000005 --out shift/offline_sdr.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AB = os.path.join(REPO, "runs", "quality_ab")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", required=True)
    ap.add_argument("--checkpoints", nargs="+", default=["latest"])
    ap.add_argument("--out", default=None,
                    help="output JSON path relative to the arm dir")
    args = ap.parse_args()

    from tfswa_tpu.config import Config
    from tfswa_tpu.data.synthetic import SyntheticDataset
    from tfswa_tpu.training.trainer import Trainer

    arm_dir = os.path.join(AB, args.arm)
    ck_dir = os.path.join(arm_dir, "ck")
    with open(os.path.join(ck_dir, "config.json")) as fh:
        cfg = Config.from_dict(json.load(fh))
    cfg.train.checkpoint_dir = ck_dir
    cfg.train.log_dir = os.path.join(arm_dir, "offline_eval_logs")

    train_ds = SyntheticDataset(
        num_tracks=16, track_seconds=30.0,
        segment_seconds=cfg.data.segment_seconds,
        sample_rate=cfg.data.sample_rate, stems=cfg.data.stems,
    )
    val_ds = SyntheticDataset(
        num_tracks=4, track_seconds=30.0,
        segment_seconds=cfg.data.segment_seconds,
        sample_rate=cfg.data.sample_rate, stems=cfg.data.stems,
        random_segments=False, seed=999,
    )
    trainer = Trainer(cfg, train_ds, val_ds)

    results = {}
    for name in args.checkpoints:
        trainer.load_checkpoint(name)
        metrics = trainer.evaluate_sdr()
        metrics["global_step"] = trainer.global_step
        results[name] = metrics
        print(name, json.dumps(metrics), flush=True)

    out = args.out or "offline_sdr.json"
    out_path = os.path.join(arm_dir, out)
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
