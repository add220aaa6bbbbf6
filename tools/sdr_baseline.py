"""SDR of a fresh-init or checkpointed model on the synthetic val tracks.

Measures Trainer.evaluate_sdr under the exact convergence-run
configuration, so the trained run's SDR curve has an "untrained" reference
point (and a final-checkpoint endpoint).

    python tools/sdr_baseline.py [--checkpoint runs/converge/ck --which best]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tfswa_tpu.config import Config
from tfswa_tpu.data.synthetic import SyntheticDataset
from tfswa_tpu.training.trainer import Trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint dir; omit for the untrained baseline")
    ap.add_argument("--which", default="best")
    args = ap.parse_args()
    cfg = Config()
    cfg.model.dtype = "bfloat16"
    cfg.model.remat = "tfswa_block"
    cfg.model.attention_impl = "pallas"
    cfg.data.batch_size = 2
    cfg.data.segment_seconds = 2.0
    cfg.data.num_workers = 0
    cfg.train.steps_per_epoch = 60
    cfg.train.checkpoint_dir = "/tmp/sdr_baseline_ck"
    cfg.train.log_dir = "/tmp/sdr_baseline_logs"

    # same datasets as cli.train --synthetic (cli/train.py:108-118)
    train_ds = SyntheticDataset(
        num_tracks=16, track_seconds=30.0,
        segment_seconds=cfg.data.segment_seconds,
        sample_rate=cfg.data.sample_rate,
    )
    val_ds = SyntheticDataset(
        num_tracks=4, track_seconds=30.0,
        segment_seconds=cfg.data.segment_seconds,
        sample_rate=cfg.data.sample_rate,
        random_segments=False, seed=999,
    )
    if args.checkpoint:
        cfg.train.checkpoint_dir = args.checkpoint
    trainer = Trainer(cfg, train_dataset=train_ds, val_dataset=val_ds)
    out = {"untrained": trainer.evaluate_sdr()}
    print(json.dumps(out), flush=True)
    if args.checkpoint:
        # same process: the separator stays compiled, only variables change
        trainer.load_checkpoint(args.which)
        out[f"{args.which}@step{trainer.global_step}"] = trainer.evaluate_sdr()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
