"""Training CLI (reference: scripts/train.py:23-299).

Config comes from one real config system (YAML + dotted overrides) instead of
40 loose argparse flags; the common reference flags are kept as shortcuts.

    python -m tfswa_tpu.cli.train --data_root /data/musdb18hq \
        --batch_size 4 --num_epochs 300 --set model.dtype=bfloat16
"""
from __future__ import annotations

import argparse
import dataclasses

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train TFSWA-UNet on TPU")
    p.add_argument("--config", type=str, default=None, help="YAML config path")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VAL",
                   help="dotted config override, e.g. model.dims=(32,64,128,256)")
    # reference-flag shortcuts (reference: scripts/train.py:23-121)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="train on the synthetic dataset (no MUSDB needed)")
    p.add_argument("--stems", type=str, default=None,
                   help="comma-separated, e.g. vocals,other")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--segment_seconds", type=float, default=None)
    p.add_argument("--n_fft", type=int, default=None)
    p.add_argument("--hop_length", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--num_epochs", type=int, default=None)
    p.add_argument("--use_checkpointing", action="store_true",
                   help="enable gradient rematerialization")
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    p.add_argument("--augment", action="store_true")
    p.add_argument("--mixup", action="store_true")
    p.add_argument("--use_mrstft", action="store_true")
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--log_dir", type=str, default=None)
    p.add_argument("--resume", type=str, default=None,
                   help="'latest', 'best', or epoch_NNNNNN")
    p.add_argument("--mesh", type=str, default=None,
                   help="data,model e.g. 4,2 (default: all devices on data)")
    p.add_argument("--multihost", action="store_true",
                   help="initialize JAX's multi-process runtime before any "
                        "device use (TPU pods auto-detect the cluster; use "
                        "--coordinator/--num_processes/--process_id off-pod)."
                        "  Each process then loads its own slice of every "
                        "global batch; process 0 writes checkpoints/logs.")
    p.add_argument("--coordinator", type=str, default=None,
                   help="host:port of process 0 (multi-host, off-pod only)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    return p


def config_from_args(args) -> "Config":
    from ..config import Config

    cfg = Config.from_yaml(args.config) if args.config else Config()

    overrides = list(args.set)
    if args.data_root is not None:
        overrides.append(f"data.musdb_root={args.data_root}")
    if args.stems is not None:
        overrides.append(f"data.stems=({args.stems})")
    if args.batch_size is not None:
        overrides.append(f"data.batch_size={args.batch_size}")
    if args.segment_seconds is not None:
        overrides.append(f"data.segment_seconds={args.segment_seconds}")
    if args.n_fft is not None:
        overrides.append(f"stft.n_fft={args.n_fft}")
    if args.hop_length is not None:
        overrides.append(f"stft.hop_length={args.hop_length}")
    if args.lr is not None:
        overrides.append(f"train.learning_rate={args.lr}")
    if args.num_epochs is not None:
        overrides.append(f"train.max_epochs={args.num_epochs}")
    if args.use_checkpointing:
        overrides.append("model.remat=true")
    if args.bf16:
        overrides.append("model.dtype=bfloat16")
    if args.augment:
        overrides.append("data.augment=true")
    if args.mixup:
        overrides.append("data.mixup=true")
    if args.use_mrstft:
        overrides.append("train.use_mrstft_loss=true")
    if args.checkpoint_dir is not None:
        overrides.append(f"train.checkpoint_dir={args.checkpoint_dir}")
    if args.log_dir is not None:
        overrides.append(f"train.log_dir={args.log_dir}")
    if args.seed is not None:
        overrides.append(f"train.seed={args.seed}")
    cfg = cfg.apply_overrides(overrides)

    # stems drive model output channels: 2 channels per stem
    # (reference: scripts/train.py:217-228)
    n_stems = len(cfg.data.stems)
    cfg = cfg.apply_overrides([
        f"model.out_channels={2 * n_stems}",
        "model.in_channels=4",
    ])
    return cfg


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)

    if args.multihost:
        # must run before any jax backend/device use (SURVEY.md section 5.8:
        # DCN-spanning meshes are this framework's own design territory)
        from ..parallel.distributed import initialize_distributed

        distributed = initialize_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        if distributed:
            import jax

            print(f"multihost: process {jax.process_index()}/"
                  f"{jax.process_count()}, "
                  f"{jax.local_device_count()} local / "
                  f"{jax.device_count()} global devices")

    from ..data.synthetic import SyntheticDataset
    from ..training.trainer import Trainer

    if args.synthetic or not cfg.data.musdb_root:
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
    else:
        from ..data.musdb import MUSDB18Dataset

        train_ds = MUSDB18Dataset(
            cfg.data.musdb_root, split="train", stems=cfg.data.stems,
            segment_seconds=cfg.data.segment_seconds,
            sample_rate=cfg.data.sample_rate, random_segments=True,
        )
        val_ds = MUSDB18Dataset(
            cfg.data.musdb_root, split="valid", stems=cfg.data.stems,
            segment_seconds=cfg.data.segment_seconds,
            sample_rate=cfg.data.sample_rate, random_segments=False,
            segment_overlap=cfg.data.segment_overlap,
            max_segments_per_track=cfg.data.max_segments_per_track,
        )

    mesh = None
    if args.mesh:
        from ..parallel import create_mesh

        d, m = (int(x) for x in args.mesh.split(","))
        mesh = create_mesh(shape=(d, m))
    elif args.multihost:
        # multihost implies a mesh: all global devices on the data axis
        import jax

        if jax.process_count() > 1 or jax.device_count() > 1:
            from ..parallel import create_mesh

            mesh = create_mesh()

    trainer = Trainer(cfg, train_ds, val_ds, mesh=mesh)
    if args.resume:
        trainer.load_checkpoint(args.resume)
    metrics = trainer.train()
    print({k: round(v, 5) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
