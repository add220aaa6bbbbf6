"""Separation CLI: separate audio files into stems.

    python -m tfswa_tpu.cli.separate --checkpoint ckpts/ song.wav -o out/
(reference capability: SourceSeparator.separate_file + BatchSeparator,
inference.py:239-297,367-425 — the reference has no CLI for this.)
"""
from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Separate audio into stems")
    p.add_argument("inputs", nargs="+", help="input audio files")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("-o", "--output_dir", type=str, default="separated")
    p.add_argument("--stems", type=str, default="vocals,other")
    p.add_argument("--segment_seconds", type=float, default=10.0)
    p.add_argument("--overlap", type=float, default=0.25)
    p.add_argument("--mask_mode", type=str, default="trainer",
                   choices=["trainer", "direct"])
    args = p.parse_args(argv)

    from ..config import EvalConfig
    from ..evaluation import BatchSeparator, load_separator_from_checkpoint

    separator = load_separator_from_checkpoint(
        args.checkpoint,
        eval_config=EvalConfig(
            segment_seconds=args.segment_seconds,
            overlap=args.overlap,
            mask_mode=args.mask_mode,
        ),
        stem_names=tuple(args.stems.split(",")),
    )
    results = BatchSeparator(separator).separate_files(args.inputs, args.output_dir)
    for path, res in results.items():
        status = res["status"]
        extra = res.get("outputs", res.get("error"))
        print(f"{path}: {status} {extra}")


if __name__ == "__main__":
    main()
