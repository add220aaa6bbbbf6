"""Separation CLI: separate audio files into stems.

    python -m tfswa_tpu.cli.separate --checkpoint ckpts/ song.wav -o out/
    python -m tfswa_tpu.cli.separate --checkpoint ckpts/ --preset fast *.wav

(reference capability: SourceSeparator.separate_file + BatchSeparator,
inference.py:239-297,367-425 — the reference has no CLI for this.)

``--preset fast`` enables the validated fast-serving configuration
(device-OLA, f16 transfers, Nyquist crop, 1-pass serving DFT — every knob
hardware-A/B-measured and SDR-validated, BENCH.md round 4) and, with
multiple inputs, pipelines tracks through ``separate_stream`` so track k+1's
compute overlaps track k's result transfers.
"""
from __future__ import annotations

import argparse


def add_serving_args(p: argparse.ArgumentParser) -> None:
    """Serving-performance flags shared by the separate/evaluate CLIs."""
    p.add_argument("--preset", type=str, default="parity",
                   choices=["parity", "fast"],
                   help="'fast' = the validated fast-serving preset "
                        "(EvalConfig.fast_serving); individual flags below "
                        "override it")
    p.add_argument("--segment_batch", type=int, default=None)
    p.add_argument("--transfer_dtype", type=str, default=None,
                   choices=["float32", "float16", "int16", "int8"])
    p.add_argument("--device_ola", action="store_true", default=None)
    p.add_argument("--ola_bucket_seconds", type=float, default=None)
    p.add_argument("--freq_policy", type=str, default=None,
                   choices=["full", "crop_pow2"])
    p.add_argument("--stft_precision", type=str, default=None,
                   choices=["highest", "high", "default"])


def eval_config_from_args(args) -> "EvalConfig":
    """EvalConfig from the preset + any explicit flag overrides."""
    import dataclasses

    from ..config import EvalConfig

    cfg = (EvalConfig.fast_serving() if args.preset == "fast"
           else EvalConfig())
    cfg = dataclasses.replace(
        cfg,
        segment_seconds=args.segment_seconds,
        overlap=args.overlap,
        mask_mode=args.mask_mode,
    )
    overrides = {}
    for name in ("segment_batch", "transfer_dtype", "device_ola",
                 "ola_bucket_seconds", "freq_policy", "stft_precision"):
        val = getattr(args, name, None)
        if val is not None:
            overrides[name] = val
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Separate audio into stems")
    p.add_argument("inputs", nargs="+", help="input audio files")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("-o", "--output_dir", type=str, default="separated")
    p.add_argument("--stems", type=str, default="vocals,other")
    p.add_argument("--segment_seconds", type=float, default=10.0)
    p.add_argument("--overlap", type=float, default=0.25)
    p.add_argument("--mask_mode", type=str, default="trainer",
                   choices=["trainer", "direct", "mag_direct"])
    p.add_argument("--stream", action="store_true",
                   help="pipeline multiple tracks through separate_stream "
                        "(bit-identical results, higher sustained "
                        "throughput; needs device_ola)")
    add_serving_args(p)
    args = p.parse_args(argv)

    from ..evaluation import BatchSeparator, load_separator_from_checkpoint

    eval_cfg = eval_config_from_args(args)
    separator = load_separator_from_checkpoint(
        args.checkpoint,
        eval_config=eval_cfg,
        stem_names=tuple(args.stems.split(",")),
    )

    if args.stream and len(args.inputs) > 1 and separator.device_ola:
        _stream_files(separator, args.inputs, args.output_dir,
                      eval_cfg.stream_max_in_flight)
        return

    results = BatchSeparator(separator).separate_files(args.inputs, args.output_dir)
    for path, res in results.items():
        status = res["status"]
        extra = res.get("outputs", res.get("error"))
        print(f"{path}: {status} {extra}")


def _stream_files(separator, inputs, output_dir, max_in_flight) -> None:
    """Pipelined multi-file separation: load all, stream, write stems."""
    import os

    import numpy as np
    import soundfile as sf

    from ..evaluation.inference import _resample_poly

    os.makedirs(output_dir, exist_ok=True)
    tracks = []
    for path in inputs:
        audio, sr = sf.read(path, dtype="float32", always_2d=True)
        audio = audio.T
        if sr != separator.sample_rate:
            audio = _resample_poly(audio, sr, separator.sample_rate)
        tracks.append(np.asarray(audio))
    outs = separator.separate_stream(tracks, max_in_flight=max_in_flight)
    for path, separated in zip(inputs, outs):
        base = os.path.splitext(os.path.basename(path))[0]
        written = {}
        for name, wav in separated.items():
            out_path = os.path.join(output_dir, f"{base}_{name}.wav")
            sf.write(out_path, wav[0], separator.sample_rate)
            written[name] = out_path
        print(f"{path}: ok {written}")


if __name__ == "__main__":
    main()
