"""Measure what OLA overlap actually buys in separation quality.

Separates the synthetic val tracks with a TRAINED checkpoint (the
quality-A/B `direct` arm) at several overlap ratios and reports per-stem
SDR vs ground truth plus the waveform delta vs the 0.5-overlap reference
output.  Rationale: overlap multiplies serving compute by 1/(1-overlap);
if SDR is flat in overlap, the headline serving default can use the
cheapest setting with evidence rather than convention.

    python tools/overlap_ab.py --overlaps 0.5 0.25 0.1 [--arm direct]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", default="direct")
    ap.add_argument("--checkpoint", default="latest")
    ap.add_argument("--overlaps", type=float, nargs="+",
                    default=[0.5, 0.25, 0.1])
    ap.add_argument("--segment_length", type=float, default=10.0)
    ap.add_argument("--freq_policy", default="full")
    ap.add_argument("--stft_precision", default=None,
                    help="override cfg.stft.precision (highest|high|default)")
    ap.add_argument("--transfer_dtype", default="float32")
    ap.add_argument("--device_ola", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    from tfswa_tpu.config import Config
    from tfswa_tpu.data.synthetic import SyntheticDataset
    from tfswa_tpu.evaluation.inference import SourceSeparator
    from tfswa_tpu.evaluation.metrics import sdr as sdr_metric
    from tfswa_tpu.models import TFSWAUNet
    from tfswa_tpu.ops.stft import STFTProcessor
    from tfswa_tpu.training.checkpointing import restore_variables

    ck_dir = os.path.join(REPO, "runs", "quality_ab", args.arm, "ck")
    with open(os.path.join(ck_dir, "config.json")) as fh:
        cfg = Config.from_dict(json.load(fh))

    if args.stft_precision:
        cfg.stft.precision = args.stft_precision
    model = TFSWAUNet.from_config(cfg.model)
    variables, _ = restore_variables(os.path.join(ck_dir, args.checkpoint))
    print(f"loaded {args.arm}/{args.checkpoint}")

    proc = STFTProcessor(cfg.stft)
    val = SyntheticDataset(
        num_tracks=4, track_seconds=30.0,
        segment_seconds=cfg.data.segment_seconds,
        sample_rate=cfg.data.sample_rate, stems=cfg.data.stems,
        random_segments=False, seed=999,
    )
    mask_mode = ("trainer" if cfg.train.train_mask_mode == "parity"
                 else "mag_direct")
    stems = tuple(cfg.data.stems)

    results, ref_out = {}, None
    for ov in args.overlaps:
        sep = SourceSeparator(
            model, variables, proc, segment_length=args.segment_length,
            overlap=ov, mask_mode=mask_mode, stem_names=stems,
            segment_batch=8, freq_policy=args.freq_policy,
            transfer_dtype=args.transfer_dtype, device_ola=args.device_ola,
        )
        per_stem = {s: [] for s in stems}
        outs = []
        for i in range(len(val.track_names)):
            mixture, refs = val.get_full_track(i)
            ests = sep.separate(mixture)
            outs.append(ests)
            for s in stems:
                ref = np.asarray(refs[s]).mean(axis=0)
                est = np.asarray(ests[s])[0]
                per_stem[s].append(
                    float(sdr_metric(jnp.asarray(est), jnp.asarray(ref)))
                )
        entry = {f"sdr/{s}": float(np.mean(per_stem[s])) for s in stems}
        entry["sdr/avg"] = float(np.mean(list(entry.values())))
        if ref_out is None:
            ref_out = outs
        else:
            # waveform delta vs the highest-overlap arm, in dB rel power
            num = den = 0.0
            for a, b in zip(outs, ref_out):
                for s in stems:
                    d = a[s][0].astype(np.float64) - b[s][0].astype(np.float64)
                    num += float(np.sum(d * d))
                    den += float(np.sum(b[s][0].astype(np.float64) ** 2))
            entry["delta_db_vs_first"] = float(
                10 * np.log10(max(num, 1e-30) / max(den, 1e-30))
            )
        results[str(ov)] = entry
        print(f"overlap {ov:4.2f}: " + json.dumps(entry), flush=True)

    suffix = "" if args.freq_policy == "full" else f"_{args.freq_policy}"
    if args.stft_precision:
        suffix += f"_{args.stft_precision}"
    out_path = args.out or os.path.join(
        REPO, "runs", "round4", f"overlap_ab_{args.arm}{suffix}.json"
    )
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
