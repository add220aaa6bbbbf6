"""Tile-aligned serving geometry probe (round 4).

Hypothesis: the serving shapes are tile-RAGGED — N=862 pads to 896 lanes,
N=1025 to 1152 (+12.4%) — and TSA/FSA cost per audio-second scales with
the segment's frame count T.  A geometry chosen so every attention dim is
a multiple of 128 (freq crop 1025->1024 plus segment length with T=768,
i.e. 8.905 s) should cut stage-1 attention per audio-second by ~10-18%
with zero model change (crop is SDR-neutral: runs/round4/sdr_seg1039_*).

Times the PRODUCTION fused block kernel at every stage shape for both
geometries (B=1 segment), weights by block count (depths [2,2,6,2] +
mirrored decoder), and reports attention-cost per audio-second.

    python tools/geom_probe.py [--iters 8] [--rb-sweep]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.kernel_lab import make_params, timeit
from tfswa_tpu.ops.pallas.fused_block import fused_row_block


def stage_shapes(F, T, B=1):
    """(label, R, N, C, n_blocks) for every TFSWA stage at spectrogram
    (F, T); n_blocks counts encoder + mirrored decoder visits."""
    def swa_windows(f, t):
        fp = ((f + 7) // 8) * 8
        tp = ((t + 7) // 8) * 8
        return (fp // 8) * (tp // 8) * B

    dims = [32, 64, 128, 256]
    counts = [4, 4, 12, 2]   # enc+dec blocks per scale (depths [2,2,6,2])
    shapes = []
    f, t = F, T
    for i, (C, nb) in enumerate(zip(dims, counts)):
        shapes.append((f"s{i} tsa", B * f, t, C, nb))
        shapes.append((f"s{i} fsa", B * t, f, C, nb))
        shapes.append((f"s{i} swa", swa_windows(f, t), 64, C, nb))
        # conv k4 s2 p1 floor halving
        f, t = (f + 2 - 4) // 2 + 1, (t + 2 - 4) // 2 + 1
    return shapes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    dtype = jnp.bfloat16
    print(f"device: {jax.devices()[0]}")

    geoms = [
        ("current 10.0s/full  (F=1025, T=862)", 1025, 862, 10.0 * 0.75),
        ("aligned 8.905s/crop (F=1024, T=768)", 1024, 768,
         (767 * 512 / 44100) * 0.75),
    ]
    for label, F, T, eff_audio in geoms:
        shapes = stage_shapes(F, T)
        total = 0.0
        print(f"\n=== {label}: effective audio/segment {eff_audio:.3f}s")
        for name, R, N, C, nb in shapes:
            rng = np.random.default_rng(0)
            rows = jnp.asarray(rng.standard_normal((R, N, C)), dtype)
            p = make_params(C, rng, dtype)
            t = timeit(jax.jit(functools.partial(fused_row_block,
                                                 num_heads=8)),
                       rows, p, iters=args.iters)
            print(f"  {name:8s} R={R:6d} N={N:4d} C={C:3d} x{nb:2d}: "
                  f"{t*1e3:8.2f} ms", flush=True)
            total += t * nb
        print(f"  TOTAL attention: {total*1e3:9.1f} ms/segment "
              f"=> {total/eff_audio*1e3:8.2f} ms per audio-sec")


if __name__ == "__main__":
    main()
