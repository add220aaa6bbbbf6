"""Measure-and-cache kernel routing for the current chip.

Sweeps the flagship model's attention stage shapes on whatever device JAX
sees, measuring (a) the fused-Pallas vs chunked-XLA block route and (b)
the fused kernel's rows-per-grid-cell (Rb), and persists the winners to
the autotune cache (ops/pallas/autotune.py; ``~/.cache/tfswa_tpu`` or
``$TFSWA_AUTOTUNE_DIR``).  Run once per new chip type:

    python tools/autotune.py            # sweep + write cache
    python tools/autotune.py --dry      # sweep + print, no writes

Candidates are timed through the PRODUCTION path: each Rb candidate is
recorded into the cache, the jit cache is dropped, and the public
``fused_row_block`` entry point re-traces reading it — so what is timed
is exactly what will run.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tfswa_tpu.ops.pallas import autotune
from tfswa_tpu.ops.pallas.fused_block import (
    _analytic_row_block, _xla_block, fused_row_block,
)
from tools.kernel_lab import make_params, timeit

# Flagship stage shapes (R, N, C, H) at B=1 x 10 s plus the short-segment
# serving band (3 s, N=259) that drives the route exception on v5e.
SHAPES = [
    ("enc0 TSA", 862, 1025, 32, 8),
    ("enc0 FSA", 1025, 862, 32, 8),
    ("enc0 SWA", 13932, 64, 32, 8),
    ("enc1 TSA", 431, 512, 64, 8),
    ("enc1 SWA", 3456, 64, 64, 8),
    ("enc2 TSA", 216, 256, 128, 8),
    ("enc2 SWA", 864, 64, 128, 8),
    ("bottleneck TSA", 108, 128, 256, 8),
    ("bottleneck SWA", 216, 64, 256, 8),
    ("enc0 TSA 3s", 862, 259, 32, 8),
    ("enc0 FSA 3s", 259, 862, 32, 8),
    ("enc1 TSA 3s", 431, 130, 64, 8),
]

RB_CANDIDATES = (8, 16, 32, 48, 64)


def _time_rb(rows, p, H, rb):
    """Time fused_row_block with Rb forced via a cache entry (so the timed
    path is exactly the production path)."""
    N, C = rows.shape[1], rows.shape[2]
    autotune.record("row_block", f"{N},{C}", rb)
    fn = jax.jit(lambda r, pp: fused_row_block(r, pp, H))
    return timeit(fn, rows, p, iters=6)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry", action="store_true", help="print, don't persist")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    if args.dry:
        os.environ["TFSWA_AUTOTUNE_DIR"] = "/tmp/tfswa_autotune_dry"
        autotune.reset()

    kind = autotune.device_kind()
    print(f"device kind: {kind}")
    results = {}
    for label, R, N, C, H in SHAPES:
        rng = np.random.default_rng(0)
        rows = jnp.asarray(rng.standard_normal((R, N, C)), dtype)
        p = make_params(C, rng, dtype)
        hidden = p.fc1_kernel.shape[1]

        line = f"{label:16s} N={N:5d} C={C:4d}"
        sublane = 16 if dtype == jnp.bfloat16 else 8
        best_rb, best_t = None, None
        if N % sublane == 0:
            analytic = _analytic_row_block(N, C, hidden)
            # measured on v5e: up to ~2.5x the analytic bound still fits
            # VMEM; 4x is the compile-failure guard for the sweep
            cands = sorted(
                {analytic} | {rb for rb in RB_CANDIDATES
                              if rb <= 4 * analytic}
            )
            for rb in cands:
                try:
                    t = _time_rb(rows, p, H, rb)
                except Exception:  # too big for VMEM on this chip
                    line += f"  Rb={rb}:FAIL"
                    continue
                line += f"  Rb={rb}:{t * 1e3:7.2f}"
                if best_t is None or t < best_t:
                    best_rb, best_t = rb, t
            autotune.record("row_block", f"{N},{C}", best_rb)
        else:
            best_t = timeit(
                jax.jit(lambda r, pp: fused_row_block(r, pp, H)),
                rows, p, iters=6)
            line += f"  Rb=1:{best_t * 1e3:7.2f}"

        t_xla = timeit(
            jax.jit(lambda r, pp: _xla_block(r, pp, H)), rows, p, iters=6)
        route = "pallas" if best_t <= t_xla else "xla"
        line += f"  xla:{t_xla * 1e3:7.2f}  -> {route}"
        print(line)
        results[f"{N},{C}"] = route
        autotune.record("attn_route", f"{N},{C}", route)

    print(f"cache written: {autotune._path()}")


if __name__ == "__main__":
    main()
