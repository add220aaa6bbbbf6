"""Measure-and-cache kernel routing for the current chip.

Sweeps the flagship model's attention stage shapes on whatever device JAX
sees, measuring (a) the fused-Pallas vs chunked-XLA block route, (b) the
fused kernel's rows-per-grid-cell (Rb) for the single-output (inference)
kernel, and (c) Rb for the two-output (training) kernel that also exports
the post-attention intermediate, and persists the winners to the autotune
cache (ops/pallas/autotune.py; ``~/.cache/tfswa_tpu`` or
``$TFSWA_AUTOTUNE_DIR``).  Run once per new chip type:

    python tools/autotune.py            # sweep + write cache
    python tools/autotune.py --dry      # sweep + print, no writes

Candidates are timed through the PRODUCTION path: each Rb candidate is
recorded into the cache, the jit cache is dropped, and the public
``fused_row_block`` entry point re-traces reading it — so what is timed
is exactly what will run.  Cache entries are fully keyed
(N, C, dtype, mlp_hidden, n_outputs) and the sweep stamps provenance
(device kind, commit, date) into the cache file.
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
    _analytic_row_block, _fused_block_impl, _xla_block, fused_row_block,
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
    # crop_pow2 TRAINING shapes (train.freq_policy=crop_pow2, 5.938 s
    # tile-clean segment: T=512, F=1024, at the B=4 step's row counts).
    # Without these keys the bwd_route lookup misses and the fused
    # backward silently falls back to XLA for the whole cropped step —
    # the reason round-4 measured "backward barely moves" under crop.
    ("enc0 Tcrop", 2048, 1024, 32, 8),
    ("enc0 Fcrop", 4096, 512, 32, 8),
    ("enc1 Tcrop", 1024, 512, 64, 8),
    ("enc1 Fcrop", 2048, 256, 64, 8),
    ("enc2 Tcrop", 512, 256, 128, 8),
    ("enc2 Fcrop", 1024, 128, 128, 8),
    ("bott Tcrop", 256, 128, 256, 8),
    ("bott Fcrop", 512, 64, 256, 8),
]

# (N, C) pairs whose R-free route keys belong to the parity flagship
# sweep; crop entries sharing one record only r-bucketed keys so the two
# training regimes cannot poison each other's routes (the round-4
# serving-band lesson, applied to the backward too).
_PARITY_NC = {(n, c) for _, _, n, c, _ in SHAPES[:9]}

RB_CANDIDATES = (8, 16, 32, 48, 64)


def _sweep_rb(rows, p, H, dtype_name, hidden, n_outputs, line_parts,
              variant=""):
    """Time each Rb candidate through the production entry point; the
    winner is left in the cache under its fully-specified key.  Returns
    (best_rb, best_t); records nothing when every candidate fails."""
    N, C = rows.shape[1], rows.shape[2]
    key = autotune.full_key(N, C, dtype_name, hidden, n_outputs, variant)
    analytic = _analytic_row_block(N, C, hidden, paired=variant == "hpair")
    # measured on v5e: up to ~2.5x the analytic bound still fits VMEM;
    # 4x is the compile-failure guard for the sweep
    cands = sorted({analytic} | {rb for rb in RB_CANDIDATES
                                 if rb <= 4 * analytic})
    tag = ("p" if variant == "hpair" else "") \
        + ("/2out" if n_outputs == 2 else "")
    best_rb, best_t = None, None
    for rb in cands:
        autotune.record("row_block", key, rb)
        try:
            if n_outputs == 1:
                fn = jax.jit(lambda r, pp: fused_row_block(r, pp, H))
            else:
                fn = jax.jit(lambda r, pp: _fused_block_impl(
                    r, pp, H, with_mid=True))
            t = timeit(fn, rows, p, iters=6)
        except Exception:  # too big for VMEM on this chip
            line_parts.append(f"Rb{tag}={rb}:FAIL")
            continue
        line_parts.append(f"Rb{tag}={rb}:{t * 1e3:7.2f}")
        if best_t is None or t < best_t:
            best_rb, best_t = rb, t
    if best_rb is not None:
        autotune.record("row_block", key, best_rb)
    else:
        # leave no entry rather than a null: the analytic bound decides
        autotune.remove("row_block", key)
    return best_rb, best_t


def _sweep_fused(rows, p, H, dtype_name, hidden, parts, two_output):
    """Sweep the fused kernel at this shape: head-paired vs per-head form
    (where pairing applies), each with its own Rb sweep.  Leaves the
    winning form in "fused_pair" and returns its best single-output time."""
    from tfswa_tpu.ops.pallas.fused_block import _pair_heads_profitable

    N, C = rows.shape[1], rows.shape[2]
    pairable = _pair_heads_profitable(N, C, H) or (
        2 * N <= 128 and H % 2 == 0 and N % 8 == 0)
    if not pairable:
        _, best_t = _sweep_rb(rows, p, H, dtype_name, hidden, 1, parts)
        if two_output:
            _sweep_rb(rows, p, H, dtype_name, hidden, 2, parts)
        return best_t

    results = {}
    for pair in (0, 1):
        autotune.record("fused_pair", f"{N},{C}", pair)
        variant = "hpair" if pair else ""
        _, t = _sweep_rb(rows, p, H, dtype_name, hidden, 1, parts,
                         variant=variant)
        if two_output:
            _sweep_rb(rows, p, H, dtype_name, hidden, 2, parts,
                      variant=variant)
        if t is not None:
            results[pair] = t
    best_pair = min(results, key=results.get) if results else 0
    autotune.record("fused_pair", f"{N},{C}", best_pair)
    parts.append(f"pair->{best_pair}")
    return results.get(best_pair)


def _sweep_bwd_route(rows, p, H, dtype_name, parts, record_rfree=True):
    """A/B the training backward: fused Pallas bwd kernel vs the chunked-XLA
    VJP, through the production custom-VJP entry (jax.grad of
    fused_row_block wrt rows AND params).  Records the winner in
    "bwd_route" under the r-bucketed key, plus the R-free key when this
    shape owns it (``record_rfree``)."""
    from tfswa_tpu.ops.pallas.fused_block import fused_row_block

    R, N, C = rows.shape
    rkey = f"{N},{C},{dtype_name},r{autotune.r_bucket(R)}"
    keys = [rkey] + ([f"{N},{C},{dtype_name}"] if record_rfree else [])

    def gfn(r, pp):
        return jax.grad(
            lambda rr, qq: jnp.sum(
                jnp.square(fused_row_block(rr, qq, H).astype(jnp.float32))),
            argnums=(0, 1),
        )(r, pp)

    t_by_route = {}
    for route in ("xla", "pallas"):
        for key in keys:
            autotune.record("bwd_route", key, route)
        try:
            t_by_route[route] = timeit(jax.jit(gfn), rows, p, iters=4)
            parts.append(f"bwd/{route}:{t_by_route[route] * 1e3:7.2f}")
        except Exception:
            parts.append(f"bwd/{route}:FAIL")
    best = min(t_by_route, key=t_by_route.get) if t_by_route else "xla"
    for key in keys:
        autotune.record("bwd_route", key, best)
    parts.append(f"bwd->{best}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry", action="store_true", help="print, don't persist")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--skip-two-output", action="store_true",
                    help="skip the training-kernel (two-output) Rb sweep")
    ap.add_argument("--bwd", action="store_true",
                    help="also A/B the training backward route per shape "
                         "(fused Pallas bwd kernel vs chunked-XLA VJP)")
    ap.add_argument("--shapes", default="",
                    help="substring filter on the shape label, e.g. SWA")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    dtype_name = jnp.dtype(dtype).name

    if args.dry:
        os.environ["TFSWA_AUTOTUNE_DIR"] = "/tmp/tfswa_autotune_dry"
        autotune.reset()

    kind = autotune.device_kind()
    print(f"device kind: {kind}")
    for label, R, N, C, H in SHAPES:
        if args.shapes and args.shapes not in label:
            continue
        rng = np.random.default_rng(0)
        rows = jnp.asarray(rng.standard_normal((R, N, C)), dtype)
        p = make_params(C, rng, dtype)
        hidden = p.fc1_kernel.shape[1]

        parts = [f"{label:16s} N={N:5d} C={C:4d}"]
        sublane = 16 if dtype == jnp.bfloat16 else 8
        best_t = None
        if N % sublane == 0:
            best_t = _sweep_fused(rows, p, H, dtype_name, hidden, parts,
                                  two_output=not args.skip_two_output)
        if best_t is None:
            best_t = timeit(
                jax.jit(lambda r, pp: fused_row_block(r, pp, H)),
                rows, p, iters=6)
            parts.append(f"Rb=1:{best_t * 1e3:7.2f}")

        # XLA route: A/B mha_rows head pairing where it applies, keep the
        # winner in "mha_pair" (consumed by the remat/backward path too).
        if 2 * N <= 128 and H % 2 == 0 and N % 8 == 0:
            t_by_pair = {}
            for mp in (0, 1):
                autotune.record("mha_pair", f"{N},{C}", mp)
                t_by_pair[mp] = timeit(
                    jax.jit(lambda r, pp: _xla_block(r, pp, H)),
                    rows, p, iters=6)
                parts.append(f"xla{'p' if mp else ''}:"
                             f"{t_by_pair[mp] * 1e3:7.2f}")
            best_mp = min(t_by_pair, key=t_by_pair.get)
            autotune.record("mha_pair", f"{N},{C}", best_mp)
            parts.append(f"mha_pair->{best_mp}")
            t_xla = t_by_pair[best_mp]
        else:
            t_xla = timeit(
                jax.jit(lambda r, pp: _xla_block(r, pp, H)), rows, p,
                iters=6)
            parts.append(f"xla:{t_xla * 1e3:7.2f}")
        route = "pallas" if best_t <= t_xla else "xla"
        parts.append(f"-> {route}")
        # r-bucketed key always; the R-free key only for shapes that OWN
        # the (N, C): not the 3 s serving band (that poisoning cost
        # 18.6 -> 13.9 as/s in round 4) and not crop entries that share a
        # parity stage's (N, C) at a different row count.
        owns_rfree = "3s" not in label and not (
            "crop" in label and (N, C) in _PARITY_NC)
        if args.bwd:
            _sweep_bwd_route(rows, p, H, dtype_name, parts,
                             record_rfree=owns_rfree)
        print("  ".join(parts))
        autotune.record(
            "attn_route",
            f"{N},{C},{dtype_name},r{autotune.r_bucket(R)}", route)
        if owns_rfree:
            autotune.record("attn_route", f"{N},{C},{dtype_name}", route)

    autotune.record_provenance(kind)
    print(f"cache written: {autotune._path()}")


if __name__ == "__main__":
    main()
