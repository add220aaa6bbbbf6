"""Measured routing decisions: per-chip, persisted, with safe fallbacks.

Round-2 review flagged that the kernel routing gates (Pallas-vs-XLA
attention route, fused-kernel row-block size) encoded one chip's
measurements as Python constants — correct on the v5e they were measured
on, silently wrong anywhere else.  This module replaces the constants
with a three-level lookup:

  1. a persisted per-device-kind cache (JSON under ``~/.cache/tfswa_tpu``
     or ``$TFSWA_AUTOTUNE_DIR``), written by ``tools/autotune.py`` which
     measures the candidates on whatever chip it runs on;
  2. shipped measured defaults for known chips (currently TPU v5e);
  3. the conservative analytic heuristics that existed before.

Runtime code only ever READS (levels 1-3 in order) — measurement happens
exclusively in the explicit ``tools/autotune.py`` sweep, so a user's
first model call never blocks on a benchmark, and decisions stay
deterministic under tracing.  Moving to a new chip needs no code edits:
``python tools/autotune.py`` once, and the gates re-route from the new
cache entries.

The decisions routed through here:
  - ``attention_route(N, C)``: fused-Pallas vs chunked-XLA block path
    (consumed by models/attention.row_transformer_block).
  - ``row_block(N, C, ...)``: rows per Pallas grid cell for the fused
    block kernel (consumed by ops/pallas/fused_block._row_block).
    Measured round 3 on v5e: the analytic VMEM bound is conservative at
    SWA shapes — the full sweep's winners (e.g. Rb=32 at (N=64, C=32),
    12.6 vs 20.2 ms for the XLA route; Rb=64 at (N=64, C=64)) run far
    above the estimate's pick.

Cache keys carry the parameters the measurement actually depends on:
``"<N>,<C>,<dtype>,<mlp_hidden>,<n_outputs>"`` — a bf16 measurement is
not reused for f32 (double the VMEM per buffer), a mlp_ratio=4 one not
for wider MLPs, and the single-output (inference) kernel's Rb not for the
two-output training kernel.  Legacy ``"<N>,<C>"`` entries (the shipped
v5e sweep predating this keying) remain readable and are served only for
the configuration they were measured on: bf16, hidden=4C, one output.
Row count R is not part of the key: Rb only pads when R < Rb, and every
sweep shape fixes R at its flagship per-stage value (tools/autotune.py).
Each sweep also records provenance (device kind, commit, date) under the
"_meta" key of its device-kind section.
"""
from __future__ import annotations

import json
import os
import threading
from pathlib import Path
from typing import Dict, Optional

_lock = threading.Lock()
_cache: Optional[Dict] = None
_device_kind: Optional[str] = None

# Shipped measured defaults (tools/autotune.py output, committed).  Keys are
# legacy "<N>,<C>" (bf16, hidden=4C, single-output — the configuration the
# round-3 sweep measured); values as in the cache file.
# This is the full tools/autotune.py sweep from runs/autotune/autotune.json
# (v5e-1, bf16, all flagship stage shapes + the 3 s serving band): a machine
# without a local cache gets the measured winners, not just the heuristics.
_SHIPPED: Dict[str, Dict[str, Dict[str, object]]] = {
    "TPU v5 lite": {
        # Round-4 sweep (tools/autotune.py + tools/kernel_lab.py --grad,
        # v5e-1, 2026-08-18, commit a1b45ca era; runs/round4/).  Keys are
        # fully qualified; legacy "<N>,<C>" row_block entries kept for
        # configurations the round-4 sweep did not re-measure.
        "row_block": {
            "64,32,bfloat16,128,1": 32,
            "64,32,bfloat16,128,1,hpair": 64,     # paired winner at C=32
            "64,64,bfloat16,256,1": 64,
            "64,64,bfloat16,256,1,hpair": 16,
            "64,128,bfloat16,512,1": 8,
            "64,128,bfloat16,512,1,hpair": 16,
            "64,256,bfloat16,1024,1": 8,
            "64,256,bfloat16,1024,1,hpair": 16,
            "512,64,bfloat16,256,1": 1,
            "256,128,bfloat16,512,1": 3,
            "128,256,bfloat16,1024,1": 3,
            # legacy (round-3 sweep)
            "64,32": 32, "64,64": 64, "64,128": 16, "64,256": 8,
            "512,64": 1, "256,128": 3, "128,256": 3,
        },
        "attn_route": {
            "1025,32,bfloat16": "pallas",
            "862,32,bfloat16": "pallas",           # flagship 10 s FSA
            "862,32,bfloat16,r1024": "pallas",
            "862,32,bfloat16,r256": "xla",         # 3 s serving band
            "259,32,bfloat16": "pallas",
            "259,32,bfloat16,r512": "pallas",
            "130,64,bfloat16": "xla",
            "130,64,bfloat16,r256": "xla",
            "512,64,bfloat16": "pallas",
            "64,32,bfloat16": "pallas",
            "64,64,bfloat16": "pallas",
            "64,128,bfloat16": "pallas",
            "64,256,bfloat16": "pallas",
            "256,128,bfloat16": "pallas",
            "128,256,bfloat16": "xla",
        },
        # head pairing: wins only where C=32 leaves the score tile 6%
        # utilized; at C>=64 the paired form's doubled live planes lose
        "fused_pair": {"64,32": 1, "64,64": 0, "64,128": 0, "64,256": 0},
        "mha_pair": {"64,32": 0, "64,64": 0, "64,128": 0, "64,256": 0},
        # fused Pallas backward kernel vs chunked-XLA VJP (kernel_lab
        # --grad): wins at stage-0/1 shapes (enc0 TSA 118->93 ms, FSA
        # 95->68, SWA 50->36, enc1 SWA 25->13), neutral-to-worse at
        # enc2/bottleneck TSA
        "bwd_route": {
            "1025,32,bfloat16": "pallas",
            "862,32,bfloat16": "pallas",
            "517,32,bfloat16": "pallas",
            "64,32,bfloat16": "pallas",
            "512,64,bfloat16": "pallas",
            "64,64,bfloat16": "pallas",
            "64,128,bfloat16": "pallas",
            "64,256,bfloat16": "pallas",
            "256,128,bfloat16": "xla",
            "128,256,bfloat16": "xla",
        },
    },
}


def _dir() -> Path:
    env = os.environ.get("TFSWA_AUTOTUNE_DIR")
    if env:
        return Path(env)
    return Path.home() / ".cache" / "tfswa_tpu"


def _path() -> Path:
    return _dir() / "autotune.json"


def device_kind() -> str:
    """The current backend's device kind, e.g. 'TPU v5 lite' / 'cpu'."""
    global _device_kind
    if _device_kind is None:
        try:
            import jax

            _device_kind = jax.devices()[0].device_kind
        except Exception:  # backend not initialisable: stay on heuristics
            _device_kind = "unknown"
    return _device_kind


def _load() -> Dict:
    global _cache
    with _lock:
        if _cache is None:
            try:
                _cache = json.loads(_path().read_text())
            except (OSError, ValueError):
                _cache = {}
        return _cache


def reset() -> None:
    """Drop the in-memory cache (tests; after writing a new file)."""
    global _cache, _device_kind
    with _lock:
        _cache = None
        _device_kind = None


def lookup(table: str, key: str):
    """Level-1/2 lookup: persisted cache, then shipped defaults.  None
    means 'no measurement — use the analytic heuristic'.

    NOTE for multi-key consumers (row_block, attention_route): exhaust
    every key form at the LOCAL level before consulting shipped defaults
    (lookup_in) — otherwise a shipped fully-qualified entry would shadow
    a user's legacy-keyed local measurement."""
    hit = lookup_in(_load(), table, key)
    if hit is not None:
        return hit
    return lookup_in(_SHIPPED, table, key)


def lookup_in(level: Dict, table: str, key: str):
    """Single-level lookup (level = the loaded local cache or _SHIPPED)."""
    return level.get(device_kind(), {}).get(table, {}).get(key)


def record(table: str, key: str, value, kind: Optional[str] = None) -> None:
    """Persist one measured decision (tools/autotune.py only)."""
    kind = kind or device_kind()
    with _lock:
        path = _path()
        try:
            data = json.loads(path.read_text())
        except (OSError, ValueError):
            data = {}
        data.setdefault(kind, {}).setdefault(table, {})[key] = value
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(".tmp")
        tmp.write_text(json.dumps(data, indent=1, sort_keys=True))
        tmp.replace(path)
    reset()


def full_key(N: int, C: int, dtype_name: str, mlp_hidden: int,
             n_outputs: int = 1, variant: str = "") -> str:
    base = f"{N},{C},{dtype_name},{mlp_hidden},{n_outputs}"
    return f"{base},{variant}" if variant else base


def remove(table: str, key: str, kind: Optional[str] = None) -> None:
    """Drop one cache entry (tools/autotune.py: a sweep whose every
    candidate failed records nothing rather than a null)."""
    kind = kind or device_kind()
    with _lock:
        path = _path()
        try:
            data = json.loads(path.read_text())
        except (OSError, ValueError):
            return
        data.get(kind, {}).get(table, {}).pop(key, None)
        tmp = path.with_suffix(".tmp")
        tmp.write_text(json.dumps(data, indent=1, sort_keys=True))
        tmp.replace(path)
    reset()


def row_block(N: int, C: int, dtype_name: str = "bfloat16",
              mlp_hidden: Optional[int] = None,
              n_outputs: int = 1, variant: str = "") -> Optional[int]:
    """Measured rows-per-grid-cell for the fused block kernel, or None.

    Returns the fully-keyed measurement when one exists; otherwise a legacy
    "<N>,<C>" entry, but only for the configuration the legacy sweeps were
    taken on (bf16, hidden=4C, single output, default kernel variant) —
    anything else gets None and the caller's analytic VMEM bound decides.
    """
    hidden = mlp_hidden if mlp_hidden is not None else 4 * C
    legacy_ok = not variant and dtype_name == "bfloat16" and hidden == 4 * C
    for level in (_load(), _SHIPPED):
        v = lookup_in(level, "row_block",
                      full_key(N, C, dtype_name, hidden, n_outputs, variant))
        if v is not None:
            return int(v)
        # variants (e.g. head-paired) have different VMEM shapes — never
        # reuse a default-variant measurement for them.  Legacy entries
        # were measured bf16/hidden=4C/single-output; the caller caps
        # them analytically for the two-output training kernel.
        if legacy_ok:
            v = lookup_in(level, "row_block", f"{N},{C}")
            if v is not None:
                return int(v)
    return None


def r_bucket(R: int) -> int:
    """Power-of-two row-count bucket (2^floor(log2 R)); routes measured at
    one R are served only to Rs in the same bucket via the r-qualified
    key, falling back to the R-free flagship entry otherwise."""
    b = 1
    while b * 2 <= R:
        b *= 2
    return b


def attention_route(N: int, C: int, dtype_name: str = "bfloat16",
                    R: Optional[int] = None) -> Optional[str]:
    """Measured 'pallas' | 'xla' block route for this shape, or None.

    The round-4 sweep surfaced why R must qualify the lookup: at
    (N=862, C=32) the 10 s FSA stage (R=1025) runs 1.55x faster on
    Pallas, while the 3 s serving band (R=259, same N and C) measured
    marginally XLA — one unqualified key made the serving band poison
    the flagship route (bench 18.6 -> 13.9 as/s).  R-bucketed entries
    win over the R-free flagship entry; sweeps record the R-free key
    only for flagship-R shapes (tools/autotune.py)."""
    for level in (_load(), _SHIPPED):
        if R is not None:
            v = lookup_in(level, "attn_route",
                          f"{N},{C},{dtype_name},r{r_bucket(R)}")
            if v is not None:
                return str(v)
        v = lookup_in(level, "attn_route", f"{N},{C},{dtype_name}")
        if v is None and dtype_name == "bfloat16":
            v = lookup_in(level, "attn_route", f"{N},{C}")
        if v is not None:
            return str(v)
    return None


def record_provenance(kind: Optional[str] = None) -> None:
    """Stamp sweep provenance (chip, commit, date) into the cache file."""
    import datetime
    import subprocess

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip() or "unknown"
    except Exception:
        commit = "unknown"
    record("_meta", "provenance", {
        "device_kind": kind or device_kind(),
        "commit": commit,
        "date": datetime.date.today().isoformat(),
    }, kind=kind)
