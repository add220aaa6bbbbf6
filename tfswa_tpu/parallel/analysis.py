"""Compiled-program accounting for sharded computations.

Tools for *measuring* what GSPMD actually emitted, instead of asserting
scaling claims: per-device FLOPs from XLA's cost analysis and per-device
collective traffic parsed from the partitioned HLO.  Used by the mesh
scaling instrument (tools/bench_mesh_scaling.py) and its tests — the
reference has no distributed anything (SURVEY.md section 2.7), so this
layer is the framework's own scaling evidence.
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

_COLLECTIVE_OPS = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1,
    "pred": 1, "c64": 8, "c128": 16,
}

# result shapes on an HLO op line, e.g. "f32[64,256]{1,0}" or "bf16[8]"
_SHAPE_RE = re.compile(r"\b([a-z0-9]+)\[([0-9,]*)\]")


def _shape_bytes(dtype: str, dims: str) -> int:
    nbytes = _DTYPE_BYTES.get(dtype)
    if nbytes is None:
        return 0
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * nbytes


@dataclass
class CollectiveStats:
    """Per-opcode count and result bytes of collectives in one HLO module."""

    counts: Dict[str, int] = field(default_factory=dict)
    bytes: Dict[str, int] = field(default_factory=dict)

    @property
    def total_count(self) -> int:
        return sum(self.counts.values())

    @property
    def total_bytes(self) -> int:
        return sum(self.bytes.values())


def collective_stats(hlo_text: str) -> CollectiveStats:
    """Count collectives and their result bytes in (partitioned) HLO text.

    Bytes are the RESULT shapes of each collective op — for an all-reduce
    this equals the payload each device contributes/receives once; actual
    link traffic for a ring all-reduce is 2*(d-1)/d of that per device.
    """
    stats = CollectiveStats()
    for line in hlo_text.splitlines():
        # an op line looks like:  %name = <shape(s)> opcode(...)
        if "=" not in line:
            continue
        for op in _COLLECTIVE_OPS:
            # opcode token is followed by "(" — avoids matching metadata
            # or variable names that merely contain the word
            if f" {op}(" not in line and f" {op}-start(" not in line:
                continue
            rhs = line.split("=", 1)[1]
            opcode_pos = rhs.find(f" {op}")
            shapes = _SHAPE_RE.findall(rhs[:opcode_pos])
            nbytes = sum(_shape_bytes(d, dims) for d, dims in shapes)
            stats.counts[op] = stats.counts.get(op, 0) + 1
            stats.bytes[op] = stats.bytes.get(op, 0) + nbytes
            break
    return stats


def compiled_flops(compiled) -> float:
    """FLOPs from XLA cost analysis of a compiled (possibly SPMD) module.

    XLA reports the cost of the PARTITIONED module — i.e. per-device work
    under GSPMD (verified by the dp-sweep test: halving the per-device
    batch halves this number).
    """
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return float(analysis.get("flops", 0.0))


def analyze_jitted(jitted, *args) -> Tuple[float, CollectiveStats, object]:
    """Lower + compile a jitted fn at ``args`` (no execution); return
    (per-device flops, collective stats, compiled)."""
    compiled = jitted.lower(*args).compile()
    stats = collective_stats(compiled.as_text())
    return compiled_flops(compiled), stats, compiled


def largest_tensor_bytes(hlo_text: str) -> int:
    """Byte size of the largest single tensor in an HLO module.

    A compile-time memory regression guard: a chunked/blocked path that
    silently materializes its full score planes (e.g. masked SWA at
    full-track window counts — tens of GB) shows up here as one huge
    array long before any device OOMs.
    """
    best = 0
    for dtype, dims in _SHAPE_RE.findall(hlo_text):
        best = max(best, _shape_bytes(dtype, dims))
    return best


def ring_all_reduce_link_bytes(payload_bytes: int, n_devices: int) -> float:
    """Per-device ICI traffic of a ring all-reduce of ``payload_bytes``:
    reduce-scatter + all-gather move 2*(d-1)/d of the payload through each
    device's links (the scaling-book recipe)."""
    if n_devices <= 1:
        return 0.0
    return 2.0 * (n_devices - 1) / n_devices * payload_bytes
