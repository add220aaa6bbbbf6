"""Autotune cache: round-trip, precedence, and gate integration.

VERDICT round-2 weak #5: routing gates were hard-coded v5e constants.
These tests pin the replacement mechanism — a persisted per-device-kind
cache consulted before the shipped defaults and analytic heuristics —
including that a recorded decision survives a process-boundary reload
and actually changes what `_row_block` / `_pallas_fwd_profitable`
return.
"""
import json

import jax.numpy as jnp
import pytest

from tfswa_tpu.models.attention import _pallas_fwd_profitable
from tfswa_tpu.ops.pallas import autotune
from tfswa_tpu.ops.pallas.fused_block import _analytic_row_block, _row_block


@pytest.fixture()
def tuned_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("TFSWA_AUTOTUNE_DIR", str(tmp_path))
    autotune.reset()
    yield tmp_path
    autotune.reset()


def test_cache_round_trips(tuned_dir):
    kind = autotune.device_kind()
    autotune.record("row_block", "64,32", 48)
    autotune.record("attn_route", "200,64", "xla")

    # the file is real JSON keyed by device kind
    data = json.loads((tuned_dir / "autotune.json").read_text())
    assert data[kind]["row_block"]["64,32"] == 48
    assert data[kind]["attn_route"]["200,64"] == "xla"

    # fresh in-memory state (as if a new process) reads the same values
    autotune.reset()
    assert autotune.row_block(64, 32) == 48
    assert autotune.attention_route(200, 64) == "xla"


def test_cache_overrides_gates(tuned_dir):
    # _row_block follows a recorded Rb instead of the analytic bound
    autotune.record("row_block", "64,32", 48)
    assert _row_block(64, 32, 128, jnp.bfloat16) == 48
    assert _analytic_row_block(64, 32, 128) != 48  # the override mattered

    # a recorded route flips the v5e heuristic both ways
    assert _pallas_fwd_profitable(1025, 32)       # heuristic: pallas
    autotune.record("attn_route", "1025,32", "xla")
    assert not _pallas_fwd_profitable(1025, 32)
    autotune.record("attn_route", "200,32", "pallas")
    assert _pallas_fwd_profitable(200, 32)        # heuristic said xla


def test_unmeasured_falls_back_to_heuristics(tuned_dir):
    # no cache entry, unknown chip on CPU test runner: analytic bound rules
    assert autotune.row_block(512, 64) is None or \
        isinstance(autotune.row_block(512, 64), int)
    rb = _row_block(512, 64, 256, jnp.bfloat16)
    assert rb >= 1
    # sublane-misaligned N always degrades to 1 regardless of cache
    autotune.record("row_block", "1025,32", 64)
    assert _row_block(1025, 32, 128, jnp.bfloat16) == 1


def test_shipped_defaults_for_v5e(tuned_dir, monkeypatch):
    # with no cache file at all, the shipped v5e measurements apply
    monkeypatch.setattr(autotune, "_device_kind", "TPU v5 lite")
    assert autotune.row_block(64, 32) == 32
    assert autotune.row_block(64, 64) == 64
    assert autotune.row_block(128, 256) == 3  # round-4 re-measure
    assert autotune.attention_route(512, 64) == "pallas"  # round-4 flip
    assert autotune.attention_route(1025, 32) == "pallas"
    # and a user cache entry wins over the shipped default
    autotune.record("row_block", "64,32", 16, kind="TPU v5 lite")
    monkeypatch.setattr(autotune, "_device_kind", "TPU v5 lite")
    assert autotune.row_block(64, 32) == 16


def test_legacy_keys_only_serve_their_measured_config(tuned_dir):
    """ADVICE round-3: a bf16/ratio-4/single-output measurement must not be
    reused for f32, wider MLPs, or the two-output training kernel."""
    autotune.record("row_block", "64,32", 48)     # legacy key
    assert autotune.row_block(64, 32) == 48                        # bf16 4C
    assert autotune.row_block(64, 32, "float32") is None           # dtype
    assert autotune.row_block(64, 32, "bfloat16", 256) is None     # hidden
    # two-output: legacy hit is served but the caller caps it analytically
    assert autotune.row_block(64, 32, n_outputs=2) == 48
    rb2 = _row_block(64, 32, 128, jnp.bfloat16, n_outputs=2)
    assert rb2 <= max(48, _analytic_row_block(64, 32, 128))

    # a fully-keyed two-output measurement is served uncapped
    autotune.record("row_block", autotune.full_key(64, 32, "bfloat16",
                                                   128, 2), 40)
    assert _row_block(64, 32, 128, jnp.bfloat16, n_outputs=2) == 40

    # routes: dtype-keyed entry wins over the legacy one for that dtype
    # (shape chosen OFF the shipped-defaults table so only the recorded
    # entries participate)
    autotune.record("attn_route", "200,64", "xla")
    autotune.record("attn_route", "200,64,float32", "pallas")
    assert autotune.attention_route(200, 64) == "xla"
    assert autotune.attention_route(200, 64, "float32") == "pallas"


def test_remove_and_provenance(tuned_dir):
    autotune.record("row_block", "96,32", 8)
    autotune.remove("row_block", "96,32")
    assert autotune.row_block(96, 32) is None
    autotune.remove("row_block", "never-there")  # no-op, no crash
    autotune.record_provenance()
    prov = autotune.lookup("_meta", "provenance")
    assert set(prov) == {"device_kind", "commit", "date"}


def test_r_bucketed_route_wins_and_band_isolation(tuned_dir):
    """Round-4 regression: one unqualified (N, C) route key let the 3 s
    serving band (R=259) poison the flagship 10 s FSA route (R=1025) at
    the same (862, 32) — bench dropped 18.6 -> 13.9 as/s.  R-bucketed
    entries must win over the R-free entry, and an R outside any
    measured bucket must fall back to the flagship entry."""
    assert autotune.r_bucket(259) == 256
    assert autotune.r_bucket(1025) == 1024
    assert autotune.r_bucket(512) == 512

    autotune.record("attn_route", "862,32,bfloat16", "pallas")
    autotune.record("attn_route", "862,32,bfloat16,r256", "xla")

    # serving-band R resolves its own bucket; flagship R falls through to
    # the R-free flagship entry; no-R lookups keep the flagship route
    assert autotune.attention_route(862, 32, "bfloat16", R=259) == "xla"
    assert autotune.attention_route(862, 32, "bfloat16", R=1025) == "pallas"
    assert autotune.attention_route(862, 32, "bfloat16") == "pallas"

    # the gate consumes R: same (N, C), different route by row count
    assert _pallas_fwd_profitable(862, 32, jnp.bfloat16, R=1025)
    assert not _pallas_fwd_profitable(862, 32, jnp.bfloat16, R=259)
