#!/usr/bin/env bash
# MUSDB18 reproduction pack: train the recommended recipe, then produce
# official museval JSON numbers against the 9.16 dB-vocals target
# (BASELINE.md; reference paper Table 1 / README.md:184-193).
#
# Usage:
#   tools/musdb_repro.sh /data/musdb18hq [run_dir] [extra train args...]
#
# In a data-bearing environment this is the ONE command between a MUSDB18-HQ
# download and a museval results JSON.  Without data, dry-run the identical
# path on the synthetic dataset:
#
#   tools/musdb_repro.sh --synthetic /tmp/repro_dryrun --num_epochs 1
#
# Recipe provenance: configs/musdb_repro.yaml (every non-parity knob is
# hardware-A/B-measured and SDR-validated — see the comments there).
set -euo pipefail

cd "$(dirname "$0")/.."

DATA_ROOT="${1:?usage: musdb_repro.sh <musdb_root|--synthetic> [run_dir] [extra args]}"
RUN_DIR="${2:-runs/musdb_repro}"
shift $(( $# > 1 ? 2 : 1 ))

CKPT_DIR="$RUN_DIR/ckpt"
LOG_DIR="$RUN_DIR/logs"
EVAL_DIR="$RUN_DIR/eval"
mkdir -p "$RUN_DIR"

if [ "$DATA_ROOT" = "--synthetic" ]; then
    DATA_ARGS=(--synthetic)
    EVAL_DATA_ARGS=(--synthetic)
else
    DATA_ARGS=(--data_root "$DATA_ROOT")
    EVAL_DATA_ARGS=(--data_root "$DATA_ROOT")
fi

echo "== [1/2] training (configs/musdb_repro.yaml) -> $CKPT_DIR"
python -m tfswa_tpu.cli.train \
    --config configs/musdb_repro.yaml \
    "${DATA_ARGS[@]}" \
    --checkpoint_dir "$CKPT_DIR" --log_dir "$LOG_DIR" \
    "$@"

echo "== [2/2] museval evaluation -> $EVAL_DIR"
# Serving recipe: mag_direct masks (pairs with the direct training
# convention), 0.5 overlap (quality ensembling, +3.0 dB), fast-serving
# device path; museval provides the official BSS metrics
# (reference: evaluator.py:221-239).  MUSDB_REPRO_EVAL_EXTRA lets the
# dry-run test shrink the eval geometry without forking the script.
# shellcheck disable=SC2086
python -m tfswa_tpu.cli.evaluate \
    --checkpoint "$CKPT_DIR" \
    "${EVAL_DATA_ARGS[@]}" \
    --output_dir "$EVAL_DIR" \
    --mask_mode mag_direct --overlap 0.5 \
    --preset fast \
    ${MUSDB_REPRO_EVAL_EXTRA:-}

echo "== done: results JSON under $EVAL_DIR"
