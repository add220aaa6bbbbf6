#!/bin/bash
# Round-4 hardware measurement sequence (run when the TPU tunnel is up).
# Each step logs to runs/round4/ and is individually bounded; later steps
# still run if an earlier one fails.  Drive with:
#     bash tools/round4_hw.sh & echo $! > /tmp/round4_hw.pid
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/round4

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a runs/round4/driver.log; }

log "=== 0. probe ==="
timeout 180 python -c "import jax; print(jax.devices())" \
    >> runs/round4/driver.log 2>&1 || { log "probe FAILED"; exit 1; }

log "=== 1. kernel lab: paired vs prod at SWA shapes ==="
timeout 2400 python tools/kernel_lab.py --variants prod,xla --shapes SWA \
    > runs/round4/lab_swa.log 2>&1
tail -5 runs/round4/lab_swa.log | tee -a runs/round4/driver.log

log "=== 2. kernel lab: stage ablation (locate MXU vs VPU bound) ==="
timeout 3000 python tools/kernel_lab.py --ablate \
    > runs/round4/lab_ablate.log 2>&1
tail -10 runs/round4/lab_ablate.log | tee -a runs/round4/driver.log

log "=== 3. autotune sweep (pair A/Bs + per-variant Rb + routes) ==="
timeout 7200 python tools/autotune.py > runs/round4/autotune.log 2>&1
tail -15 runs/round4/autotune.log | tee -a runs/round4/driver.log

log "=== 4. headline bench ==="
timeout 3600 python bench.py > runs/round4/bench.json 2>&1
cat runs/round4/bench.json | tee -a runs/round4/driver.log

log "=== 5. train-step attribution + wall-clock projection ==="
timeout 4800 python tools/bench_train_ablate.py \
    > runs/round4/train_ablate.log 2>&1
tail -8 runs/round4/train_ablate.log | tee -a runs/round4/driver.log

log "=== 6. chunk-budget sweep (fwdbwd at 16..256 MB prob planes) ==="
timeout 4800 python tools/bench_train_ablate.py --chunk-sweep 16,32,64,128,256 \
    > runs/round4/chunk_sweep.log 2>&1
tail -7 runs/round4/chunk_sweep.log | tee -a runs/round4/driver.log

log "=== done (quality A/B + int8 A/B driven separately) ==="
