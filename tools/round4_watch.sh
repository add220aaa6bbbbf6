#!/bin/bash
# Tunnel watcher: probe the TPU until it answers, then run the full
# round-4 measurement chain unattended.  Logs to runs/round4/watch.log.
#     nohup bash tools/round4_watch.sh > /dev/null 2>&1 & echo $! > /tmp/watch.pid
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/round4
W=runs/round4/watch.log

wlog() { echo "[$(date +%H:%M:%S)] $*" >> "$W"; }

wlog "watcher started (pid $$)"
while true; do
    if timeout 90 python - >> "$W" 2>&1 <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((128, 128), jnp.bfloat16)
(x @ x).block_until_ready()
print("probe ok:", jax.devices())
EOF
    then
        wlog "TUNNEL UP — starting round4_hw.sh"
        break
    fi
    wlog "tunnel still down; sleeping 120s"
    sleep 120
done

bash tools/round4_hw.sh >> "$W" 2>&1
wlog "round4_hw.sh finished (rc=$?)"

wlog "=== quality A/B: direct + shift arms ==="
timeout 14400 python tools/quality_ab.py --epochs 6 --arms direct shift \
    >> runs/round4/quality_ab.log 2>&1
wlog "quality_ab arms rc=$?"
timeout 600 python tools/quality_ab.py --summarize-only \
    >> runs/round4/quality_ab.log 2>&1
wlog "quality_ab summarize rc=$?"

wlog "=== int8 10s serving re-A/B ==="
timeout 3600 python tools/bench_int8.py > runs/round4/int8.log 2>&1
wlog "int8 rc=$?"

touch runs/round4/ALL_DONE
wlog "chain complete"
