#!/bin/bash
# Concurrent-serving measurement (VERDICT r4 item 3): boots the v1
# server with the load-tuned knobs, waits for warmup, drives N clients
# with long-poll status, prints the one-line bench JSON plus the
# server's per-drain breakdown (IPC_TPU_BATCH_DEBUG), then kills the
# server via the chiplock registry (never leaves a resident holder —
# CLAUDE.md single-holder rule).
#
# Usage: tools/serving_experiment.sh [clients] [jobs] [window_ms] [depth]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
CLIENTS=${1:-12}
JOBS=${2:-72}
WINDOW=${3:-60}
DEPTH=${4:-3}
OUT=/tmp/serving_exp
rm -rf "$OUT"; mkdir -p "$OUT"

# Preflight: evict any resident holder first (exact pids, registry only).
python - <<'EOF'
from image_to_pointcloud_tpu.utils import chiplock
for h in chiplock.evict_tpu_holders():
    print(f"evicted {h.role} pid{h.pid}")
EOF

IPC_TPU_BATCH_DEBUG=1 IPC_TPU_BATCH_WINDOW_MS=$WINDOW IPC_TPU_DRAIN_DEPTH=$DEPTH \
  IPC_TPU_WARMUP_JPEG_ONLY=1 \
  nohup python -m image_to_pointcloud_tpu.serve --generation v1 --port 8011 \
  --jpeg-device-decode --warmup 518x518 --output-dir "$OUT/outputs" \
  > "$OUT/server.log" 2>&1 &

# Wait for REAL warmup completion ("Warmup complete (N/M signatures)")
# — the bind log line appears immediately and must not end the wait;
# post-kernel-change warmups recompile every signature (minutes each).
for i in $(seq 1 300); do
  sleep 5
  if grep -q "Warmup complete" "$OUT/server.log" 2>/dev/null; then
    if curl -s -m 3 http://127.0.0.1:8011/health >/dev/null; then break; fi
  fi
done
grep -i "warmup\|serving" "$OUT/server.log" | tail -4

python benchmarks/serving_bench.py --url http://127.0.0.1:8011 \
  --clients "$CLIENTS" --jobs "$JOBS" --input jpeg --wait-ms 2000 \
  | tee "$OUT/bench.json"

echo "--- drain breakdown (server log) ---"
grep "drain n=" "$OUT/server.log" | tail -25

# Teardown: registry-based eviction (exact pid).
python - <<'EOF'
from image_to_pointcloud_tpu.utils import chiplock
for h in chiplock.evict_tpu_holders():
    print(f"evicted {h.role} pid{h.pid}")
EOF
