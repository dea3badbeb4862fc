#!/bin/bash
# Round-5 TPU A/B battery (VERDICT r4 items 2 and 5): runs bench.py
# under each knob in one relay window so the arms are comparable
# (CLAUDE.md: TPU numbers are only comparable within a window). Order
# matters — the baseline goes first so the scoreboard record is banked
# before any experimental compile can eat the window.
#
# Usage: tools/ab_battery.sh [out_file]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
OUT=${1:-/tmp/ab_battery.jsonl}
: > "$OUT"

run() {
  local label="$1"; shift
  echo "=== $label ($(date -u +%H:%M:%SZ)) ===" >&2
  local line
  line=$(env "$@" IPC_BENCH_NO_FALLBACK=1 timeout 480 python bench.py 2>/tmp/ab_stderr.log)
  local rc=$?
  if [ $rc -ne 0 ] || [ -z "$line" ]; then
    echo "{\"arm\": \"$label\", \"error\": \"rc=$rc (timeout/stall)\"}" | tee -a "$OUT"
    return 1
  fi
  echo "{\"arm\": \"$label\", \"result\": $line}" | tee -a "$OUT"
}

run baseline \
  && run depth8t IPC_TPU_DEPTH8T=1 \
  && run jpeg_gather IPC_TPU_JPEG_GATHER=1 \
  && run flash_pack2 IPC_TPU_FLASH_PACK=2 \
  && run flash_pack3 IPC_TPU_FLASH_PACK=3

echo "--- summary ---" >&2
cat "$OUT" >&2
