#!/bin/bash
# Round-5 queue B: window-DMA fence + chunked-sweep A/B.
# Run AFTER tpu_queue_r5.sh.  Items:
#   1. micro_tiled_gap with the 1-slab (window traffic ~0) and
#      halo-inflated (+33% window rows/pass) legs — fences whether the
#      residual tiled-vs-streamed gap is synchronous window DMA.
#   2. settled E ungated on the chunked-sweep tree (queue A item 2 ran
#      before the sweep chunking landed iff its process predates the
#      commit — this is the same-session A/B either way).
LOG=${LOG:-/root/repo/BENCH_QUEUE_r5.log}
TTL=${QUEUE_TTL:-10800}
T0=$(date +%s)
cd /root/repo
say() { echo "=== $* ($(date)) ===" | tee -a "$LOG"; }
left() { echo $(( TTL - ($(date +%s) - T0) )); }
item() {
  local budget=$1; shift
  local label=$1; shift
  if [ "$(left)" -lt "$budget" ]; then
    say "SKIP (TTL: $(left)s left < ${budget}s): $label"
    return
  fi
  say "$label"
  timeout "$budget" "$@" 2>&1 | grep -v "cpu_aot_loader" | tail -12 | tee -a "$LOG"
}

say "queue r5b start (TTL ${TTL}s) — window fence + chunked sweep"

item 4800 "micro: tiled gap w/ 1-slab + inflated-halo legs" \
  python benches/micro_tiled_gap.py

say "queue r5b done (terminal marker)"
