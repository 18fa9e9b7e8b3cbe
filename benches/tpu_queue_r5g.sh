#!/bin/bash
# Round-5 queue G: the grid fence said the scanned-window XLA sweep does
# settled E in 32-37 ms vs 184 ms for the serial kernel path — but E's
# 1024-pile tail spills the per-body hit slots (H=8 drops 14224 hits,
# H=12 drops 10160; the 10k pile's H=8 never spills).  Find the valid H,
# then measure the full grid-E bench row at a safe setting.
LOG=${LOG:-/root/repo/BENCH_QUEUE_r5.log}
TTL=${QUEUE_TTL:-14400}
# absolute cap: the driver's round-end bench proceeds UNSERIALIZED after
# a 240 s lock wait (~17:05 UTC today); stop early so it never collides
# with a mid-flight mega-scene program (CLAUDE.md rule 5).
CAP=$(( $(date -d "2026-08-20 16:40 UTC" +%s) - $(date +%s) ))
[ "$CAP" -lt 300 ] && CAP=300
[ "$TTL" -gt "$CAP" ] && TTL=$CAP
T0=$(date +%s)
cd "$(dirname "$0")/.."
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
  timeout "$budget" "$@" 2>&1 | grep -v "cpu_aot_loader" | tail -14 | tee -a "$LOG"
}

say "queue r5g start (TTL ${TTL}s) — grid H sweep + safe grid-E row @ $(git rev-parse --short HEAD)"

# 1. H sweep at w=384 (384 showed ovf_window 0): find the parity H.
item 3900 "micro: sap_grid H=16/20/24 legs @ settled E" \
  env PHYX_GRID_LEGS="384:16,384:20,384:24" \
  python benches/micro_broadphase_e.py --grid

# 2. Safe grid-E bench row: w=448 (1.17x the 384 that read ovf_w 0),
#    H=24.  If valid AND faster than the serial-sweep row, this is the
#    new ungated-E headline.
item 2700 "config E 1024 envs UNGATED, sap_grid w=448 H=24" \
  python bench.py --scene envs --envs 1024 --boxes 256 --steps 2 \
    --settle 240 --broadphase sap_grid --sap-window 448 --sap-hits 24

# 3. Gated twin of the same config (the permanent preset row on the
#    grid pipeline, if 2 is valid).
item 2700 "config E 1024 envs velocity gate 1e-2, sap_grid w=448 H=24" \
  python bench.py --scene envs --envs 1024 --boxes 256 --steps 2 \
    --settle 240 --broadphase sap_grid --sap-window 448 --sap-hits 24 \
    --rel-tol 1e-2

say "queue r5g done (terminal marker)"
