#!/bin/bash
# Round-5 queue E: scanned-window grid fence at mega scale + r5d
# TTL-skip mop-ups.  Launched by a waiter that greps for r5d's terminal
# marker (one TPU process at a time — CLAUDE.md rule 5).
#
#   QUEUE_TTL   seconds the whole queue may run (default 14400)
#   LOG         append-target (default BENCH_QUEUE_r5.log)
LOG=${LOG:-/root/repo/BENCH_QUEUE_r5.log}
TTL=${QUEUE_TTL:-14400}
T0=$(date +%s)
cd "$(dirname "$0")/.."
say() { echo "=== $* ($(date)) ===" | tee -a "$LOG"; }
left() { echo $(( TTL - ($(date +%s) - T0) )); }
item() {  # item <seconds-budget> <label> <cmd...>
  local budget=$1; shift
  local label=$1; shift
  if [ "$(left)" -lt "$budget" ]; then
    say "SKIP (TTL: $(left)s left < ${budget}s): $label"
    return
  fi
  say "$label"
  timeout "$budget" "$@" 2>&1 | grep -v "cpu_aot_loader" | tail -14 | tee -a "$LOG"
}

say "queue r5e start (TTL ${TTL}s) — grid fence + mop-ups @ $(git rev-parse --short HEAD)"

# 0. r5d item 1 retry: died on a transient FAILED_PRECONDITION at
#    09:09 (worker still recovering from the 08:32 run); the permanent
#    gated row needs a slab-major measurement.
item 4200 "config E 1024 envs, velocity gate 1e-2 (slab-major, retry)" \
  python bench.py --scene envs --envs 1024 --boxes 256 --steps 2 \
    --settle 240 --rel-tol 1e-2

# 1. VERDICT r4 #2 follow-through: can the scanned-window XLA grid
#    displace the 161 ms serial sweep walk at settled E?  Three
#    (window, hits) legs with pair/ovf parity vs the shipped tiled sweep.
item 5400 "micro: banded sap_grid vs tiled sweep @ settled E" \
  python benches/micro_broadphase_e.py --grid

# 2. Grid-E bench row (slab-major routing rides the grid too — pair
#    buffer is bit-identical to the tiled sweep's, tests/test_tiled_solver
#    test_grid_slab_major_matches_tiled_slab_major): only meaningful if
#    leg 1 shows the grid cheaper; quality dict adjudicates validity.
item 4200 "config E 1024 envs UNGATED, sap_grid w=512 H=12" \
  python bench.py --scene envs --envs 1024 --boxes 256 --steps 2 \
    --settle 240 --broadphase sap_grid --sap-window 512 --sap-hits 12

# 3+4+5. r5d TTL-skip mop-ups (same invocations).
item 2400 "20k pile (slab-major)" \
  python bench.py --boxes 20000 --steps 50
item 2400 "20k avalanche (slab-major)" \
  python bench.py --scene avalanche --boxes 20000 --steps 10 --settle 300 --autotune
item 5400 "micro: tiled-vs-streamed gap @ 10k (slab-major kernel)" \
  env PHYX_MICRO_BP=sap_tiled python benches/micro_tiled_gap.py

say "queue r5e done (terminal marker)"
