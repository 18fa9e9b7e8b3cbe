#!/bin/bash
# Round-5 queue F: the 100k rows that TTL'd out of r5d — the autotune
# retunes (window 192->504->760) forced two mega-scale recompiles and
# the 90-min item budget died before the measurement printed.  Fix:
# start at the known-settled window (760) so no retune fires; autotune
# stays on as the safety net only.
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

say "queue r5f start (TTL ${TTL}s) — 100k HEAD + adjudication @ $(git rev-parse --short HEAD)"

# 0. Ungated E on the post-routing-fix tree (08d5030): quantifies the
#    compaction-first finalize at E vs the 927.26 of the full-buffer
#    routing tree (c16cffb/e833576, measured 08:32 today).
item 2700 "config E 1024 envs UNGATED (routing-fix tree)" \
  python bench.py --scene envs --envs 1024 --boxes 256 --steps 2 --settle 240

# 1. 100k avalanche HEAD row (VERDICT r4 #4): fixed pre-sized window,
#    autotune as safety net (window 760 = today's final retune value).
item 4500 "100k avalanche settled HEAD row (window 760, autotune net)" \
  python bench.py --scene avalanche --boxes 100000 --steps 10 \
    --settle 1000 --sap-window 760 --autotune

# 2. Iteration-scaling adjudication at 100k (VERDICT r4 #4): does
#    doubling position iterations move the settled penetration?
item 4200 "100k position_iterations x1/x2/x4 probe (window 760)" \
  python benches/avalanche_iters.py --sap-window 760

say "queue r5f done (terminal marker)"
