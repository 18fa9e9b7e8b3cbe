#!/bin/bash
# Round-5 queue D: slab-major tiled pipeline (tiled_routing=True) —
# runs AFTER the ungated-E decision leg (launched standalone 08:08).
# Serial, TTL-bounded (CLAUDE.md rule 5; VERDICT r3 weak #1).
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

say "queue r5d start (TTL ${TTL}s) — slab-major tiled pipeline @ $(git rev-parse --short HEAD)"

# 1+2. Permanent gated E rows on the slab-major tree (the ungated row
#      ran standalone).  Round-5 legacy-tree records: 1129.5 / 1350.6.
item 4200 "config E 1024 envs, velocity gate 1e-2 (slab-major)" \
  python bench.py --scene envs --envs 1024 --boxes 256 --steps 2 --settle 240 --rel-tol 1e-2
item 4200 "config E 1024 envs, both gates 1e-2 (slab-major)" \
  python bench.py --scene envs --envs 1024 --boxes 256 --steps 2 --settle 240 --rel-tol 1e-2 --pos-rel-tol 1e-2

# 3. VERDICT r4 #3: gated-vs-ungated trajectory divergence over 500
#    frames at settled E (RMS drift vs chaos-floor control, KE,
#    pair-set churn) — the north-star claim's missing evidence.
item 5400 "divergence: gated-vs-ungated 500 frames @ settled E" \
  python benches/divergence_e.py --envs 1024 --boxes 256 --settle 300 --frames 500 --ckpt 50

# 4. VERDICT r4 #4: 100k avalanche HEAD row (autotuned, quality bar).
item 5400 "100k avalanche autotuned settled (HEAD row + quality)" \
  python bench.py --scene avalanche --boxes 100000 --steps 10 --settle 1000 --autotune

# 5. VERDICT r4 #4: iteration-scaling adjudication probe at 100k.
item 5400 "100k avalanche, position_iterations x2 (adjudication probe)" \
  python benches/avalanche_iters.py

# 6+7. 20k rows ran the legacy tiled path this morning (11.45 / 9.24);
#      re-measure on slab-major (same invocations as the HEAD table).
item 2400 "20k pile (slab-major)" \
  python bench.py --boxes 20000 --steps 50
item 2400 "20k avalanche (slab-major)" \
  python bench.py --scene avalanche --boxes 20000 --steps 10 --settle 300 --autotune

# 8. Gap fence on the new kernel: forced tiled vs streamed @ settled
#    10k, BOTH legs on the tiled sweep's candidate stream so the tiled
#    legs finalize slab-major and run the slab-segmented kernel.
item 5400 "micro: tiled-vs-streamed gap @ 10k (slab-major kernel)" \
  env PHYX_MICRO_BP=sap_tiled python benches/micro_tiled_gap.py

say "queue r5d done (terminal marker)"
