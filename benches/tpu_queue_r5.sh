#!/bin/bash
# Round-5 TPU measurement queue.  Serial (ONE TPU process at a time,
# CLAUDE.md rule 5), TTL-bounded (a queue holding the TPU lock must
# never starve the driver's round-end bench — VERDICT r3 weak #1).
#
#   QUEUE_TTL   seconds the whole queue may run (default 14400)
#   LOG         append-target (default BENCH_QUEUE_r5.log)
#
# Session A (post walk-rewrite): items 1-5 decide VERDICT r4 #1;
# items 6-8 attribute/adjudicate; items 9-12 refresh the HEAD table.
LOG=${LOG:-/root/repo/BENCH_QUEUE_r5.log}
TTL=${QUEUE_TTL:-14400}
T0=$(date +%s)
cd /root/repo
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
  timeout "$budget" "$@" 2>&1 | grep -v "cpu_aot_loader" | tail -12 | tee -a "$LOG"
}

say "queue r5 start (TTL ${TTL}s) — incremental-walk tiled kernel"

# 1. VERDICT r4 #1 decision micro — RAN 2026-08-19 23:10 (log above):
#    streamed 37.01, tiled 2-slab 41.03 (+6.1 ns/visit, was +7.4),
#    9-slab 41.99.  The remaining-gap fence (1-slab zero-window-traffic
#    leg + halo-inflated leg) runs as the LAST item below, after the
#    headline rows.
SKIP_ITEM1=${SKIP_ITEM1:-1}
if [ "$SKIP_ITEM1" != "1" ]; then
item 3600 "micro: tiled-vs-streamed gap @ 10k (incremental walk)" \
  python benches/micro_tiled_gap.py
fi

# 1b. Seconds-long probe: HBM<->SMEM DMA bandwidth at window-sized
#     transfers + SMEM->SMEM feasibility (prices the window-DMA
#     hypothesis before the item-13 fence; informs the overlap design).
item 900 "probe: SMEM copy bandwidth (window-sized)" \
  python benches/probe_smem_copy.py

# 2. Settled E ungated headline.  Round-4 record: 867.2 env-steps/s,
#    contacts 823080, pairs 453429, penetration 0.012642592191696167 —
#    stats MUST be bit-identical (the walk visits the same live blocks
#    in the same order).
item 4200 "config E 1024 envs, ungated (incremental walk)" \
  python bench.py --scene envs --envs 1024 --boxes 256 --steps 2 --settle 240

# 3+4. The PERMANENT gated rows (VERDICT r4 #3): velocity preset and
#      both-gates, re-measured every round alongside the ungated
#      headline.  Round-4: 1079.7 / 1279.1.
item 4200 "config E 1024 envs, velocity gate 1e-2 (rl_preset row)" \
  python bench.py --scene envs --envs 1024 --boxes 256 --steps 2 --settle 240 --rel-tol 1e-2
item 4200 "config E 1024 envs, both gates 1e-2" \
  python bench.py --scene envs --envs 1024 --boxes 256 --steps 2 --settle 240 --rel-tol 1e-2 --pos-rel-tol 1e-2

# 5. 20k pile: tiled path, round-4 record 11.18 (same-session 9.90 base)
item 2400 "20k pile (incremental walk)" python bench.py --boxes 20000 --steps 50

# 5b (was 13). Window-DMA fence: 1-slab leg (window loads ONCE under
#     the slab-change-only rule -> residual gap = pure per-block/visit)
#     and halo-inflated leg (+33% window rows/pass at the same slab
#     count -> slope gives the synchronous window DMA cost).  Runs
#     right after the headline rows: it DECIDES which kernel rework
#     (window overlap vs switch-free phase walk) this session builds.
item 4800 "micro: tiled gap w/ 1-slab + inflated-halo window fence" \
  python benches/micro_tiled_gap.py

# 6. VERDICT r4 #2: broadphase intra-stage attribution at settled E
item 4200 "micro: broadphase E ablation (sort/sweep/exact-x/finalize)" \
  python benches/micro_broadphase_e.py --envs 1024 --settle 240

# 7. VERDICT r4 #3: trajectory divergence, gated vs ungated vs
#    perturbation chaos floor, 500 frames from one settled state
item 5400 "divergence: gated-vs-ungated 500 frames @ settled E" \
  python benches/divergence_e.py --envs 1024 --boxes 256 --settle 300 --frames 500 --ckpt 50

# 8. VERDICT r4 #4: 100k avalanche quality adjudication — HEAD row
#    (quality verdict now in bench extra) and the iteration-scaling
#    probe (is the 0.86 penetration fixable by more position passes?)
item 5400 "100k avalanche autotuned settled (HEAD row + quality)" \
  python bench.py --scene avalanche --boxes 100000 --steps 10 --settle 1000 --autotune
item 5400 "100k avalanche, position_iterations x2 (adjudication probe)" \
  python benches/avalanche_iters.py

# 9-12. Current-HEAD table refresh (VERDICT r4 #7): same-session rows
item 2400 "10k pile (HEAD row; streamed path untouched)" \
  python bench.py --boxes 10000 --steps 100
item 1800 "1k pile (HEAD row)" python bench.py --boxes 1000 --steps 200 --settle 400
item 1800 "1000-link chain (HEAD row)" python bench.py --scene chain --boxes 1000 --steps 100
item 2400 "20k avalanche (HEAD row, fixed invocation)" \
  python bench.py --scene avalanche --boxes 20000 --steps 10 --settle 300 --autotune

say "queue r5 done (terminal marker)"
