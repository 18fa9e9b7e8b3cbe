#!/bin/bash
# Round-4 TPU measurement queue.  Serial by design (ONE TPU process at a
# time, CLAUDE.md rule 5) and TTL-BOUNDED (VERDICT r3 weak #1: a queue
# holding the TPU lock starved the driver's round-end bench into rc 124).
# Every item checks the deadline before starting; when the TTL is spent
# the queue exits, releasing the lock for whoever waits.
#
#   QUEUE_TTL   seconds the whole queue may run (default 7200)
#   LOG         append-target (default BENCH_QUEUE_r4.log)
LOG=${LOG:-/root/repo/BENCH_QUEUE_r4.log}
TTL=${QUEUE_TTL:-7200}
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
  timeout "$budget" "$@" 2>&1 | tail -4 | tee -a "$LOG"
}

say "queue r4 start (TTL ${TTL}s)"

# VERDICT r3 #2 done-criterion run inline 05:50 (718.01 env-steps/s, overflow 0,
# penetration 0.0126) — recorded above in the log; item kept for reruns:
# item 4800 "config E 1024 envs, banded (exact-accept tree)" \
#   python bench.py --scene envs --envs 1024 --boxes 256 --steps 2 --settle 240

# VERDICT r3 #7: segsort accept/reject on VALID physics
item 4800 "config E 1024 envs, banded + segsort" \
  python bench.py --scene envs --envs 1024 --boxes 256 --steps 2 --settle 240 --segsort

# VERDICT r3 #4: tiled residual gates at settled E (accept >= 15% or fence negative)
item 4800 "config E 1024 envs, banded + rel gates 1e-2" \
  python bench.py --scene envs --envs 1024 --boxes 256 --steps 2 --settle 240 --rel-tol 1e-2 --pos-rel-tol 1e-2

item 4800 "config E 1024 envs, banded + velocity gate only 1e-2" \
  python bench.py --scene envs --envs 1024 --boxes 256 --steps 2 --settle 240 --rel-tol 1e-2

# same-session single-scene records (cross-day numbers carry ~5% device
# variance — BASELINE.md round-4 notes)
item 2400 "20k pile" python bench.py --boxes 20000 --steps 50
item 1800 "1k pile" python bench.py --boxes 1000 --steps 200 --settle 400
item 1800 "1000-link chain" python bench.py --scene chain --boxes 1000 --steps 100

# VERDICT r3 #5: tiled solver per-visit gap attribution (streamed vs
# tiled at the SAME settled 10k state, two slab geometries)
item 3600 "micro: tiled-vs-streamed per-visit gap @ 10k" \
  python benches/micro_tiled_gap.py

# config E per-stage attribution on the exact-accept tree (overflow-free
# physics; compares against the round-3 rows in BENCH_QUEUE_r3.log)
item 4800 "config E profile (1024 envs, reps=1, banded exact-accept)" \
  python benches/profile_envs.py --envs 1024 --settle 240

say "queue r4 done (terminal marker)"
