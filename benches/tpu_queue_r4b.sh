#!/bin/bash
# Round-4b TPU queue: post-dead-block-skip measurements.  Serial + TTL
# bounded (VERDICT r3 weak #1 protocol).  Items re-measure exactly the
# rows the skip targets: the tiled-vs-streamed per-visit gap micro and
# settled config E (ungated / velocity-gated / both-gated).
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
  timeout "$budget" "$@" 2>&1 | tail -6 | tee -a "$LOG"
}

say "queue r4b start (TTL ${TTL}s) — post dead-block skip"

# VERDICT r3 weak #5: the gap micro on the skip tree (was +16.3 / +13.4
# ns/visit at 2 / 9 slabs — the settled 10k state is ~69% dead blocks)
item 3600 "micro: tiled-vs-streamed gap @ 10k (post-skip)" \
  python benches/micro_tiled_gap.py

# settled config E on the skip tree (was 718.0 ungated / 888.1 vel-gated
# / 973.9 both-gated; ~75% of E's blocks are dead at the settled state)
item 4800 "config E 1024 envs, banded (post-skip)" \
  python bench.py --scene envs --envs 1024 --boxes 256 --steps 2 --settle 240

item 4800 "config E 1024 envs, banded + velocity gate 1e-2 (post-skip)" \
  python bench.py --scene envs --envs 1024 --boxes 256 --steps 2 --settle 240 --rel-tol 1e-2

item 4800 "config E 1024 envs, banded + both gates 1e-2 (post-skip)" \
  python bench.py --scene envs --envs 1024 --boxes 256 --steps 2 --settle 240 --rel-tol 1e-2 --pos-rel-tol 1e-2

# config E per-stage attribution post-skip (solve was 1028 of 1424 ms)
item 4800 "config E profile (1024 envs, reps=1, post-skip)" \
  python benches/profile_envs.py --envs 1024 --settle 240

say "queue r4b done (terminal marker)"
