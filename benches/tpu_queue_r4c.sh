#!/bin/bash
# Round-4c TPU queue: post gather-free-routing measurements.  The tiled
# solve path's routing/un-routing (slot layout, accumulator un-route,
# body embed/un-embed) moved from row-serialized gathers/scatters to
# carry-through sorts + static/contiguous slices.  Physics must be
# BIT-IDENTICAL: compare every stats field against the r4b rows.
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
  timeout "$budget" "$@" 2>&1 | tail -9 | tee -a "$LOG"
}

say "queue r4c start (TTL ${TTL}s) — gather-free tiled routing"

# was 758.3 post-skip; stats must be bit-identical (contacts 823080,
# pairs 453429, penetration 0.012642592191696167)
item 4200 "config E 1024 envs, banded (gather-free routing)" \
  python bench.py --scene envs --envs 1024 --boxes 256 --steps 2 --settle 240

# stage attribution: solve was 953.0, build_cache 137.7 (the un-route
# gathers hid in build_cache via prefix DCE)
item 4200 "config E profile (1024 envs, reps=1, gather-free routing)" \
  python benches/profile_envs.py --envs 1024 --settle 240

# was 927.1 / 1068.6 post-skip
item 4200 "config E 1024 envs, banded + velocity gate 1e-2 (gather-free)" \
  python bench.py --scene envs --envs 1024 --boxes 256 --steps 2 --settle 240 --rel-tol 1e-2

item 4200 "config E 1024 envs, banded + both gates 1e-2 (gather-free)" \
  python bench.py --scene envs --envs 1024 --boxes 256 --steps 2 --settle 240 --rel-tol 1e-2 --pos-rel-tol 1e-2

# 20k pile runs the tiled path at ~131k contact slots (carry ties or
# wins gather at >=16k rows per the 5-shape fence); was 9.90
item 2400 "20k pile (gather-free routing)" python bench.py --boxes 20000 --steps 50

# forced-tiled micro at 10k shapes — fence the small-shape end
item 3000 "micro: tiled-vs-streamed gap @ 10k (gather-free)" \
  python benches/micro_tiled_gap.py

say "queue r4c done (terminal marker)"
