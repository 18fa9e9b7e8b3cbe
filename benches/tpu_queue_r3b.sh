#!/bin/bash
# Session-4 resumed TPU queue: the items the 2026-08-18 12:52 VM stop cut
# off (BENCH_QUEUE_r3.log has the headline rows already).  Serial by
# design: ONE TPU process at a time (CLAUDE.md rule 5).  Ordered cheap
# decision-records first so a mid-queue outage still lands them.
LOG=${LOG:-/root/repo/BENCH_QUEUE_r3.log}
cd /root/repo
say() { echo "=== $* ($(date)) ===" | tee -a "$LOG"; }

say "sanity: tiny bench (compile-cache warm)"
timeout 1500 python bench.py --boxes 200 --steps 20 --settle 40 2>&1 | tail -2 | tee -a "$LOG"

say "micro: packed vs multi-key sorts (import fixed)"
timeout 1800 python benches/micro_sort_pack.py 2>&1 | tail -6 | tee -a "$LOG"

say "micro: flat vs banded sort (config E segmented-sort experiment)"
timeout 1800 python benches/micro_banded_sort.py 2>&1 | tail -8 | tee -a "$LOG"

say "100k avalanche --autotune to settled frame 1000 (VERDICT r2 #5 full criterion)"
timeout 5400 python bench.py --scene avalanche --boxes 100000 --steps 10 \
    --settle 1000 --autotune 2>&1 | tail -3 | tee -a "$LOG"

say "config E profile (1024 envs, reps=1, banded default)"
timeout 4800 python benches/profile_envs.py --envs 1024 --settle 240 2>&1 | tail -14 | tee -a "$LOG"

say "config E profile (1024 envs, reps=1, --no-band ablation)"
timeout 4800 python benches/profile_envs.py --envs 1024 --settle 240 --no-band 2>&1 | tail -14 | tee -a "$LOG"

say "checkpoint: r3b core items done"

say "config E profile (1024 envs, reps=1, banded + SEGMENTED sorts)"
timeout 4800 python benches/profile_envs.py --envs 1024 --settle 240 --segsort 2>&1 | tail -14 | tee -a "$LOG"

say "checkpoint: r3b segsort item done"

say "10k pile re-bench (carry-thru sorts + id-emitting tiled kernel tree)"
timeout 2400 python bench.py 2>&1 | tail -2 | tee -a "$LOG"

say "20k pile re-bench (same tree)"
timeout 2400 python bench.py --boxes 20000 --steps 50 2>&1 | tail -2 | tee -a "$LOG"

say "envs 1024 bench: banded flat vs segsort (wall-clock accept/reject)"
timeout 4800 python bench.py --scene envs --envs 1024 --boxes 256 --steps 2 --settle 240 2>&1 | tail -2 | tee -a "$LOG"
timeout 4800 python bench.py --scene envs --envs 1024 --boxes 256 --steps 2 --settle 240 --segsort 2>&1 | tail -2 | tee -a "$LOG"

say "checkpoint: r3b session-4 additions done"

say "micro: compaction gather/scatter vs carried sorts (session-4 candidate)"
timeout 1800 python benches/micro_compaction.py 2>&1 | tail -5 | tee -a "$LOG"

say "queue r3b done (terminal marker)"
