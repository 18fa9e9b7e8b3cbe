#!/bin/bash
# Session-3 TPU measurement queue — run when the worker recovers.
# Serial by design: ONE TPU process at a time (CLAUDE.md rule 5).
# Each step is independently timeout'd; output accumulates in $LOG.
LOG=${LOG:-/root/repo/BENCH_QUEUE_r3.log}
cd /root/repo
say() { echo "=== $* ($(date)) ===" | tee -a "$LOG"; }

say "sanity: tiny bench (compile-cache warm, physics stats)"
timeout 1500 python bench.py --boxes 200 --steps 20 --settle 40 2>&1 | tail -3 | tee -a "$LOG"

say "10k pile headline (packed sorts)"
timeout 2400 python bench.py 2>&1 | tail -2 | tee -a "$LOG"

say "1k pile"
timeout 1200 python bench.py --boxes 1000 --steps 200 2>&1 | tail -2 | tee -a "$LOG"

say "chain 1000"
timeout 1200 python bench.py --scene chain --boxes 1000 --steps 200 2>&1 | tail -2 | tee -a "$LOG"

say "20k pile"
timeout 2400 python bench.py --boxes 20000 --steps 50 2>&1 | tail -2 | tee -a "$LOG"

say "micro: packed vs multi-key sorts"
timeout 1800 python benches/micro_sort_pack.py 2>&1 | tail -6 | tee -a "$LOG"

say "config E profile (1024 envs, reps=1, banded default)"
timeout 4800 python benches/profile_envs.py --envs 1024 --settle 240 2>&1 | tail -14 | tee -a "$LOG"

say "config E profile (1024 envs, reps=1, --no-band ablation)"
timeout 4800 python benches/profile_envs.py --envs 1024 --settle 240 --no-band 2>&1 | tail -14 | tee -a "$LOG"

say "micro: flat vs banded sort (config E segmented-sort experiment)"
timeout 1800 python benches/micro_banded_sort.py 2>&1 | tail -8 | tee -a "$LOG"

say "100k avalanche --autotune to settled frame 1000 (VERDICT r2 #5 full criterion)"
timeout 5400 python bench.py --scene avalanche --boxes 100000 --steps 10 \
    --settle 1000 --autotune 2>&1 | tail -3 | tee -a "$LOG"

say "queue done"
