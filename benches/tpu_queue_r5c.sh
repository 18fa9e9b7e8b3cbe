#!/bin/bash
# Round-5 queue C: kernel-only A/B attribution.  Run AFTER tpu_queue_r5.sh.
#
# micro_kernel_ab times solve_contacts_streamed vs solve_contacts_tiled
# on identical PRE-ROUTED inputs (lax.scan chaining the body buffer) —
# the first fence that separates the tiled kernel's internal cost from
# its XLA-side routing prep (rank/routing/unroute sorts), which every
# whole-step fence to date has conflated.  Decides whether the residual
# tiled gap (post window fence) is kernel or prep.
LOG=${LOG:-/root/repo/BENCH_QUEUE_r5.log}
TTL=${QUEUE_TTL:-7200}
T0=$(date +%s)
cd /root/repo
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
  timeout "$budget" "$@" 2>&1 | grep -v "cpu_aot_loader" | tail -12 | tee -a "$LOG"
}

say "queue r5c start (TTL ${TTL}s) — kernel-only A/B"

item 5400 "micro: kernel-only streamed-vs-tiled A/B @ settled 10k" \
  python benches/micro_kernel_ab.py

say "queue r5c done (terminal marker)"
