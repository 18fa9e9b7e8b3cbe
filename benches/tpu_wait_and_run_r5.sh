#!/bin/bash
# Round-5 waiter: probe the TPU worker AND its remote-compile service
# every ~2 min; when both answer, run the round-5 queue.
#
# The 2026-08-20 00:00 outage failed with "remote_compile: Connection
# refused" while device init still worked — a cached-compile probe
# (the r3 waiter's fixed matmul) would pass right through that.  This
# probe compiles a UNIQUE shape per attempt (epoch-derived), forcing a
# real remote compile.
LOG=${LOG:-/root/repo/BENCH_QUEUE_r5.log}
cd /root/repo
echo "=== r5 waiter started $(date) ===" >> "$LOG"
while true; do
  K=$(( 8 + ($(date +%s) % 97) * 8 ))
  timeout 240 python - <<EOF >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((8, $K))
y = jnp.ones(($K, 8))
assert float((x @ y).sum()) == 64.0 * $K
EOF
  if [ $? -eq 0 ]; then
    echo "=== TPU+compile UP at $(date) — running queue ===" >> "$LOG"
    bash "${QUEUE:-benches/tpu_queue_r5.sh}"
    echo "=== r5 waiter: queue finished $(date) ===" >> "$LOG"
    exit 0
  fi
  echo "r5 probe failed $(date)" >> "$LOG"
  sleep 110
done
