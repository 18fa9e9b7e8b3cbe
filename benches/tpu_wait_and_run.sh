#!/bin/bash
# Probe the TPU worker every ~2 min; when a tiny device program succeeds,
# run the session-3 measurement queue (benches/tpu_queue.sh).
# Probe is a separate subprocess with a hard timeout so a hanging PJRT
# init can never wedge this waiter (CLAUDE.md rule 8).
LOG=${LOG:-/root/repo/BENCH_QUEUE_r3.log}
cd /root/repo
echo "=== waiter started $(date) ===" >> "$LOG"
while true; do
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((8, 8))
assert float((x @ x).sum()) == 512.0
EOF
  if [ $? -eq 0 ]; then
    echo "=== TPU UP at $(date) — running queue ===" >> "$LOG"
    bash "${QUEUE:-benches/tpu_queue.sh}"
    echo "=== queue finished $(date) ===" >> "$LOG"
    exit 0
  fi
  echo "probe failed $(date)" >> "$LOG"
  sleep 110
done
