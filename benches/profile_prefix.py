"""CLI for the per-stage prefix profiler (now a library facility:
phyx_tpu/profiling.py — see its docstring for the measurement protocol).

Usage: python benches/profile_prefix.py [boxes] [backend] [reps]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

from phyx_tpu import scenes
from phyx_tpu.config import SimConfig
from phyx_tpu.profiling import profile_step
from phyx_tpu.step import rollout

BOXES = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
BACKEND = sys.argv[2] if len(sys.argv) > 2 else "pallas"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 100

cap = 1
while cap < BOXES + 8:
    cap *= 2
cfg = SimConfig(max_bodies=cap,
                max_pairs=max(1024, (BOXES * 4 + 511) // 512 * 512),
                broadphase="sap", sap_window=96, solver_backend=BACKEND)
st0 = scenes.pile(cfg, BOXES, seed=0).build()
st0 = rollout(st0, cfg, 300)    # settle: realistic contact network
float(st0.stats.residual)       # fence

print(f"boxes={BOXES} backend={BACKEND} cap={cap} pairs_cap={cfg.max_pairs}")
for row in profile_step(st0, cfg, reps=REPS):
    cum = f"   (cum {row['cum_ms']:8.3f})" if "cum_ms" in row else ""
    print(f"{row['stage']:24s} {row['ms']:8.3f} ms{cum}")
