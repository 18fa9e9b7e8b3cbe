"""Fenced per-stage breakdown of the default 10k bench config.

Reproduces the BASELINE.md per-step cost table with one library call
(phyx_tpu.profiling.profile_step) on the settled 10k pile at the bench
defaults (sap_grid w=192, 3.2x pair budget, pallas backend).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build
from phyx_tpu.profiling import profile_step
from phyx_tpu.step import rollout


def main():
    from bench import acquire_tpu_lock
    acquire_tpu_lock()
    cfg, st = build("pile", 10000, "pallas", "sap_grid", 192, 8)
    # settle to the contact-rich state the bench measures
    for _ in range(3):
        st = rollout(st, cfg, 100)
    float(st.stats.residual)
    rows = profile_step(st, cfg, reps=50)
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
