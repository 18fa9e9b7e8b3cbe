"""Bench harness: steps/sec on the 10k-box pile (BASELINE.json primary metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured steps/sec divided by the north-star target of
1,000 steps/sec @ 10k-box pile (BASELINE.json:5) — the reference itself
published no numbers (BASELINE.md).

Usage: python bench.py [--boxes N] [--steps N] [--scene pile|avalanche]
"""

from __future__ import annotations

import argparse
import json
import time

import jax

from phyx_tpu import scenes
from phyx_tpu.config import SimConfig
from phyx_tpu.step import step

NORTH_STAR_STEPS_PER_SEC = 1000.0


def build(scene: str, boxes: int):
    cap = 1
    while cap < boxes + 8:
        cap *= 2
    cfg = SimConfig(
        max_bodies=cap,
        max_pairs=max(4096, boxes * 8),
        broadphase="sap",
        sap_window=32,
        num_colors=24,
    )
    sb = getattr(scenes, scene)(cfg, boxes, seed=0)
    return cfg, sb.build()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--boxes", type=int, default=10000)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--scene", default="pile", choices=["pile", "avalanche"])
    args = ap.parse_args()

    cfg, st = build(args.scene, args.boxes)

    # compile + warmup (also lets the pile form its contact network)
    st = step(st, cfg)
    jax.block_until_ready(st)
    for _ in range(args.warmup):
        st = step(st, cfg)
    jax.block_until_ready(st)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        st = step(st, cfg)
    jax.block_until_ready(st)
    dt = time.perf_counter() - t0

    steps_per_sec = args.steps / dt
    # secondary metric: contact pair-impulse iterations / sec / chip
    ncontacts = int(st.stats.num_contacts)
    pair_iters = steps_per_sec * ncontacts * cfg.velocity_iterations

    print(json.dumps({
        "metric": f"steps/sec @ {args.boxes}-box {args.scene}",
        "value": round(steps_per_sec, 2),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / NORTH_STAR_STEPS_PER_SEC, 4),
        "extra": {
            "contacts": ncontacts,
            "pairs": int(st.stats.num_pairs),
            "pair_overflow": int(st.stats.pair_overflow),
            "pair_impulse_iters_per_sec": round(pair_iters),
            "max_penetration": float(st.stats.max_penetration),
            "residual": float(st.stats.residual),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
