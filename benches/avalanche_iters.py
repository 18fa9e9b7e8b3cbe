"""100k-avalanche penetration adjudication (VERDICT r4 #4 / weak #4).

The settled 100k avalanche ships penetration ~0.86 (1.72 box-halves).
Question: is that load-inherent (a ~224-deep wedge's bottom contacts
carry ~224 box weights; finite iterations leave load-proportional
penetration — the oracle shows the same at equivalent depth, see
benches/oracle_depth.py) or solver-fixable (more displacement passes
would reclaim it)?

Probe: settle once (autotuned, frame --settle), then run --frames more
under position_iterations x1 / x2 / x4 from the SAME state and compare
settled penetration.  If doubling iterations barely moves it, the
pressure is load-inherent at this depth; if it halves, the fixed 6
passes are the binding constraint and the quality bar should say so.

Each distinct config is its own jit compile (minutes, then cached).
"""

from __future__ import annotations

import argparse
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from bench import acquire_tpu_lock, build  # noqa: E402
from phyx_tpu.step import rollout  # noqa: E402
from phyx_tpu.tune import rollout_autotuned  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--boxes", type=int, default=100000)
    ap.add_argument("--settle", type=int, default=1000)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--sap-window", type=int, default=192,
                    help="starting sweep window — pass the known-settled "
                         "value (760-832 at 100k) so rollout_autotuned "
                         "does not retune+recompile mid-settle (each "
                         "mega-scale recompile is minutes; the 2026-08-20 "
                         "r5d run TTL'd out on two of them)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        acquire_tpu_lock()

    cfg, st = build("avalanche", args.boxes, "pallas",
                    sap_window=args.sap_window)
    st, cfg = rollout_autotuned(st, cfg, args.settle, chunk=10)
    float(st.stats.residual)
    print(json.dumps({
        "stage": "settled", "frame": args.settle,
        "pen": float(st.stats.max_penetration),
        "contacts": int(st.stats.num_contacts),
        "overflow": int(st.stats.pair_overflow)}), flush=True)

    for mult in (1, 2, 4):
        c2 = cfg.replace(position_iterations=cfg.position_iterations * mult)
        cur = st
        for _ in range(-(-args.frames // 10)):
            cur = rollout(cur, c2, 10)
        float(cur.stats.residual)
        print(json.dumps({
            "stage": f"pos_iters_x{mult}",
            "position_iterations": c2.position_iterations,
            "frames": args.frames,
            "pen": float(cur.stats.max_penetration),
            "pen_ratio_boxhalves": round(
                float(cur.stats.max_penetration) / 0.5, 4),
            "residual": float(cur.stats.residual),
            "contacts": int(cur.stats.num_contacts),
            "overflow": int(cur.stats.pair_overflow)}), flush=True)


if __name__ == "__main__":
    main()
