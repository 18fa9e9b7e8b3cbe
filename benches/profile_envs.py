"""Config-E (mega-scene) per-stage attribution — VERDICT r2 #9.

Profiles the 1024-env x 256-box mega-scene (262k bodies, tiled solver +
tiled sweep — the SAME code path as the at-spec 4096-env row, 1/4 size)
with ``profile_step(reps=1)``.

Why 1024 and reps=1: a reps=2 profile at 1.05M bodies produced a ~20 s
device program that KILLED the remote TPU worker (2026-08-17, CLAUDE.md
rule 5); at 262k bodies every prefix program stays under ~3 s.  Per-stage
costs at this scale are seconds, so single-shot deltas are far above the
timing noise floor (~10 ms).

Settling runs in 2-step rollout chunks (config-E rule: a 5-step program
at mega-scale trips the watchdog).

Usage: python benches/profile_envs.py [--envs 1024] [--boxes 256]
                                      [--settle 240] [--reps 1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")


def main():
    from bench import acquire_tpu_lock
    acquire_tpu_lock()
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--boxes", type=int, default=256)
    ap.add_argument("--settle", type=int, default=240)
    ap.add_argument("--chunk", type=int, default=2)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--no-band", action="store_true")
    ap.add_argument("--segsort", action="store_true")
    args = ap.parse_args()

    from bench import build_envs
    from phyx_tpu.profiling import profile_step
    from phyx_tpu.step import rollout

    cfg, st = build_envs(args.envs, args.boxes, "pallas",
                         band=not args.no_band, segsort=args.segsort)
    print(f"# built {args.envs} x {args.boxes}: cap {cfg.max_bodies} "
          f"max_pairs {cfg.max_pairs}", file=sys.stderr)

    t0 = time.perf_counter()
    done = 0
    while done < args.settle:
        st = rollout(st, cfg, args.chunk)
        done += args.chunk
        if done % 40 == 0:
            # fence + progress (a live scalar fetch, not block_until_ready)
            print(f"# settle {done}/{args.settle} "
                  f"contacts {int(st.stats.num_contacts)} "
                  f"overflow {int(st.stats.pair_overflow)} "
                  f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr)
    print(f"# settled: contacts {int(st.stats.num_contacts)} "
          f"pairs {int(st.stats.num_pairs)} "
          f"penetration {float(st.stats.max_penetration):.3f}",
          file=sys.stderr)

    rows = profile_step(st, cfg, reps=args.reps)
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
