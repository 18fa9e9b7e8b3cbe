"""Headless multi-env (RL-batch) runner — the config-E surface as a demo.

Builds N independent pile envs, concatenates them into ONE band-grid
mega-scene (parallel/envs.py — the measured-fastest way to batch envs on
a single chip, BASELINE.md config E), rolls it out in chunks, and
reports per-env statistics from the single device-resident state.

Examples:
  python demos/run_envs.py --envs 16 --boxes 64 --steps 200
  python demos/run_envs.py --envs 64 --boxes 250 --steps 100 --cpu
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=16)
    ap.add_argument("--boxes", type=int, default=64)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--chunk", type=int, default=50,
                    help="frames per device dispatch")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (the env-var route is "
                         "consumed by this stack's sitecustomize)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from bench import build_envs
    from phyx_tpu.parallel.envs import concat_envs, env_positions
    from phyx_tpu import scenes
    from phyx_tpu.step import rollout

    # build through the same band-grid policy the bench uses, but keep
    # the env slices/offsets for per-env readback
    cfg, _ = build_envs(args.envs, args.boxes, "pallas")
    builders = [scenes.pile(cfg, args.boxes, seed=s, ground_half=30.0)
                for s in range(args.envs)]
    y_bands = 8 if args.envs >= 64 else 1
    mega, env_slices, offsets = concat_envs(
        builders, cfg, band_width=80.0, y_bands=y_bands, band_height=400.0)
    st = mega.build()

    t0 = time.perf_counter()
    done = 0
    while done < args.steps:
        n = min(args.chunk, args.steps - done)
        st = rollout(st, cfg, n)
        done += n
        s = st.stats
        print(f"frame {done}: contacts {int(s.num_contacts)} "
              f"overflow {int(s.pair_overflow)} "
              f"penetration {float(s.max_penetration):.3f} "
              f"({time.perf_counter() - t0:.1f}s)")

    # per-env readback: env-local positions (offsets subtracted)
    pos = env_positions(st, env_slices, offsets)
    heights = [float(p[:, 1].max()) for p in pos]
    print(f"per-env max height: min {min(heights):.2f} "
          f"median {sorted(heights)[len(heights)//2]:.2f} "
          f"max {max(heights):.2f}")
    vel = np.asarray(st.bodies.vel)
    print(f"batch settled: max|vel| {np.abs(vel).max():.3f}")


if __name__ == "__main__":
    main()
