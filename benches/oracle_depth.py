"""Load-inherence probe for deep-stack penetration (VERDICT r4 #4).

The settled 100k avalanche's wedge is ~224 boxes deep and ships
max_penetration ~1.72 box-halves.  Is deep penetration a property of
the ALGORITHM at that load (sequential impulse, fixed iterations, f32)
or a failure of this engine's kernels?  The golden scalar oracle
(phyx_tpu/oracle — loop-faithful f64 sequential impulse) answers on a
single D-deep column: run columns of increasing depth to rest and
report settled penetration.  If the oracle's penetration grows ~with
depth into the same ratio class, the avalanche number is load-inherent;
the engine cannot be asked to beat its own reference algorithm.

Pure CPU/NumPy — no TPU lock needed.

Usage: python benches/oracle_depth.py [--depths 28 56 112 224]
         [--frames 1200] [--pos-iters 6]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from phyx_tpu.config import SimConfig  # noqa: E402
from phyx_tpu.oracle.engine import OracleWorld  # noqa: E402


def settled_penetration(depth: int, frames: int, pos_iters: int,
                        box_half: float = 0.5, width: int = 3) -> dict:
    """A WALLED silo of width x depth boxes: laterally confined like the
    avalanche wedge's interior (a free-standing 1-wide column just tips
    over and reads slop-level penetration with boxes in flight)."""
    n = width * depth
    cfg = SimConfig(max_bodies=n + 8, max_pairs=8 * n + 64,
                    broadphase="n2", position_iterations=pos_iters)
    w = OracleWorld(cfg)
    w.add_box((0.0, -1.0), (10.0, 1.0), density=1.0, friction=0.5,
              static=True)
    wall_x = width * box_half + 0.02
    wall_h = depth * box_half + 4.0
    w.add_box((-wall_x - 0.5, wall_h), (0.5, wall_h), friction=0.2,
              static=True)
    w.add_box((wall_x + 0.5, wall_h), (0.5, wall_h), friction=0.2,
              static=True)
    for k in range(depth):
        for c in range(width):
            x = (c - (width - 1) / 2.0) * 2.0 * box_half
            w.add_box((x, box_half + 2.0 * box_half * k * 1.005),
                      (box_half, box_half), friction=0.5)
    for _ in range(frames):
        w.step()
    pen = float(w.max_penetration())
    vmax = float(np.abs(np.asarray(w.vel)).max())
    return {"depth": depth, "frames": frames,
            "pos_iters": pos_iters,
            "max_penetration": round(pen, 5),
            "pen_ratio_boxhalves": round(pen / box_half, 4),
            "max_speed": round(vmax, 5)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depths", type=int, nargs="+",
                    default=[16, 32, 64, 112])
    ap.add_argument("--frames", type=int, default=1200)
    ap.add_argument("--pos-iters", type=int, default=6)
    ap.add_argument("--width", type=int, default=3)
    args = ap.parse_args()
    for d in args.depths:
        print(json.dumps(settled_penetration(
            d, args.frames, args.pos_iters, width=args.width)),
            flush=True)


if __name__ == "__main__":
    main()
