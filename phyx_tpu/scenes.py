"""Canonical scene builders — the demo-equivalents (SURVEY.md §2 C14).

The reference demo builds a ground box plus a stacked-box pile; these
builders reproduce that family headlessly for tests, demos and the bench
harness (BASELINE.json:7-11 configs).
"""

from __future__ import annotations

import math

import numpy as np

from phyx_tpu.config import SimConfig
from phyx_tpu.world import SceneBuilder


def _ground(sb: SceneBuilder, half_width: float = 1e4):
    return sb.add_box((0.0, -10.0), (half_width, 10.0), static=True,
                      friction=0.6)


def pile(cfg: SimConfig, num_boxes: int, seed: int = 0,
         box_half: float = 0.5, jitter: float = 0.1) -> SceneBuilder:
    """Stacked-box pile on a ground plane — the reference's default demo
    (BASELINE.json:7/8).  Boxes arranged in a near-square grid of columns
    with per-box jitter so the pile settles into contact-rich disorder."""
    rng = np.random.default_rng(seed)
    sb = SceneBuilder(cfg)
    _ground(sb)
    cols = max(1, int(math.sqrt(num_boxes * 2)))
    spacing = box_half * 2.05
    placed = 0
    row = 0
    while placed < num_boxes:
        for c in range(cols):
            if placed >= num_boxes:
                break
            x = (c - cols / 2) * spacing + rng.uniform(-jitter, jitter) * box_half
            y = 0.5 + row * spacing
            sb.add_box((x, y), (box_half, box_half), friction=0.5)
            placed += 1
        row += 1
    return sb


def stack(cfg: SimConfig, height: int, box_half: float = 0.5) -> SceneBuilder:
    """Single vertical stack — the classic stability test (warm-start
    sensitive: without contact caching it jitters and collapses)."""
    sb = SceneBuilder(cfg)
    _ground(sb)
    for k in range(height):
        sb.add_box((0.0, 0.5 + k * box_half * 2.0), (box_half, box_half),
                   friction=0.6)
    return sb


def pyramid(cfg: SimConfig, base: int, box_half: float = 0.5) -> SceneBuilder:
    """Pyramid of boxes (joint-heavy lateral contact network)."""
    sb = SceneBuilder(cfg)
    _ground(sb)
    s = box_half * 2.02
    for row in range(base):
        count = base - row
        for c in range(count):
            x = (c - count / 2.0 + 0.5) * s
            y = 0.5 + row * s
            sb.add_box((x, y), (box_half, box_half), friction=0.6)
    return sb


def avalanche(cfg: SimConfig, num_boxes: int, seed: int = 0,
              box_half: float = 0.5) -> SceneBuilder:
    """Boxes rain onto a slope — broadphase/cache-churn stress
    (BASELINE.json:10)."""
    rng = np.random.default_rng(seed)
    sb = SceneBuilder(cfg)
    _ground(sb)
    sb.add_box((-30.0, 15.0), (40.0, 1.0), angle=-0.35, static=True,
               friction=0.3)
    cols = max(1, int(math.sqrt(num_boxes)))
    s = box_half * 2.5
    for k in range(num_boxes):
        r, c = divmod(k, cols)
        x = -60.0 + c * s + rng.uniform(-0.2, 0.2) * box_half
        y = 25.0 + r * s
        sb.add_box((x, y), (box_half, box_half), friction=0.4,
                   angle=rng.uniform(-0.3, 0.3))
    return sb
