"""Broadphase pair sets vs O(N^2) ground truth (SURVEY.md §4.2)."""

import numpy as np
import jax.numpy as jnp

from phyx_tpu.broadphase import (EMPTY, broadphase_n2, broadphase_sap,
                                 compute_aabbs)
from phyx_tpu.config import SimConfig
from phyx_tpu.types import Bodies


def random_bodies(n_real, cap, seed=0, spread=20.0):
    rng = np.random.default_rng(seed)
    b = Bodies.zeros(cap)
    pos = rng.uniform(-spread, spread, (n_real, 2)).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, n_real).astype(np.float32)
    h = rng.uniform(0.3, 1.2, (n_real, 2)).astype(np.float32)
    inv_m = (rng.uniform(0, 1, n_real) > 0.2).astype(np.float32)
    return b.replace(
        pos=b.pos.at[:n_real].set(pos),
        rot=b.rot.at[:n_real].set(np.stack([np.cos(ang), np.sin(ang)], -1)),
        half_extent=b.half_extent.at[:n_real].set(h),
        inv_mass=b.inv_mass.at[:n_real].set(inv_m),
        inv_inertia=b.inv_inertia.at[:n_real].set(inv_m),
        active=b.active.at[:n_real].set(True))


def brute_pairs(bodies, n_real):
    lo, hi = map(np.asarray, compute_aabbs(bodies))
    out = set()
    for i in range(n_real):
        for j in range(i + 1, n_real):
            if (lo[i, 0] <= hi[j, 0] and lo[j, 0] <= hi[i, 0]
                    and lo[i, 1] <= hi[j, 1] and lo[j, 1] <= hi[i, 1]):
                im = np.asarray(bodies.inv_mass)
                if im[i] == 0.0 and im[j] == 0.0:
                    continue
                out.add((i, j))
    return out


def got_pairs(pairs):
    pi, pj = np.asarray(pairs.pi), np.asarray(pairs.pj)
    return {(int(a), int(b)) for a, b in zip(pi, pj) if a != EMPTY}


def test_n2_matches_brute():
    bodies = random_bodies(60, 64, seed=1)
    cfg = SimConfig(max_bodies=64, max_pairs=2048, broadphase="n2")
    pairs = broadphase_n2(bodies, cfg)
    assert got_pairs(pairs) == brute_pairs(bodies, 60)
    assert int(pairs.overflow) == 0


def test_sap_matches_brute():
    bodies = random_bodies(100, 128, seed=2, spread=40.0)
    cfg = SimConfig(max_bodies=128, max_pairs=4096, sap_window=64)
    pairs = broadphase_sap(bodies, cfg)
    assert got_pairs(pairs) == brute_pairs(bodies, 100)


def test_sap_window_overflow_flagged():
    """Crowded scene + tiny window -> missed pairs must be *counted*."""
    bodies = random_bodies(80, 128, seed=3, spread=3.0)
    cfg_small = SimConfig(max_bodies=128, max_pairs=4096, sap_window=2)
    cfg_big = SimConfig(max_bodies=128, max_pairs=4096, sap_window=100)
    small = broadphase_sap(bodies, cfg_small)
    big = broadphase_sap(bodies, cfg_big)
    missed = len(got_pairs(big)) - len(got_pairs(small))
    if missed > 0:
        assert int(small.overflow) > 0
    # the big window is exact
    assert got_pairs(big) == brute_pairs(bodies, 80)


def test_pairs_lex_sorted():
    bodies = random_bodies(100, 128, seed=4, spread=10.0)
    cfg = SimConfig(max_bodies=128, max_pairs=4096, sap_window=64)
    pairs = broadphase_sap(bodies, cfg)
    pi, pj = np.asarray(pairs.pi), np.asarray(pairs.pj)
    keys = list(zip(pi.tolist(), pj.tolist()))
    assert keys == sorted(keys)


def test_inactive_bodies_never_pair():
    bodies = random_bodies(10, 64, seed=5, spread=1.0)  # 54 inactive slots
    cfg = SimConfig(max_bodies=64, max_pairs=1024, sap_window=63)
    pairs = broadphase_sap(bodies, cfg)
    for (i, j) in got_pairs(pairs):
        assert i < 10 and j < 10
