"""Batched SAT+clip vs the scalar NumPy oracle (SURVEY.md §4.2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from phyx_tpu.config import SimConfig
from phyx_tpu.broadphase import Pairs, EMPTY
from phyx_tpu.narrowphase import narrowphase
from phyx_tpu.oracle.engine import collide_box_box_np
from phyx_tpu.types import Bodies


def make_bodies(params):
    """params: list of (pos, angle, half_extent)."""
    n = len(params)
    b = Bodies.zeros(n)
    pos = np.array([p for p, _, _ in params], np.float32)
    ang = np.array([a for _, a, _ in params], np.float32)
    h = np.array([e for _, _, e in params], np.float32)
    rot = np.stack([np.cos(ang), np.sin(ang)], -1)
    return b.replace(
        pos=jnp.asarray(pos), rot=jnp.asarray(rot), half_extent=jnp.asarray(h),
        inv_mass=jnp.ones(n), inv_inertia=jnp.ones(n),
        active=jnp.ones(n, bool))


def run_pair(pa, aa, ha, pb, ab, hb):
    """Run the batched narrowphase on a single A-B pair."""
    bodies = make_bodies([(pa, aa, ha), (pb, ab, hb)])
    pairs = Pairs.of(
        pi=jnp.array([0] + [EMPTY] * 3, jnp.int32),
        pj=jnp.array([1] + [EMPTY] * 3, jnp.int32),
        valid=jnp.array([True, False, False, False]),
        num=jnp.int32(1))
    cfg = SimConfig(max_bodies=2, max_pairs=4)
    return narrowphase(bodies, pairs, cfg)


def oracle_pair(pa, aa, ha, pb, ab, hb):
    ra = np.array([np.cos(aa), np.sin(aa)])
    rb = np.array([np.cos(ab), np.sin(ab)])
    return collide_box_box_np(pa, ra, ha, pb, rb, hb)


CASES = [
    # face-face resting
    ((0, 0), 0.0, (1, 1), (0, 1.9), 0.0, (1, 1)),
    # shifted overlap
    ((0, 0), 0.0, (1, 1), (0.7, 1.8), 0.0, (1, 1)),
    # rotated top box
    ((0, 0), 0.0, (1, 1), (0.2, 1.8), 0.3, (1, 1)),
    # corner poke
    ((0, 0), 0.0, (1, 1), (1.2, 1.2), 0.78, (1, 1)),
    # deep overlap
    ((0, 0), 0.0, (1, 1), (0.0, 0.5), 0.1, (1, 1)),
    # separated
    ((0, 0), 0.0, (1, 1), (5, 5), 0.0, (1, 1)),
    # thin sliver boxes
    ((0, 0), 0.0, (2.0, 0.1), (0.5, 0.15), 0.05, (0.5, 0.1)),
    # identical coincident boxes
    ((0, 0), 0.0, (1, 1), (0.0, 0.0), 0.0, (1, 1)),
]


@pytest.mark.parametrize("case", CASES)
def test_hand_cases(case):
    pa, aa, ha, pb, ab, hb = case
    check_against_oracle(pa, aa, ha, pb, ab, hb)


def check_against_oracle(pa, aa, ha, pb, ab, hb, tol=2e-4):
    c = run_pair(pa, aa, ha, pb, ab, hb)
    normal_o, pts_o, pens_o, fids_o = oracle_pair(
        np.asarray(pa, float), aa, np.asarray(ha, float),
        np.asarray(pb, float), ab, np.asarray(hb, float))

    got_valid = np.asarray(c.valid[:2])
    got_fids = np.asarray(c.fid[:2])
    got = {int(f): (np.asarray(c.r1[k]) + np.asarray(pa),
                    float(c.penetration[k]),
                    np.asarray(c.normal[k]))
           for k, f in enumerate(got_fids) if got_valid[k]}

    assert len(got) == len(pts_o), \
        f"point count {len(got)} != oracle {len(pts_o)} (fids {got_fids}, {fids_o})"
    for p_o, pen_o, f_o in zip(pts_o, pens_o, fids_o):
        assert f_o in got, f"oracle fid {f_o} missing from {sorted(got)}"
        p_g, pen_g, n_g = got[f_o]
        np.testing.assert_allclose(p_g, p_o, atol=tol)
        assert abs(pen_g - pen_o) < tol
        np.testing.assert_allclose(n_g, np.asarray(normal_o), atol=tol)


def test_fuzz_vs_oracle():
    rng = np.random.default_rng(42)
    mismatches = 0
    for _ in range(300):
        pa = rng.uniform(-1, 1, 2)
        pb = pa + rng.uniform(-2.2, 2.2, 2)
        aa, ab = rng.uniform(-np.pi, np.pi, 2)
        ha = rng.uniform(0.3, 1.5, 2)
        hb = rng.uniform(0.3, 1.5, 2)
        # skip near-degenerate SAT ties where f32/f64 legitimately disagree
        _, pts, pens, _ = oracle_pair(pa, aa, ha, pb, ab, hb)
        if pts and min(pens) < 1e-4:
            continue
        try:
            check_against_oracle(tuple(pa), aa, tuple(ha),
                                 tuple(pb), ab, tuple(hb), tol=5e-4)
        except AssertionError:
            mismatches += 1
    # allow a tiny rate of f32-vs-f64 tie-breaking flips on axis selection
    assert mismatches <= 3, f"{mismatches} fuzz mismatches"


def test_batch_consistency():
    """Many pairs at once == each pair alone."""
    rng = np.random.default_rng(7)
    params = [((rng.uniform(-1, 1), rng.uniform(-1, 1)),
               rng.uniform(-3, 3),
               (rng.uniform(0.3, 1.0), rng.uniform(0.3, 1.0)))
              for _ in range(8)]
    bodies = make_bodies(params)
    pi = jnp.array([0, 2, 4, 6] + [EMPTY] * 4, jnp.int32)
    pj = jnp.array([1, 3, 5, 7] + [EMPTY] * 4, jnp.int32)
    pairs = Pairs.of(pi=pi, pj=pj, valid=pi != EMPTY, num=jnp.int32(4))
    cfg = SimConfig(max_bodies=8, max_pairs=8)
    batched = narrowphase(bodies, pairs, cfg)
    for k in range(4):
        a, b = 2 * k, 2 * k + 1
        single = run_pair(params[a][0], params[a][1], params[a][2],
                          params[b][0], params[b][1], params[b][2])
        for slot in range(2):
            bi, si = 2 * k + slot, slot
            assert bool(batched.valid[bi]) == bool(single.valid[si])
            if bool(single.valid[si]):
                np.testing.assert_allclose(
                    np.asarray(batched.normal[bi]),
                    np.asarray(single.normal[si]), atol=1e-6)
                assert int(batched.fid[bi]) == int(single.fid[si])
