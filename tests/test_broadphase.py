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


def test_sap_long_object_beyond_window():
    """A ground plane spanning the whole axis must pair with EVERY box
    sitting on it even when the box count far exceeds sap_window
    (classic SAP long-object failure; fixed by the dense long-object
    lane).  Regression for boxes falling through the ground at N >> w."""
    cap = 128
    b = Bodies.zeros(cap)
    n_boxes = 100
    xs = np.linspace(-200.0, 200.0, n_boxes).astype(np.float32)
    pos = np.stack([xs, np.full(n_boxes, 0.4, np.float32)], axis=-1)
    b = b.replace(
        pos=b.pos.at[:n_boxes].set(pos),
        rot=b.rot.at[:n_boxes].set(
            np.tile(np.array([1.0, 0.0], np.float32), (n_boxes, 1))),
        half_extent=b.half_extent.at[:n_boxes].set(0.5),
        inv_mass=b.inv_mass.at[:n_boxes].set(1.0),
        inv_inertia=b.inv_inertia.at[:n_boxes].set(1.0),
        active=b.active.at[:n_boxes].set(True))
    # ground: huge static box whose top is y = 0
    g = n_boxes
    b = b.replace(
        pos=b.pos.at[g].set((0.0, -10.0)),
        rot=b.rot.at[g].set((1.0, 0.0)),
        half_extent=b.half_extent.at[g].set((1e4, 10.0)),
        active=b.active.at[g].set(True))

    cfg = SimConfig(max_bodies=cap, max_pairs=4096, sap_window=8)
    pairs = got_pairs(broadphase_sap(b, cfg))
    for i in range(n_boxes):
        assert (i, g) in pairs, f"box {i} lost its ground contact"
    assert pairs == brute_pairs(b, n_boxes + 1)


def test_sap_many_long_objects_exact():
    """Several long bodies (> sap_long_k would be unsound; == is fine) mixed
    with regular ones: SAP must equal brute force, incl. long-long pairs."""
    rng = np.random.default_rng(7)
    cap = 64
    b = Bodies.zeros(cap)
    n_real = 40
    pos = rng.uniform(-30, 30, (n_real, 2)).astype(np.float32)
    h = rng.uniform(0.3, 1.0, (n_real, 2)).astype(np.float32)
    h[:6, 0] = rng.uniform(50.0, 90.0, 6)  # six long bodies
    b = b.replace(
        pos=b.pos.at[:n_real].set(pos),
        rot=b.rot.at[:n_real].set(
            np.tile(np.array([1.0, 0.0], np.float32), (n_real, 1))),
        half_extent=b.half_extent.at[:n_real].set(h),
        inv_mass=b.inv_mass.at[:n_real].set(1.0),
        inv_inertia=b.inv_inertia.at[:n_real].set(1.0),
        active=b.active.at[:n_real].set(True))
    cfg = SimConfig(max_bodies=cap, max_pairs=4096, sap_window=48,
                    sap_long_k=8)
    assert got_pairs(broadphase_sap(b, cfg)) == brute_pairs(b, n_real)


def test_sap_tiled_matches_brute():
    """The tiled sweep (slab windows + HBM emission) must equal brute
    force, including long-object and multi-slab coverage."""
    from phyx_tpu.broadphase import broadphase_sap_tiled
    bodies = random_bodies(500, 2048, seed=9, spread=120.0)
    # one long static slab across everything
    b = bodies
    b = b.replace(
        pos=b.pos.at[500].set((0.0, -5.0)),
        rot=b.rot.at[500].set((1.0, 0.0)),
        half_extent=b.half_extent.at[500].set((500.0, 1.0)),
        inv_mass=b.inv_mass.at[500].set(0.0),
        inv_inertia=b.inv_inertia.at[500].set(0.0),
        active=b.active.at[500].set(True))
    cfg = SimConfig(max_bodies=2048, max_pairs=8192,
                    tile_stride=1024, tile_halo=1024,
                    solver_backend="pallas")
    pairs = broadphase_sap_tiled(b, cfg)
    assert got_pairs(pairs) == brute_pairs(b, 501)


def test_sap_kernel_v2_dense_matches_brute():
    """The vectorized sweep kernel on a DENSE cluster (many hits per
    chunk, multi-chunk spans) must equal brute force."""
    from phyx_tpu.broadphase import broadphase_sap_kernel
    bodies = random_bodies(200, 256, seed=11, spread=6.0)
    cfg = SimConfig(max_bodies=256, max_pairs=8192, solver_backend="pallas")
    pairs = broadphase_sap_kernel(bodies, cfg)
    assert got_pairs(pairs) == brute_pairs(bodies, 200)
    assert int(pairs.overflow) == 0


def test_sap_grid_matches_brute():
    from phyx_tpu.broadphase import broadphase_sap_grid
    bodies = random_bodies(100, 128, seed=2, spread=40.0)
    cfg = SimConfig(max_bodies=128, max_pairs=4096, sap_window=64,
                    sap_hits=16)
    pairs = broadphase_sap_grid(bodies, cfg)
    assert got_pairs(pairs) == brute_pairs(bodies, 100)
    assert int(pairs.overflow) == 0


def test_sap_grid_dense_matches_brute():
    """Dense cluster: many hits per body, exercises the hit-slot ceiling."""
    from phyx_tpu.broadphase import broadphase_sap_grid
    bodies = random_bodies(120, 128, seed=5, spread=6.0)
    cfg = SimConfig(max_bodies=128, max_pairs=8192, sap_window=127,
                    sap_hits=64)
    pairs = broadphase_sap_grid(bodies, cfg)
    assert got_pairs(pairs) == brute_pairs(bodies, 120)
    assert int(pairs.overflow) == 0


def test_sap_grid_hit_overflow_counted():
    """More hits per body than sap_hits slots -> overflow counted, never
    silently dropped."""
    from phyx_tpu.broadphase import broadphase_sap_grid
    bodies = random_bodies(120, 128, seed=5, spread=6.0)
    cfg = SimConfig(max_bodies=128, max_pairs=8192, sap_window=127,
                    sap_hits=2)
    pairs = broadphase_sap_grid(bodies, cfg)
    full = brute_pairs(bodies, 120)
    got = got_pairs(pairs)
    assert got <= full
    assert int(pairs.overflow) >= len(full) - len(got)


def test_sap_grid_long_object():
    """Ground plane spanning the whole axis pairs with far boxes via the
    dense lane."""
    from phyx_tpu.broadphase import broadphase_sap_grid
    cap = 64
    b = Bodies.zeros(cap)
    n = 10
    pos = np.array([[i * 50.0, 0.4] for i in range(n - 1)] + [[0.0, -10.0]],
                   np.float32)
    h = np.array([[0.5, 0.5]] * (n - 1) + [[1000.0, 10.0]], np.float32)
    inv = np.array([1.0] * (n - 1) + [0.0], np.float32)
    bodies = b.replace(
        pos=b.pos.at[:n].set(pos), half_extent=b.half_extent.at[:n].set(h),
        inv_mass=b.inv_mass.at[:n].set(inv),
        inv_inertia=b.inv_inertia.at[:n].set(inv),
        active=b.active.at[:n].set(True))
    cfg = SimConfig(max_bodies=cap, max_pairs=256, sap_window=4, sap_hits=4)
    pairs = broadphase_sap_grid(bodies, cfg)
    got = got_pairs(pairs)
    # ground (index 9, y in [-20, 0]) overlaps boxes at y in [-0.1, 0.9]
    want = {(i, 9) for i in range(9)}
    assert want <= got


def test_suggest_sap_window_covers_scene():
    """The window-sizing policy yields a window with zero truncation on
    the measured state (pair set == ground truth)."""
    from phyx_tpu import scenes
    from phyx_tpu.broadphase import broadphase_sap_grid, suggest_sap_window

    cfg0 = SimConfig(max_bodies=256, max_pairs=4096)
    st = scenes.pile(cfg0, 200, seed=3).build()
    w = suggest_sap_window(st.bodies)
    assert 8 <= w < 256
    cfg = SimConfig(max_bodies=256, max_pairs=4096, sap_window=w,
                    sap_hits=32)
    pairs = broadphase_sap_grid(st.bodies, cfg)
    ref = broadphase_n2(st.bodies, cfg0)
    assert got_pairs(pairs) == got_pairs(ref)
    assert int(pairs.overflow) == 0


def test_sap_grid_vmaps():
    """sap_grid is pure XLA: it must compose with vmap (the mesh-sharded
    env path), producing per-env pair sets equal to solo runs."""
    import jax
    from phyx_tpu.broadphase import broadphase_sap_grid

    cfg = SimConfig(max_bodies=64, max_pairs=512, sap_window=32, sap_hits=8)
    envs = [random_bodies(40, 64, seed=s, spread=15.0) for s in range(4)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *envs)
    vpairs = jax.vmap(lambda b: broadphase_sap_grid(b, cfg))(batch)
    for e, b in enumerate(envs):
        solo = got_pairs(broadphase_sap_grid(b, cfg))
        got = {(int(i), int(j))
               for i, j in zip(np.asarray(vpairs.pi[e]),
                               np.asarray(vpairs.pj[e])) if i != EMPTY}
        assert got == solo, f"env {e} vmap pair set diverged"


def test_lex_sort_pairs_bit_identical_to_two_key():
    """Packed single-key pair sort (round 3) == two-key lex sort, both
    branches: packed (cap <= 2^15) and the 2-key fallback (cap > 2^15)."""
    import jax

    from phyx_tpu.broadphase import lex_sort_pairs

    rng = np.random.default_rng(7)
    for cap in [8, 1024, 16384, 32768, 65536, 1 << 20]:
        n = 4096
        a = rng.integers(0, cap, n).astype(np.int32)
        b = rng.integers(0, cap, n).astype(np.int32)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        valid = rng.random(n) < 0.6
        lo = np.where(valid, lo, EMPTY)
        hi = np.where(valid, hi, EMPTY)
        # duplicates too: the key pack must keep equal rows equal
        lo[1] = lo[0]
        hi[1] = hi[0]
        ref_a, ref_b = jax.lax.sort((jnp.array(lo), jnp.array(hi)),
                                    num_keys=2)
        got_a, got_b = lex_sort_pairs(jnp.array(lo), jnp.array(hi), cap)
        assert (np.asarray(got_a) == np.asarray(ref_a)).all()
        assert (np.asarray(got_b) == np.asarray(ref_b)).all()
