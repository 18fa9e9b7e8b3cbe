"""Per-cause pair-overflow accounting (round 4, VERDICT r3 #3 / #9).

The aggregate ``stats.pair_overflow`` cannot say WHICH budget to grow;
these tests pin each cause to its counter, and pin the round-3 config-E
failure mode: a saturated pair budget drops REAL pairs and degrades the
physics (penetration), which the banded rounding pad must never trigger
by itself (exact true-x accept, VERDICT r3 #2).
"""

import numpy as np

import jax.numpy as jnp

from phyx_tpu import scenes
from phyx_tpu.broadphase import (EMPTY, broadphase_n2, broadphase_sap_grid,
                                 broadphase_sap_tiled, compute_aabbs,
                                 suggest_sap_window)
from phyx_tpu.config import SimConfig
from phyx_tpu.parallel.envs import concat_envs
from phyx_tpu.step import rollout
from phyx_tpu.types import Bodies


def _bodies(positions, half=0.5, cap=64):
    n = len(positions)
    b = Bodies.zeros(cap)
    pos = np.asarray(b.pos).copy()
    pos[:n] = positions
    act = np.zeros(cap, bool)
    act[:n] = True
    inv = np.zeros(cap, np.float32)
    inv[:n] = 1.0
    return b.replace(
        pos=jnp.asarray(pos, jnp.float32),
        active=jnp.asarray(act),
        inv_mass=jnp.asarray(inv),
        inv_inertia=jnp.asarray(inv),
        half_extent=jnp.full((cap, 2), half, jnp.float32),
    )


def _causes(pairs):
    return {k: int(getattr(pairs, k)) for k in
            ("ovf_window", "ovf_slots", "ovf_drop", "ovf_band",
             "ovf_slab")}


def test_window_truncation_attributed():
    """A column of x-coincident boxes with a tiny window: sweeps are
    still x-open at the window end -> ovf_window, nothing else."""
    pos = [(0.0, 1.2 * k) for k in range(24)]
    bodies = _bodies(pos)
    cfg = SimConfig(max_bodies=64, max_pairs=512, broadphase="sap_grid",
                    sap_window=2, sap_hits=8, sap_long_k=0)
    pairs = broadphase_sap_grid(bodies, cfg)
    c = _causes(pairs)
    assert c["ovf_window"] > 0
    assert c["ovf_slots"] == c["ovf_drop"] == c["ovf_band"] == 0
    assert int(pairs.overflow) == sum(c.values())


def test_hit_slot_spill_attributed():
    """A cluster of mutually-overlapping boxes with sap_hits=1: per-body
    forward hits spill the slot budget -> ovf_slots only."""
    pos = [(0.05 * k, 0.01 * k) for k in range(10)]
    bodies = _bodies(pos)
    cfg = SimConfig(max_bodies=64, max_pairs=512, broadphase="sap_grid",
                    sap_window=32, sap_hits=1, sap_long_k=0)
    pairs = broadphase_sap_grid(bodies, cfg)
    c = _causes(pairs)
    assert c["ovf_slots"] > 0
    assert c["ovf_window"] == c["ovf_drop"] == c["ovf_band"] == 0
    assert int(pairs.overflow) == sum(c.values())


def test_buffer_drop_attributed():
    """More true pairs than max_pairs: the _finish slice drops the tail
    -> ovf_drop carries the count (n2 has no other cause)."""
    pos = [(0.05 * k, 0.01 * k) for k in range(12)]   # 66 true pairs
    bodies = _bodies(pos, cap=16)
    cfg = SimConfig(max_bodies=16, max_pairs=32)
    pairs = broadphase_n2(bodies, cfg)
    c = _causes(pairs)
    assert c["ovf_drop"] == 66 - 32
    assert c["ovf_window"] == c["ovf_slots"] == c["ovf_band"] == 0
    assert int(pairs.overflow) == c["ovf_drop"]


def _grid_state(cfg, n_envs=8, boxes=24, y_bands=4):
    builders = [scenes.pile(cfg, boxes, seed=s, ground_half=8.0)
                for s in range(n_envs)]
    mega, _, _ = concat_envs(builders, cfg, band_width=40.0,
                             y_bands=y_bands, band_height=120.0)
    return mega.build()


def _band_cfgs():
    base = dict(max_bodies=1024, max_pairs=4096, broadphase="sap_tiled",
                sap_long_k=4, solver_backend="xla")
    plain = SimConfig(**base)
    banded = SimConfig(**base, sweep_band_h=120.0, sweep_band_y0=-60.0,
                       sweep_band_span=256.0)
    return plain, banded


def test_band_crosser_attributed_to_ovf_band():
    plain, banded = _band_cfgs()
    st = _grid_state(plain)
    pos = np.asarray(st.bodies.pos).copy()
    idx = int(np.argmax(np.asarray(st.bodies.inv_mass) > 0))
    pos[idx] = (0.0, 60.0)     # straddles the y=60 band boundary
    st = st.replace(bodies=st.bodies.replace(pos=jnp.array(pos)))
    got = broadphase_sap_tiled(st.bodies, banded)
    c = _causes(got)
    assert c["ovf_band"] >= 1
    assert c["ovf_window"] == c["ovf_slots"] == c["ovf_drop"] == 0
    assert int(got.overflow) == sum(c.values())


def test_banded_pad_never_emits_disjoint_pairs():
    """THE round-3 config-E failure mechanism (VERDICT r3 weak #2): at a
    large band span the banded keys' rounding pad (span * 2^-18 world
    units) used to emit candidates whose TRUE x-intervals are disjoint,
    eating the pair budget.  With the exact true-x accept the banded
    pair set must equal the plain sweep's exactly, even when gaps are
    smaller than the pad."""
    span = 16384.0             # config-E scale: pad = 0.0625 world units
    pad = span * 2.0 ** -18
    gap = pad / 2.0            # true gap smaller than the pad
    # a row of boxes whose x-gaps are all below the pad: the padded walk
    # sees them as overlapping, the true intervals are disjoint
    pos = [(k * (1.0 + gap), 0.0) for k in range(16)]
    bodies = _bodies(pos)
    plain = SimConfig(max_bodies=64, max_pairs=512,
                      broadphase="sap_tiled", sap_long_k=0)
    banded = plain.replace(sweep_band_h=120.0, sweep_band_y0=-60.0,
                           sweep_band_span=span)
    got_plain = broadphase_sap_tiled(bodies, plain)
    got_banded = broadphase_sap_tiled(bodies, banded)
    # no true overlaps at all -> both sweeps must emit ZERO pairs
    assert int(got_plain.num) == 0
    assert int(got_banded.num) == 0, (
        "pad-inflated candidates leaked into the pair buffer")
    assert int(got_banded.overflow) == 0
    # sap_grid's banded path shares the exact-accept
    g = plain.replace(broadphase="sap_grid", sap_window=32, sap_hits=8)
    gb = banded.replace(broadphase="sap_grid", sap_window=32, sap_hits=8)
    assert int(broadphase_sap_grid(bodies, g).num) == 0
    assert int(broadphase_sap_grid(bodies, gb).num) == 0


def test_band_aware_window_suggestion():
    """suggest_sap_window must measure spans on the BANDED keys when the
    sweep is banded (VERDICT r3 weak #4): the raw-x readout sees all
    y-bands interleaved and over-sizes ~bands-fold."""
    plain, banded = _band_cfgs()
    st = _grid_state(plain, n_envs=8, boxes=24, y_bands=4)
    raw = suggest_sap_window(st.bodies)
    aware = suggest_sap_window(st.bodies, cfg=banded)
    # 4 bands of 2 envs each: the banded-key spans must be well below
    # the interleaved raw spans
    assert aware < raw, (aware, raw)
    assert aware <= raw / 2 + 8, (aware, raw)


def _rank_scrambled_stack(cfg, n=384, seed=0):
    """A single vertical stack whose x positions are randomly jittered:
    the tiled solver's x-rank order is then a random permutation of the
    stack, so vertically-adjacent CONTACTS have rank separations up to
    ~n — far beyond a small tile_halo."""
    from phyx_tpu.world import SceneBuilder
    rng = np.random.default_rng(seed)
    sb = SceneBuilder(cfg)
    sb.add_box((0.0, -1.0), (20.0, 1.0), static=True)
    for k in range(n):
        sb.add_box((float(rng.uniform(-0.1, 0.1)), 0.5 + 1.02 * k),
                   (0.5, 0.5), friction=0.5)
    return sb.build()


def test_slab_clamp_fires_ovf_slab_and_degrades_physics():
    """VERDICT r4 missing #4: the one untested overflow cause.  A
    contact spanning more x-ranks than the slab halo must be clamped by
    the tiled routing, land in ovf_slab (and ONLY there), and produce
    measurably worse physics than an adequate halo — counted loss is
    still wrong physics, exactly like ovf_drop."""
    base = SimConfig(max_bodies=512, max_pairs=1024, broadphase="n2",
                     solver_backend="pallas_tiled",
                     tile_stride=256, tile_halo=128,
                     velocity_iterations=4, position_iterations=2)
    ok = base.replace(tile_halo=512)    # window 768 covers all 384 ranks
    st = _rank_scrambled_stack(base)
    a = rollout(st, base, 40)
    b = rollout(st, ok, 40)
    ca, cb = _causes(a.stats), _causes(b.stats)
    assert ca["ovf_slab"] > 0
    assert (ca["ovf_window"] == ca["ovf_slots"] == ca["ovf_drop"]
            == ca["ovf_band"] == 0)
    assert int(a.stats.pair_overflow) == sum(ca.values())
    assert int(b.stats.pair_overflow) == 0, cb
    # Degradation metric: clamped rows solve against the WRONG body
    # rows, so the trajectory diverges from the adequate-halo run
    # (junk impulses can either sink boxes OR blow the stack apart, so
    # penetration alone is not a reliable signal).
    pa = np.asarray(a.bodies.pos)
    pb = np.asarray(b.bodies.pos)
    act = np.asarray(st.bodies.active)
    rms = float(np.sqrt(((pa - pb)[act] ** 2).sum(axis=1).mean()))
    assert rms > 0.25, (
        f"expected slab clamps to corrupt the trajectory: RMS {rms}")


def test_autotune_grows_tile_halo_on_ovf_slab():
    """rollout_autotuned's tile_halo-growth branch, end-to-end (VERDICT
    r4 missing #4): ovf_slab must drive tile_halo doubling — and ONLY
    tile_halo (the other budgets' counters read 0) — until the rollout
    re-converges to overflow 0."""
    from phyx_tpu.tune import rollout_autotuned
    cfg = SimConfig(max_bodies=512, max_pairs=1024, broadphase="n2",
                    solver_backend="pallas_tiled",
                    tile_stride=256, tile_halo=128,
                    velocity_iterations=4, position_iterations=2)
    st = _rank_scrambled_stack(cfg)
    retunes = []
    st, cfg2 = rollout_autotuned(
        st, cfg, 20, chunk=5,
        on_retune=lambda a, b, done: retunes.append((a, b, done)))
    assert cfg2.tile_halo > cfg.tile_halo, retunes
    for old, new, _ in retunes:
        assert new.sap_window == old.sap_window
        assert new.sap_hits == old.sap_hits
        assert new.max_pairs == old.max_pairs
    # final chunks run clean
    st = rollout(st, cfg2, 5)
    assert int(st.stats.pair_overflow) == 0, _causes(st.stats)


def test_saturated_budget_degrades_physics_and_fires_counter():
    """VERDICT r3 #9: the regression test round 3 lacked.  The SAME
    scene run with a saturated pair budget must (a) fire ovf_drop and
    (b) show measurably worse penetration than an adequately-budgeted
    run — documenting that counted loss is still wrong physics."""
    boxes = 200
    ok_cfg = SimConfig(max_bodies=256, max_pairs=1024,
                       broadphase="sap_grid", sap_window=48, sap_hits=16)
    tight_cfg = ok_cfg.replace(max_pairs=256)   # ~1.3x/box: saturates
    st = scenes.pile(ok_cfg, boxes, seed=0).build()
    st_tight = scenes.pile(tight_cfg, boxes, seed=0).build()
    a = rollout(st, ok_cfg, 60)
    b = rollout(st_tight, tight_cfg, 60)
    assert int(a.stats.pair_overflow) == 0
    assert int(b.stats.ovf_drop) > 0
    pen_ok = float(a.stats.max_penetration)
    pen_bad = float(b.stats.max_penetration)
    assert pen_bad > 2.0 * pen_ok, (
        f"expected dropped pairs to degrade penetration: "
        f"{pen_bad} vs {pen_ok}")
