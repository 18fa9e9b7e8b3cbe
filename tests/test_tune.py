"""Capacity/window auto-tuning (phyx_tpu/tune.py)."""

import numpy as np

from phyx_tpu import scenes
from phyx_tpu.config import SimConfig
from phyx_tpu.step import rollout, step
from phyx_tpu.tune import resize, suggest_pair_budget, tune_config


def settled_pile(cfg, n=200, frames=60):
    st = scenes.pile(cfg, n, seed=0).build()
    return rollout(st, cfg, frames)


def test_tune_config_measures_the_state():
    cfg = SimConfig(max_bodies=256, max_pairs=4096, broadphase="sap_grid",
                    sap_window=192, sap_hits=8)
    st = settled_pile(cfg)
    cfg2 = tune_config(st, cfg)
    # a settled 200-box pile needs far less than the 10k defaults
    assert 16 <= cfg2.sap_window < 192
    assert cfg2.sap_window % 8 == 0
    assert 8 <= cfg2.sap_hits <= 64
    assert cfg2.max_pairs % 512 == 0
    assert cfg2.max_pairs >= int(st.stats.num_pairs)
    # semantics/topology capacities untouched
    assert cfg2.max_bodies == cfg.max_bodies
    assert cfg2.velocity_iterations == cfg.velocity_iterations


def test_tuned_config_steps_cleanly():
    cfg = SimConfig(max_bodies=256, max_pairs=4096, broadphase="sap_grid",
                    sap_window=192, sap_hits=8)
    st = settled_pile(cfg)
    cfg2 = tune_config(st, cfg)
    st2 = resize(st, cfg2)
    assert st2.cache.pi.shape[0] == cfg2.max_pairs
    out = rollout(st2, cfg2, 10)
    assert int(out.stats.pair_overflow) == 0
    assert np.isfinite(np.asarray(out.bodies.pos)).all()
    # warm-start impulses survived the resize: the settled pile does not
    # re-converge from scratch (penetration stays tight on frame 1)
    one = step(st2, cfg2)
    assert float(one.stats.max_penetration) < 0.05


def test_resize_grow_roundtrip():
    cfg = SimConfig(max_bodies=256, max_pairs=1024, broadphase="sap_grid",
                    sap_window=64, sap_hits=8)
    st = settled_pile(cfg)
    import dataclasses
    big = dataclasses.replace(cfg, max_pairs=2048)
    st2 = resize(st, big)
    live = np.asarray(st.cache.pi) != np.int32(2**31 - 1)
    np.testing.assert_array_equal(np.asarray(st2.cache.pi)[:1024][live],
                                  np.asarray(st.cache.pi)[live])
    assert (np.asarray(st2.cache.pi)[1024:] == np.int32(2**31 - 1)).all()


def test_suggest_pair_budget_floor():
    cfg = SimConfig(max_bodies=64, max_pairs=512, broadphase="n2")
    st = scenes.pile(cfg, 20, seed=0).build()   # no stats yet: floor path
    b = suggest_pair_budget(st)
    assert b >= 512 and b % 512 == 0


def test_rollout_autotuned_recovers_from_overflow():
    """An undersized pair budget overflows; the chunked autotuner grows
    it from the measured state and the rest of the rollout is clean
    (VERDICT r2 #5: no silent physics loss, no hand-passed budgets)."""
    from phyx_tpu.tune import rollout_autotuned

    cfg = SimConfig(max_bodies=64, max_pairs=32, broadphase="n2",
                    solver_backend="xla")
    st = scenes.pile(cfg, 40, seed=0).build()
    retunes = []
    st, cfg2 = rollout_autotuned(
        st, cfg, 60, chunk=10,
        on_retune=lambda a, b, done: retunes.append((done, b.max_pairs)))
    assert retunes, "overflow never triggered a retune"
    assert cfg2.max_pairs > cfg.max_pairs
    assert int(st.stats.pair_overflow) == 0
    assert np.isfinite(np.asarray(st.bodies.pos)).all()
    # stable afterwards: another chunk stays clean with the tuned config
    st = rollout(st, cfg2, 10)
    assert int(st.stats.pair_overflow) == 0


def test_suggest_sap_hits_covers_the_state():
    """suggest_sap_hits sizes for the MAX true forward hits (round-5
    fence: hit-slot spill DROPS pairs, so percentiles under-size): the
    grid sweep at the suggested H must report zero ovf_slots, and a
    deliberately starved H on the same state must spill."""
    import dataclasses

    from phyx_tpu import broadphase as bp

    cfg = SimConfig(max_bodies=256, max_pairs=4096, broadphase="sap_grid",
                    sap_window=192, sap_hits=8)
    st = settled_pile(cfg)
    h = bp.suggest_sap_hits(st.bodies, cfg=cfg)
    assert h >= 8

    ok = bp.broadphase_sap_grid(
        st.bodies, dataclasses.replace(cfg, sap_hits=min(h, 192)))
    assert int(ok.ovf_slots) == 0

    starved = bp.broadphase_sap_grid(
        st.bodies, dataclasses.replace(cfg, sap_hits=2))
    assert int(starved.ovf_slots) > 0
    assert int(ok.num) > int(starved.num)
