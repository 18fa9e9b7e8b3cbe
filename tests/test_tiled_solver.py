"""Tiled (slab-windowed) solver vs the fused kernel (100k-scale path)."""

import jax
import numpy as np

import phyx_tpu.solver as solver
import phyx_tpu.step as step_mod
from phyx_tpu import scenes
from phyx_tpu.config import SimConfig
from phyx_tpu.step import step


def test_tiled_matches_fused_loosely():
    """Slab sweep order differs from pair order, so agreement is
    convergence-level, not bitwise; routing overflow must be zero."""
    cfg = SimConfig(max_bodies=512, max_pairs=1024, broadphase="sap",
                    sap_window=48, solver_backend="pallas",
                    tile_stride=256, tile_halo=256)
    sb = scenes.pile(cfg, 300, seed=0)

    st_f = sb.build()
    for _ in range(40):
        st_f = step(st_f, cfg)

    orig_f = solver.pallas_smem_bytes
    orig_s = solver.pallas_streamed_smem_bytes
    solver.pallas_smem_bytes = lambda n, c: 10 ** 9
    solver.pallas_streamed_smem_bytes = lambda n: 10 ** 9
    jax.clear_caches()
    st_t = sb.build()
    try:
        for _ in range(40):
            st_t = step_mod.step(st_t, cfg)
    finally:
        solver.pallas_smem_bytes = orig_f
        solver.pallas_streamed_smem_bytes = orig_s
        jax.clear_caches()

    assert int(st_t.stats.pair_overflow) == 0
    assert float(st_t.stats.max_penetration) < 0.1
    d = np.abs(np.asarray(st_f.bodies.pos) - np.asarray(st_t.bodies.pos)).max()
    assert d < 0.05, f"tiled diverged from fused: {d}"


def _run_tiled(sb, cfg, n_steps):
    """Force the tiled backend by shrinking the SMEM budgets."""
    orig_f = solver.pallas_smem_bytes
    orig_s = solver.pallas_streamed_smem_bytes
    solver.pallas_smem_bytes = lambda n, c: 10 ** 9
    solver.pallas_streamed_smem_bytes = lambda n: 10 ** 9
    jax.clear_caches()
    st = sb.build()
    try:
        for _ in range(n_steps):
            st = step_mod.step(st, cfg)
    finally:
        solver.pallas_smem_bytes = orig_f
        solver.pallas_streamed_smem_bytes = orig_s
        jax.clear_caches()
    return st


def test_tiled_kinematic_static_velocity():
    """A static body with nonzero velocity (conveyor belt) must contribute
    its motion to relative-velocity terms on the tiled path exactly like the
    fused path — regression for the zero-replica-row remap (ADVICE r1 #1),
    which silently read kinematic statics as motionless."""
    cfg = SimConfig(max_bodies=512, max_pairs=1024, broadphase="sap",
                    sap_window=48, solver_backend="pallas",
                    tile_stride=256, tile_halo=256)

    def build():
        sb = scenes.pile(cfg, 200, seed=1)   # filler so slabs are nontrivial
        # conveyor: static slab moving +x under a resting box, far from pile
        sb.add_box((60.0, 0.25), (3.0, 0.25), static=True, friction=0.9,
                   velocity=(2.0, 0.0))
        sb.add_box((60.0, 1.0), (0.4, 0.4), friction=0.9)
        return sb

    st_f = build().build()
    for _ in range(30):
        st_f = step(st_f, cfg)
    st_t = _run_tiled(build(), cfg, 30)

    # the belt must have dragged the box (index 202: ground=0, 200 pile
    # boxes=1..200, belt=201, box=202) on BOTH paths
    box = 202
    vx_f = float(st_f.bodies.vel[box, 0])
    vx_t = float(st_t.bodies.vel[box, 0])
    assert vx_f > 0.5, f"fused belt did not drag the box: vx={vx_f}"
    assert vx_t > 0.5, f"tiled belt did not drag the box: vx={vx_t}"
    d = np.abs(np.asarray(st_f.bodies.pos[box]) -
               np.asarray(st_t.bodies.pos[box])).max()
    assert d < 0.02, f"tiled kinematic contact diverged from fused: {d}"


def test_tiled_joints_match_fused_loosely():
    """User joints on the tiled path (round 2): joint rows route to slabs
    and sweep after each slab's contacts.  Sweep order differs from the
    fused kernel (slab-interleaved vs all-contacts-then-all-joints), so
    agreement is convergence-level; anchors must hold and routing overflow
    must be zero."""
    cfg = SimConfig(max_bodies=512, max_pairs=1024, max_joints=64,
                    broadphase="sap", sap_window=48,
                    solver_backend="pallas",
                    tile_stride=256, tile_halo=256)

    def build():
        sb = scenes.chain(cfg, 12)
        for k in range(40):    # boxes raining near the chain: contacts too
            sb.add_box((2.0 + 0.45 * (k % 10), 3.0 + 0.9 * (k // 10)),
                       (0.2, 0.2), friction=0.5)
        return sb

    st_f = build().build()
    for _ in range(40):
        st_f = step(st_f, cfg)

    st_t = _run_tiled(build(), cfg, 40)

    assert int(st_t.stats.pair_overflow) == 0
    # chain held together on the tiled path
    pos_t = np.asarray(st_t.bodies.pos[1:13])
    gaps = np.linalg.norm(np.diff(pos_t, axis=0), axis=1)
    assert gaps.max() < 1.6, f"tiled chain broke: {gaps.max()}"
    d = np.abs(np.asarray(st_f.bodies.pos) - np.asarray(st_t.bodies.pos)).max()
    assert d < 0.08, f"tiled joints diverged from fused: {d}"
    np.testing.assert_allclose(np.asarray(st_t.joints.accum[:11]),
                               np.asarray(st_f.joints.accum[:11]),
                               atol=0.6)


def test_tiled_chaotic_avalanche_matches_fused():
    """Non-settled, impact-heavy scene (VERDICT r1 weak #4): a small
    avalanche mid-flight.  Slab re-ordering changes rounding, and chaos
    amplifies it, so the window is short (15 frames) and the tolerance
    loose; overflow must be zero and nothing may blow up."""
    cfg = SimConfig(max_bodies=512, max_pairs=1024, broadphase="sap",
                    sap_window=64, solver_backend="pallas",
                    tile_stride=256, tile_halo=256)
    sb = scenes.avalanche(cfg, 300)

    st_f = sb.build()
    for _ in range(15):
        st_f = step(st_f, cfg)

    st_t = _run_tiled(scenes.avalanche(cfg, 300), cfg, 15)

    assert int(st_t.stats.pair_overflow) == 0
    assert np.isfinite(np.asarray(st_t.bodies.pos)).all()
    assert float(st_t.stats.max_penetration) < 0.25
    d = np.abs(np.asarray(st_f.bodies.pos) - np.asarray(st_t.bodies.pos)).max()
    assert d < 0.05, f"tiled diverged from fused mid-impact: {d}"


def test_tiled_halo_violation_counted_not_dropped():
    """A contact whose partners are further apart in x-rank space than the
    slab window (a wide DYNAMIC body with hundreds of bodies between its
    rank and its partner's) must increment the overflow counter — never
    silently clamp.  checked_step turns this into a loud failure."""
    import pytest
    from phyx_tpu.debug import checked_step
    from phyx_tpu.world import SceneBuilder

    cfg = SimConfig(max_bodies=1024, max_pairs=2048, broadphase="n2",
                    solver_backend="pallas",
                    tile_stride=256, tile_halo=256)
    sb = SceneBuilder(cfg)
    # wide dynamic platform: rank ~0 (xlo = -100)
    sb.add_box((0.0, 0.0), (100.0, 0.25), friction=0.5)
    # partner resting on its right edge: rank ~701 after the fillers
    sb.add_box((99.0, 0.65), (0.4, 0.4), friction=0.5)
    # fillers between the two ranks (floating, far above, no contacts)
    for k in range(700):
        sb.add_box((-95.0 + 0.27 * k, 50.0), (0.1, 0.1))

    orig_f = solver.pallas_smem_bytes
    orig_s = solver.pallas_streamed_smem_bytes
    solver.pallas_smem_bytes = lambda n, c: 10 ** 9
    solver.pallas_streamed_smem_bytes = lambda n: 10 ** 9
    jax.clear_caches()
    try:
        st = step_mod.step(sb.build(), cfg)
        assert int(st.stats.pair_overflow) > 0, \
            "halo violation was not counted"
        with pytest.raises(Exception, match="overflow"):
            checked_step(sb.build(), cfg)
    finally:
        solver.pallas_smem_bytes = orig_f
        solver.pallas_streamed_smem_bytes = orig_s
        jax.clear_caches()


# ---- slab-major routing (round 5): broadphase-finalized slab order ----

def _sm_cfg(**kw):
    kw.setdefault("max_bodies", 512)
    kw.setdefault("max_pairs", 1024)
    kw.setdefault("broadphase", "sap")   # -> sap_tiled under pallas_tiled
    kw.setdefault("sap_window", 48)
    kw.setdefault("solver_backend", "pallas_tiled")
    kw.setdefault("tile_stride", 256)
    kw.setdefault("tile_halo", 256)
    return SimConfig(**kw)


def test_slab_major_matches_legacy_routing():
    """tiled_routing=True (slab-major broadphase finalize +
    solve_pallas_tiled2) is the same physics as the round-4 routing-sort
    path at convergence level: within-slab visit order is (pi, pj) on
    both, but dead SAT slots are no-op-visited instead of compacted, so
    agreement is float-level per step, not bitwise."""
    cfg = _sm_cfg()
    sb = scenes.pile(cfg, 300, seed=0)
    st_a = sb.build()
    st_b = sb.build()
    old = cfg.replace(tiled_routing=False)
    new = cfg.replace(tiled_routing=True)
    for _ in range(25):
        st_a = step_mod.step(st_a, old)
        st_b = step_mod.step(st_b, new)
    assert int(st_b.stats.pair_overflow) == 0
    assert int(st_b.stats.num_contacts) > 100
    # warm start must be live on the slab-major path too (a broken
    # cache join would re-converge from zero and inflate the residual)
    assert float(st_b.stats.residual) < 10 * max(
        float(st_a.stats.residual), 1e-4)
    d = np.abs(np.asarray(st_a.bodies.pos) -
               np.asarray(st_b.bodies.pos)).max()
    assert d < 5e-3, f"slab-major diverged from legacy routing: {d}"


def test_slab_major_kinematic_static_velocity():
    """zero_safe_mask keeps kinematic statics (inv_mass 0, velocity set)
    in their true embedded rows on the slab-major path (ADVICE r1 #1
    regression, round-5 form)."""
    cfg = _sm_cfg()
    sb = scenes.pile(cfg, 200, seed=1)
    sb.add_box((60.0, 0.25), (3.0, 0.25), static=True, friction=0.9,
               velocity=(2.0, 0.0))
    sb.add_box((60.0, 1.0), (0.4, 0.4), friction=0.9)
    st = sb.build()
    for _ in range(30):
        st = step_mod.step(st, cfg)
    box = 202
    vx = float(st.bodies.vel[box, 0])
    assert vx > 0.5, f"slab-major belt did not drag the box: vx={vx}"
    assert int(st.stats.pair_overflow) == 0


def test_grid_slab_major_matches_tiled_slab_major():
    """broadphase_sap_grid(emit_routing=True) must produce the IDENTICAL
    slab-major pair buffer as broadphase_sap_tiled on the same state —
    the slab-major finalize is sweep-agnostic (same pair set, same
    (slab, pi, pj) sort, same routed endpoints), so a config switching
    config-E's broadphase to the scanned-window grid changes nothing
    downstream.  Stepped physics is then bit-identical too."""
    from phyx_tpu import broadphase as bp

    cfg = _sm_cfg(sap_window=400, sap_hits=32)
    sb = scenes.pile(cfg, 300, seed=0)
    st = sb.build()
    for _ in range(10):
        st = step_mod.step(st, cfg)

    pa = bp.broadphase_sap_tiled(st.bodies, cfg, emit_routing=True)
    pb = bp.broadphase_sap_grid(st.bodies, cfg, emit_routing=True)
    assert int(pa.overflow) == 0 and int(pb.overflow) == 0
    assert pa.routing is not None and pb.routing is not None
    np.testing.assert_array_equal(np.asarray(pa.pi), np.asarray(pb.pi))
    np.testing.assert_array_equal(np.asarray(pa.pj), np.asarray(pb.pj))
    np.testing.assert_array_equal(np.asarray(pa.routing.lb1),
                                  np.asarray(pb.routing.lb1))
    np.testing.assert_array_equal(np.asarray(pa.routing.lb2),
                                  np.asarray(pb.routing.lb2))
    np.testing.assert_array_equal(np.asarray(pa.routing.pair_cum),
                                  np.asarray(pb.routing.pair_cum))

    # full-step bit-parity over a window: identical pair buffers feed
    # identical downstream code
    gcfg = cfg.replace(broadphase="sap_grid")
    st_a = st
    st_b = st
    for _ in range(10):
        st_a = step_mod.step(st_a, cfg)
        st_b = step_mod.step(st_b, gcfg)
    assert int(st_b.stats.pair_overflow) == 0
    np.testing.assert_array_equal(np.asarray(st_a.bodies.pos),
                                  np.asarray(st_b.bodies.pos))


def test_slab_major_halo_violation_counted():
    """A contact spanning more than tile_halo x-ranks is clamped by the
    broadphase's route_pairs and lands in ovf_slab (counted there, not
    by the solver, on the slab-major path)."""
    from phyx_tpu.world import SceneBuilder

    cfg = _sm_cfg(max_bodies=1024, max_pairs=2048, sap_window=1024)
    sb = SceneBuilder(cfg)
    sb.add_box((0.0, 0.0), (100.0, 0.25), friction=0.5)
    sb.add_box((99.0, 0.65), (0.4, 0.4), friction=0.5)
    for k in range(700):
        sb.add_box((-95.0 + 0.27 * k, 50.0), (0.1, 0.1))
    st = step_mod.step(sb.build(), cfg)
    assert int(st.stats.ovf_slab) > 0, "slab clamp was not counted"
    assert int(st.stats.pair_overflow) >= int(st.stats.ovf_slab)
