"""Scale-normalized residual gates (round 3, VERDICT r2 #1).

The absolute-unit ``velocity_tol`` can never fire at scale (the residual
is max |impulse delta|, which grows with contact count — BASELINE.md B').
``velocity_rel_tol`` / ``position_rel_tol`` gate on
residual < rel_tol * SCALE where SCALE = max |warm-start impulse| of the
frame, computed OUTSIDE the kernels (solver.velocity_threshold /
position_threshold) and passed in as a runtime SMEM scalar — so the
threshold adapts per frame with no recompilation.

Correctness contract tested here:
  * cold starts (zero warm impulses) produce threshold 0 -> the gated
    program is BIT-IDENTICAL to the ungated one (residual >= 0 never < 0);
  * gated runs track the exact fixed-count run to tolerance scale on
    every backend (fused, streamed, XLA);
  * fused and streamed remain bit-exact under gating (same sweep, same
    latch structure);
  * the gate does fire on settled scenes (skipped iterations observable
    through the reported residual staying below the threshold).
"""

import jax.numpy as jnp
import numpy as np

from phyx_tpu import scenes, solver
from phyx_tpu.config import SimConfig
from phyx_tpu.step import step
from phyx_tpu.world import SceneBuilder

CFG = SimConfig(max_bodies=32, max_pairs=128, broadphase="n2",
                solver_backend="pallas")


def _run(sb, cfg, n):
    st = sb.build()
    for _ in range(n):
        st = step(st, cfg)
    return st


def _contacts_of(st, cfg):
    """Rebuild the frame's prepared contacts exactly as step() does."""
    from phyx_tpu.broadphase import broadphase
    from phyx_tpu.cache import warm_start_from_cache
    from phyx_tpu.narrowphase import narrowphase_with_props
    pairs = broadphase(st.bodies, cfg)
    contacts, props = narrowphase_with_props(st.bodies, pairs, cfg)
    contacts = warm_start_from_cache(contacts, pairs, st.cache)
    return solver.prepare(st.bodies, contacts, cfg, pair_props=props)


def test_thresholds_cold_start_zero():
    """Zero warm impulses -> impulse_scale 0 -> rel thresholds 0 (gates
    disabled for that frame); velocity_tol still contributes."""
    sb = scenes.pile(CFG, 8, seed=0)
    st = sb.build()
    # one step to produce contacts; clear the warm-start columns
    st = step(st, CFG)
    contacts = _contacts_of(st, CFG)
    contacts = contacts.replace(warm_n=jnp.zeros_like(contacts.warm_n),
                                warm_t=jnp.zeros_like(contacts.warm_t))
    cfg = CFG.replace(velocity_rel_tol=0.1, position_rel_tol=0.1)
    assert float(solver.impulse_scale(contacts)) == 0.0
    assert float(solver.velocity_threshold(cfg, contacts)) == 0.0
    assert float(solver.position_threshold(cfg, contacts)) == 0.0
    cfg2 = cfg.replace(velocity_tol=1e-3)
    assert float(solver.velocity_threshold(cfg2, contacts)) == np.float32(1e-3)


def test_thresholds_scale_with_warm_impulses():
    sb = scenes.pile(CFG, 10, seed=1)
    st = _run(sb, CFG, 40)
    contacts = _contacts_of(st, CFG)
    s = float(solver.impulse_scale(contacts))
    assert s > 0.0
    cfg = CFG.replace(velocity_rel_tol=0.01, position_rel_tol=0.02)
    np.testing.assert_allclose(
        float(solver.velocity_threshold(cfg, contacts)), 0.01 * s,
        rtol=1e-6)
    np.testing.assert_allclose(
        float(solver.position_threshold(cfg, contacts)), 0.02 * s,
        rtol=1e-6)


def test_rel_gates_track_exact_all_backends():
    """Gated settles to the same configuration as exact fixed-count on
    both the fused Pallas kernel and the XLA colored fallback."""
    for backend in ("pallas", "xla"):
        cfg0 = CFG.replace(solver_backend=backend)
        cfg1 = cfg0.replace(velocity_rel_tol=1e-3, position_rel_tol=1e-3)
        sb = scenes.stack(CFG, 5)
        st0 = _run(sb, cfg0, 120)
        st1 = _run(sb, cfg1, 120)
        d = np.abs(np.asarray(st0.bodies.pos) - np.asarray(st1.bodies.pos))
        assert d.max() < 1e-2, f"{backend}: gated diverged {d.max()}"
        assert float(st1.stats.max_penetration) < 0.05


def test_rel_gates_fused_streamed_bitexact():
    """Same gated program, different data movement: forcing the streamed
    kernel (SMEM predicate monkeypatch) must reproduce the fused result
    bit-for-bit, including which iterations the gates skip."""
    import jax
    import phyx_tpu.step as step_mod

    cfg = SimConfig(max_bodies=128, max_pairs=1024, broadphase="n2",
                    solver_backend="pallas",
                    velocity_rel_tol=1e-3, position_rel_tol=1e-3)
    sb = scenes.pile(cfg, 30, seed=3)
    st_f = sb.build()
    for _ in range(40):
        st_f = step_mod.step(st_f, cfg)

    orig = solver.pallas_smem_bytes
    solver.pallas_smem_bytes = lambda n, c: 10 ** 9
    jax.clear_caches()
    st_s = sb.build()
    try:
        for _ in range(40):
            st_s = step_mod.step(st_s, cfg)
    finally:
        solver.pallas_smem_bytes = orig
        jax.clear_caches()

    np.testing.assert_array_equal(np.asarray(st_f.bodies.pos),
                                  np.asarray(st_s.bodies.pos))
    np.testing.assert_array_equal(np.asarray(st_f.bodies.vel),
                                  np.asarray(st_s.bodies.vel))


def test_rel_gates_with_joints():
    """Jointed scene (joint rows participate in the residual AND the
    impulse scale): gated must track exact on the Pallas path."""
    cfg0 = SimConfig(max_bodies=32, max_pairs=2048, broadphase="n2",
                     solver_backend="pallas", max_joints=16)
    cfg1 = cfg0.replace(velocity_rel_tol=1e-3, position_rel_tol=1e-3)
    sb = scenes.chain(cfg0, 8)
    st0 = _run(sb, cfg0, 120)
    st1 = _run(sb, cfg1, 120)
    d = np.abs(np.asarray(st0.bodies.pos) - np.asarray(st1.bodies.pos))
    # the chain is still swinging at frame 120: sub-tolerance impulse
    # differences amplify along the trajectory (measured 0.039 on a ~10 m
    # chain); the contract is "tracks the exact run to tolerance SCALE",
    # not bit-parity of a chaotic trajectory
    assert d.max() < 8e-2, f"jointed gated diverged {d.max()}"
    # both runs must satisfy the joint constraints equally well
    assert float(st1.stats.max_penetration) < 0.05


def test_gated_oracle_trajectory_parity():
    """The gated engine still tracks the oracle trajectory at the same
    atol as the ungated parity test (gates change results only below
    tolerance)."""
    cfg = CFG.replace(velocity_rel_tol=1e-3, position_rel_tol=1e-3)
    sb = SceneBuilder(cfg)
    sb.add_box((0.0, -10.0), (100.0, 10.0), static=True, friction=0.5)
    sb.add_box((0.0, 1.2), (0.5, 0.5), friction=0.5, velocity=(2.0, 0.0))
    st = sb.build()
    ow = sb.to_oracle()
    for frame in range(60):
        st = step(st, cfg)
        ow.step()
        np.testing.assert_allclose(
            np.asarray(st.bodies.pos[1]), np.asarray(ow.pos[1]),
            atol=3e-3, err_msg=f"frame {frame}")


def _run_tiled(sb, cfg, n):
    """Force the TILED solver backend (SMEM predicate monkeypatch + small
    slab geometry) — same trick as test_banded_sweep."""
    import jax
    import phyx_tpu.step as step_mod

    orig_f = solver.pallas_smem_bytes
    orig_s = solver.pallas_streamed_smem_bytes
    solver.pallas_smem_bytes = lambda n_, c: 10 ** 9
    solver.pallas_streamed_smem_bytes = lambda n_: 10 ** 9
    jax.clear_caches()
    st = sb.build()
    try:
        for _ in range(n):
            st = step_mod.step(st, cfg)
    finally:
        solver.pallas_smem_bytes = orig_f
        solver.pallas_streamed_smem_bytes = orig_s
        jax.clear_caches()
    return st


def test_tiled_gate_tracks_exact():
    """Round 4 (VERDICT r3 #4): the tiled kernel honors the rel gates.
    Gated tiled must track ungated tiled to tolerance scale, and the
    settled state's reported residual must sit BELOW the runtime
    threshold (the gate demonstrably fires)."""
    cfg0 = SimConfig(max_bodies=128, max_pairs=1024, broadphase="n2",
                     solver_backend="pallas",
                     tile_stride=256, tile_halo=256)
    cfg1 = cfg0.replace(velocity_rel_tol=1e-3, position_rel_tol=1e-3)
    sb = scenes.stack(cfg0, 5)
    st0 = _run_tiled(sb, cfg0, 120)
    st1 = _run_tiled(sb, cfg1, 120)
    d = np.abs(np.asarray(st0.bodies.pos) - np.asarray(st1.bodies.pos))
    assert d.max() < 1e-2, f"tiled gated diverged {d.max()}"
    assert float(st1.stats.max_penetration) < 0.05
    # the settled stack's residual is below the threshold -> remaining
    # velocity passes were skipped (the gate fired)
    contacts = _contacts_of(st1, cfg1)
    thresh = float(solver.velocity_threshold(cfg1, contacts))
    assert thresh > 0.0
    assert float(st1.stats.residual) < thresh


def test_tiled_gate_cold_start_bit_identity():
    """Threshold 0 on the first frame (no warm impulses) -> the gated
    tiled program is bit-identical to the ungated one for that frame."""
    cfg0 = SimConfig(max_bodies=128, max_pairs=1024, broadphase="n2",
                     solver_backend="pallas",
                     tile_stride=256, tile_halo=256)
    cfg1 = cfg0.replace(velocity_rel_tol=1e-2, position_rel_tol=1e-2)
    sb = scenes.pile(cfg0, 30, seed=3)
    a = _run_tiled(sb, cfg0, 1)
    b = _run_tiled(sb, cfg1, 1)
    np.testing.assert_array_equal(np.asarray(a.bodies.pos),
                                  np.asarray(b.bodies.pos))
    np.testing.assert_array_equal(np.asarray(a.bodies.vel),
                                  np.asarray(b.bodies.vel))


def test_tiled_gate_with_joints():
    """Jointed tiled gating: joint sweeps participate in the residual and
    the gate; gated must track exact."""
    cfg0 = SimConfig(max_bodies=32, max_pairs=2048, broadphase="n2",
                     solver_backend="pallas", max_joints=16,
                     tile_stride=256, tile_halo=256)
    cfg1 = cfg0.replace(velocity_rel_tol=1e-3, position_rel_tol=1e-3)
    sb = scenes.chain(cfg0, 8)
    st0 = _run_tiled(sb, cfg0, 60)
    st1 = _run_tiled(sb, cfg1, 60)
    d = np.abs(np.asarray(st0.bodies.pos) - np.asarray(st1.bodies.pos))
    assert d.max() < 8e-2, f"tiled jointed gated diverged {d.max()}"


def test_rl_preset_sets_velocity_gate():
    """SimConfig.rl_preset (round 5, VERDICT r4 #3): the documented
    opt-in for the fenced quality-neutral mega-scene gate."""
    from phyx_tpu.config import SimConfig
    cfg = SimConfig.rl_preset(max_bodies=64, max_pairs=128)
    assert cfg.velocity_rel_tol == 1e-2
    assert cfg.position_rel_tol == 0.0
    assert cfg.max_bodies == 64
    # explicit override wins
    cfg2 = SimConfig.rl_preset(velocity_rel_tol=5e-3)
    assert cfg2.velocity_rel_tol == 5e-3
