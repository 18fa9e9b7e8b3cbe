"""User joints (revolute/distance) vs the NumPy oracle (SURVEY.md §4).

The fused kernel sweeps joint rows after the contact rows in every
iteration, exactly like the oracle's loop ordering, so trajectory parity
is tight.
"""

import numpy as np
import pytest

from phyx_tpu import scenes
from phyx_tpu.config import SimConfig
from phyx_tpu.step import step

CFG = SimConfig(max_bodies=64, max_pairs=256, max_joints=32,
                broadphase="n2", solver_backend="pallas")


def _run_both(sb, cfg, frames):
    st = sb.build()
    ow = sb.to_oracle()
    for _ in range(frames):
        st = step(st, cfg)
        ow.step()
    return st, ow


def test_revolute_chain_matches_oracle():
    sb = scenes.chain(CFG, 5)
    st, ow = _run_both(sb, CFG, 60)
    np.testing.assert_allclose(np.asarray(st.bodies.pos[:7]),
                               np.asarray(ow.pos[:7]), atol=2e-3)
    # the chain must actually be swinging (not frozen)
    assert float(np.abs(np.asarray(st.bodies.vel[1:7])).max()) > 1e-3


def test_distance_net_matches_oracle():
    sb = scenes.net(CFG, 6)
    st, ow = _run_both(sb, CFG, 60)
    np.testing.assert_allclose(np.asarray(st.bodies.pos[:9]),
                               np.asarray(ow.pos[:9]), atol=2e-3)


def test_revolute_anchor_error_bounded():
    """A chain hanging straight down (static equilibrium) holds its pin
    constraints to within the displacement-solve tolerance.  (A swinging
    chain has physical transient drift; equilibrium is the tight case.)"""
    from phyx_tpu.world import SceneBuilder
    cfg = CFG
    sb = SceneBuilder(cfg)
    pivot = sb.add_box((0.0, 20.0), (0.2, 0.2), static=True)
    prev = pivot
    for k in range(4):
        cy = 20.0 - 0.6 - 1.2 * k
        link = sb.add_box((0.0, cy), (0.15, 0.6), density=2.0)
        sb.add_revolute_joint(prev, link, (0.0, cy + 0.6))
        prev = link
    st = sb.build()
    for _ in range(240):
        st = step(st, cfg)
    pos = np.asarray(st.bodies.pos)
    rot = np.asarray(st.bodies.rot)
    joints = st.joints
    kinds = np.asarray(joints.kind)
    for k in range(len(kinds)):
        if kinds[k] != 1:
            continue
        b1, b2 = int(joints.b1[k]), int(joints.b2[k])
        a1, a2 = np.asarray(joints.a1[k]), np.asarray(joints.a2[k])

        def world(b, a):
            c, s = rot[b]
            return pos[b] + np.array([c * a[0] - s * a[1],
                                      s * a[0] + c * a[1]])
        err = np.linalg.norm(world(b1, a1) - world(b2, a2))
        assert err < 0.02, f"joint {k} anchor error {err}"


def test_bridge_with_load_settles():
    """Bridge planks + dropped boxes: joints and contacts solved together;
    the loaded bridge must sag but hold (no plank below half height)."""
    cfg = SimConfig(max_bodies=64, max_pairs=512, max_joints=32,
                    broadphase="n2", solver_backend="pallas")
    sb = scenes.bridge(cfg, 8, load_boxes=3)
    st, ow = _run_both(sb, cfg, 150)
    # bodies: 0 ground, 1-2 pillars, 3..10 planks, 11.. load boxes
    ys = np.asarray(st.bodies.pos[3:11, 1])
    assert ys.min() > 3.0, f"bridge collapsed: {ys}"
    np.testing.assert_allclose(np.asarray(st.bodies.pos[3:11]),
                               np.asarray(ow.pos[3:11]), atol=2e-2)


def test_joint_warm_start_carried():
    """A settled chain carries nonzero accumulated joint impulses (gravity
    load) across frames — the warm-start path."""
    sb = scenes.chain(CFG, 3)
    st = sb.build()
    for _ in range(120):
        st = step(st, CFG)
    acc = np.asarray(st.joints.accum)
    kinds = np.asarray(st.joints.kind)
    assert np.abs(acc[kinds == 1]).max() > 1e-3


def test_xla_joints_match_oracle():
    """The XLA fallback now solves user joints (VERDICT r2 #3): colored
    joint sweeps after the contact colors each iteration.  Trajectory
    parity vs the oracle is convergence-level (the color order differs
    from the oracle's serial order)."""
    cfg = CFG.replace(solver_backend="xla")
    sb = scenes.chain(cfg, 5)
    st, ow = _run_both(sb, cfg, 60)
    np.testing.assert_allclose(np.asarray(st.bodies.pos[:7]),
                               np.asarray(ow.pos[:7]), atol=5e-3)
    assert float(np.abs(np.asarray(st.bodies.vel[1:7])).max()) > 1e-3


def test_xla_joints_match_pallas():
    """XLA vs fused-Pallas on a jointed scene WITH contacts: same
    algorithm, different sweep order — trajectories must stay within
    convergence-level tolerance over a contact-rich run."""
    cfg_x = SimConfig(max_bodies=128, max_pairs=1024, max_joints=32,
                      broadphase="n2", solver_backend="xla")
    cfg_p = cfg_x.replace(solver_backend="pallas")

    def build(cfg):
        sb = scenes.chain(cfg, 8)
        for k in range(6):
            sb.add_box((1.0 + 0.9 * k, 2.0 + 0.2 * k), (0.3, 0.3),
                       friction=0.5)
        return sb.build()

    st_x, st_p = build(cfg_x), build(cfg_p)
    for _ in range(40):
        st_x = step(st_x, cfg_x)
        st_p = step(st_p, cfg_p)
    np.testing.assert_allclose(np.asarray(st_x.bodies.pos),
                               np.asarray(st_p.bodies.pos), atol=2e-2)
    # joint accumulators carry load on both backends
    kx = np.asarray(st_x.joints.kind) == 1
    assert np.abs(np.asarray(st_x.joints.accum)[kx]).max() > 1e-3


def test_xla_jointed_vmap():
    """vmap over jointed scenes works on the XLA backend (the scale-out
    path VERDICT r2 #2 noted as missing): batched chains evolve exactly
    like their solo counterparts."""
    import jax

    import jax.numpy as jnp

    cfg = CFG.replace(solver_backend="xla")
    # perturb each env so the batch isn't degenerate
    sts = [scenes.chain(cfg, 4).build() for _ in range(3)]
    sts = [st.replace(bodies=st.bodies.replace(
        pos=st.bodies.pos + jnp.float32(0.01 * e))) for e, st in
        enumerate(sts)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *sts)
    vstep = jax.jit(jax.vmap(lambda s: step(s, cfg)))
    for _ in range(30):
        batch = vstep(batch)
    for e, st in enumerate(sts):
        solo = st
        for _ in range(30):
            solo = step(solo, cfg)
        np.testing.assert_allclose(
            np.asarray(jax.tree.map(lambda x: x[e], batch).bodies.pos),
            np.asarray(solo.bodies.pos), atol=1e-5)


def test_streamed_joints_match_fused_bitexact():
    """Joint rows stream after the contact region (round 2): the streamed
    kernel must equal the all-SMEM fused kernel bit-for-bit on a jointed
    scene (same serial sweep order — contacts then joints per pass —
    different data movement).  Forced by monkeypatching the SMEM-fit
    predicate, like test_streamed_matches_fused_bitexact."""
    import jax
    import phyx_tpu.solver as solver
    import phyx_tpu.step as step_mod

    cfg = SimConfig(max_bodies=128, max_pairs=1024, max_joints=32,
                    broadphase="n2", solver_backend="pallas")

    def build():
        sb = scenes.chain(cfg, 8)
        # add boxes that fall onto the chain so contacts AND joints are live
        for k in range(6):
            sb.add_box((1.0 + 0.9 * k, 2.0 + 0.2 * k), (0.3, 0.3),
                       friction=0.5)
        return sb

    st_f = build().build()
    for _ in range(25):
        st_f = step_mod.step(st_f, cfg)

    orig = solver.pallas_smem_bytes
    solver.pallas_smem_bytes = lambda n, c: 10 ** 9  # force "fused unfit"
    jax.clear_caches()
    st_s = build().build()
    try:
        for _ in range(25):
            st_s = step_mod.step(st_s, cfg)
    finally:
        solver.pallas_smem_bytes = orig
        jax.clear_caches()

    np.testing.assert_array_equal(np.asarray(st_f.bodies.pos),
                                  np.asarray(st_s.bodies.pos))
    np.testing.assert_array_equal(np.asarray(st_f.bodies.vel),
                                  np.asarray(st_s.bodies.vel))
    np.testing.assert_array_equal(np.asarray(st_f.joints.accum),
                                  np.asarray(st_s.joints.accum))
