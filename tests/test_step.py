"""End-to-end step tests: oracle parity, invariants, jit/vmap equivalence
(SURVEY.md §4.3-4.5)."""

import numpy as np
import jax
import jax.numpy as jnp

from phyx_tpu import scenes
from phyx_tpu.config import SimConfig
from phyx_tpu.step import step
from phyx_tpu.world import SceneBuilder


CFG_SMALL = SimConfig(max_bodies=64, max_pairs=512, broadphase="n2")


def test_free_fall():
    sb = SceneBuilder(CFG_SMALL)
    sb.add_box((0.0, 100.0), (0.5, 0.5))
    st = sb.build()
    for _ in range(10):
        st = step(st, CFG_SMALL)
    # y = 100 - sum_{k=1..10} g*k*dt^2 (symplectic Euler)
    dt, g = CFG_SMALL.dt, -CFG_SMALL.gravity[1]
    expect_y = 100.0 - g * dt * dt * sum(range(1, 11))
    assert abs(float(st.bodies.pos[0, 1]) - expect_y) < 1e-3
    assert abs(float(st.bodies.vel[0, 1]) + g * dt * 10) < 1e-4


def test_single_box_rests_on_ground():
    sb = SceneBuilder(CFG_SMALL)
    sb.add_box((0.0, -10.0), (100.0, 10.0), static=True)
    sb.add_box((0.0, 0.55), (0.5, 0.5))
    st = sb.build()
    for _ in range(120):
        st = step(st, CFG_SMALL)
    # box settled on ground: center at ~0.5, tiny velocity
    assert abs(float(st.bodies.pos[1, 1]) - 0.5) < 0.02
    assert abs(float(st.bodies.vel[1, 1])) < 0.01
    assert float(st.stats.max_penetration) < 0.03


def test_oracle_trajectory_parity_two_boxes():
    """With <= 1 contact pair there is no ordering ambiguity: the jitted
    step must track the oracle trajectory closely for many frames."""
    cfg = CFG_SMALL
    sb = SceneBuilder(cfg)
    sb.add_box((0.0, -10.0), (100.0, 10.0), static=True, friction=0.5)
    sb.add_box((0.0, 1.2), (0.5, 0.5), friction=0.5, velocity=(2.0, 0.0))
    st = sb.build()
    ow = sb.to_oracle()
    for frame in range(90):
        st = step(st, cfg)
        ow.step()
        pos_t = np.asarray(st.bodies.pos[1])
        pos_o = np.asarray(ow.pos[1])
        assert np.allclose(pos_t, pos_o, atol=2e-3), \
            f"frame {frame}: {pos_t} vs {pos_o}"


def test_oracle_parity_small_stack():
    """3-box stack: compare settled positions (ordering differs between
    color sweep and oracle's sequential order, so tolerance is looser;
    convergence-rate parity per SURVEY.md §7 hard part #3)."""
    cfg = CFG_SMALL
    sb = scenes.stack(cfg, 3)
    st = sb.build()
    ow = sb.to_oracle()
    for _ in range(150):
        st = step(st, cfg)
        ow.step()
    pos_t = np.asarray(st.bodies.pos[1:4])
    pos_o = np.asarray(ow.pos[1:4])
    assert np.allclose(pos_t, pos_o, atol=2e-2), f"{pos_t}\nvs\n{pos_o}"
    # stack is upright in both
    assert np.all(np.diff(pos_t[:, 1]) > 0.8)


def test_momentum_conservation_no_gravity():
    cfg = SimConfig(max_bodies=16, max_pairs=64, broadphase="n2",
                    gravity=(0.0, 0.0))
    sb = SceneBuilder(cfg)
    sb.add_box((-2.0, 0.0), (0.5, 0.5), velocity=(3.0, 0.0), friction=0.0)
    sb.add_box((2.0, 0.01), (0.5, 0.5), velocity=(-1.0, 0.0), friction=0.0)
    st = sb.build()
    def momentum(s):
        m = 1.0 / np.asarray(s.bodies.inv_mass[:2])
        return (np.asarray(s.bodies.vel[:2]) * m[:, None]).sum(0)
    p0 = momentum(st)
    for _ in range(120):
        st = step(st, cfg)
    p1 = momentum(st)
    assert np.allclose(p0, p1, atol=1e-3), f"{p0} vs {p1}"


def test_stack_stability_warm_start():
    """10-box stack must remain standing for 300 frames — the de-facto
    correctness test of the reference demo (SURVEY.md §4: visual stability
    of stacks), made quantitative."""
    cfg = SimConfig(max_bodies=32, max_pairs=256, broadphase="n2",
                    velocity_iterations=10, position_iterations=6)
    sb = scenes.stack(cfg, 10)
    st = sb.build()
    for _ in range(300):
        st = step(st, cfg)
    ys = np.asarray(st.bodies.pos[1:11, 1])
    xs = np.asarray(st.bodies.pos[1:11, 0])
    assert np.all(np.diff(ys) > 0.7), f"stack collapsed: {ys}"
    assert np.all(np.abs(xs) < 0.5), f"stack drifted: {xs}"
    assert float(st.stats.max_penetration) < 0.05


def test_no_energy_gain_pile():
    cfg = SimConfig(max_bodies=64, max_pairs=512, broadphase="n2")
    sb = scenes.pile(cfg, 20, seed=3)
    st = sb.build()
    def ke(s):
        im = np.asarray(s.bodies.inv_mass)
        dyn = im > 0
        m = np.where(dyn, 1.0 / np.maximum(im, 1e-9), 0.0)
        v2 = (np.asarray(s.bodies.vel) ** 2).sum(-1)
        ii = np.asarray(s.bodies.inv_inertia)
        iw = np.where(ii > 0, 1.0 / np.maximum(ii, 1e-9), 0.0)
        w2 = np.asarray(s.bodies.angvel) ** 2
        return float((0.5 * m * v2 + 0.5 * iw * w2).sum())
    # settle, then energy must decay (restitution 0, friction on)
    for _ in range(100):
        st = step(st, cfg)
    e0 = ke(st)
    for _ in range(100):
        st = step(st, cfg)
    e1 = ke(st)
    assert e1 < max(e0, 1e-2) + 1e-3, f"energy grew {e0} -> {e1}"


def test_vmap_matches_single():
    cfg = CFG_SMALL
    builders = [scenes.stack(cfg, k) for k in (2, 3, 4)]
    states = [sb.build() for sb in builders]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    vstep = jax.jit(jax.vmap(lambda s: step(s, cfg)))
    for _ in range(30):
        batch = vstep(batch)
        states = [step(s, cfg) for s in states]
    for k, s in enumerate(states):
        np.testing.assert_allclose(
            np.asarray(batch.bodies.pos[k]), np.asarray(s.bodies.pos),
            atol=1e-4)


def test_sap_equals_n2_end_to_end():
    cfg_n2 = SimConfig(max_bodies=64, max_pairs=512, broadphase="n2")
    cfg_sap = cfg_n2.replace(broadphase="sap", sap_window=63)
    sb = scenes.pile(cfg_n2, 25, seed=9)
    st_a = sb.build()
    st_b = sb.build()
    for _ in range(60):
        st_a = step(st_a, cfg_n2)
        st_b = step(st_b, cfg_sap)
    np.testing.assert_allclose(np.asarray(st_a.bodies.pos),
                               np.asarray(st_b.bodies.pos), atol=1e-4)
