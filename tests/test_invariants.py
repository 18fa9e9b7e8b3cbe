"""Physical invariant tests (SURVEY.md §4.3).

Sequential-impulse engines must conserve momentum without external force,
never add kinetic energy through contacts, respect the friction cone, and
keep penetration bounded after the displacement pass.
"""

import numpy as np
import pytest

from phyx_tpu import scenes
from phyx_tpu.config import SimConfig
from phyx_tpu.step import rollout, step
from phyx_tpu.world import SceneBuilder

CFG = SimConfig(max_bodies=64, max_pairs=512, broadphase="n2",
                gravity=(0.0, 0.0), solver_backend="pallas")


def _momentum(st):
    b = st.bodies
    dyn = (np.asarray(b.inv_mass) > 0) & np.asarray(b.active)
    v = np.asarray(b.vel)[dyn]
    m = 1.0 / np.asarray(b.inv_mass)[dyn]
    return (v * m[:, None]).sum(axis=0)


def _energy(st):
    b = st.bodies
    dyn = (np.asarray(b.inv_mass) > 0) & np.asarray(b.active)
    v = np.asarray(b.vel)[dyn]
    m = 1.0 / np.asarray(b.inv_mass)[dyn]
    w = np.asarray(b.angvel)[dyn]
    i = 1.0 / np.asarray(b.inv_inertia)[dyn]
    return float(0.5 * (m * (v ** 2).sum(-1)).sum() + 0.5 * (i * w ** 2).sum())


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_momentum_conserved_zero_gravity(seed):
    """Two-body collisions without gravity or statics: total linear
    momentum is invariant (impulses are internal, equal-and-opposite)."""
    rng = np.random.default_rng(seed)
    sb = SceneBuilder(CFG)
    for k in range(8):
        sb.add_box((2.2 * k - 8.0, rng.uniform(-1, 1)), (0.5, 0.5),
                   velocity=(rng.uniform(-3, 3), rng.uniform(-1, 1)),
                   angvel=rng.uniform(-2, 2), friction=0.4)
    st = sb.build()
    p0 = _momentum(st)
    st = rollout(st, CFG, 120)
    p1 = _momentum(st)
    np.testing.assert_allclose(p0, p1, atol=5e-3)


@pytest.mark.parametrize("seed", [0, 3])
def test_no_energy_gain(seed):
    """Inelastic contacts (restitution 0) never add kinetic energy."""
    rng = np.random.default_rng(seed)
    sb = SceneBuilder(CFG)
    for k in range(8):
        sb.add_box((2.2 * k - 8.0, rng.uniform(-1, 1)), (0.5, 0.5),
                   velocity=(rng.uniform(-3, 3), rng.uniform(-1, 1)),
                   friction=0.5)
    st = sb.build()
    e = _energy(st)
    for _ in range(6):
        st = rollout(st, CFG, 20)
        e2 = _energy(st)
        assert e2 <= e * 1.001 + 1e-4, f"energy grew {e} -> {e2}"
        e = e2


def test_stack_stability_warm_start():
    """The classic tower: 12 boxes stacked stay standing for 600 frames —
    only possible with working warm starting (SURVEY.md §2 C5)."""
    cfg = SimConfig(max_bodies=32, max_pairs=256, broadphase="n2",
                    solver_backend="pallas")
    st = scenes.stack(cfg, 12).build()
    st = rollout(st, cfg, 600)
    ys = np.asarray(st.bodies.pos[1:13, 1])
    expect = 0.5 + np.arange(12)
    np.testing.assert_allclose(ys, expect, atol=0.08)
    assert float(st.stats.max_penetration) < 0.03


def test_friction_cone_respected():
    """A box on a shallow slope with high friction must NOT slide; the
    same box with near-zero friction must slide."""
    def run(mu):
        cfg = SimConfig(max_bodies=8, max_pairs=64, broadphase="n2",
                        solver_backend="pallas")
        sb = SceneBuilder(cfg)
        sb.add_box((0.0, -2.0), (50.0, 2.0), angle=0.15, static=True,
                   friction=mu)
        sb.add_box((0.0, 0.65), (0.5, 0.5), angle=0.15, friction=mu)
        st = sb.build()
        st = rollout(st, cfg, 240)
        return float(st.bodies.pos[1, 0])

    assert abs(run(0.8)) < 0.05, "high-friction box slid on shallow slope"
    assert run(0.01) < -0.5, "frictionless box failed to slide"


def test_restitution_bounce():
    cfg = SimConfig(max_bodies=8, max_pairs=64, broadphase="n2",
                    solver_backend="pallas")
    sb = SceneBuilder(cfg)
    sb.add_box((0.0, -10.0), (100.0, 10.0), static=True)
    sb.add_box((0.0, 3.0), (0.5, 0.5), restitution=0.8)
    st = sb.build()
    peak = 0.0
    bounced = False
    prev_y = 3.0
    for _ in range(200):
        st = step(st, cfg)
        y = float(st.bodies.pos[1, 1])
        if y > prev_y and prev_y < 1.0:
            bounced = True
        if bounced:
            peak = max(peak, y)
        prev_y = y
    assert bounced and 1.0 < peak < 2.6, f"bounce peak {peak}"
