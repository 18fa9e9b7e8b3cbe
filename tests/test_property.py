"""Hypothesis property tests (SURVEY.md §4.3) + checkify debug guards (§5.2).

All scenes use one fixed capacity per config so the jitted step compiles
once per test, not per example.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import assume, given, settings, strategies as st

from phyx_tpu import scenes
from phyx_tpu.config import SimConfig
from phyx_tpu.debug import checked_rollout, checked_step
from phyx_tpu.step import step
from phyx_tpu.world import SceneBuilder

SETTLE = dict(deadline=None, max_examples=25, derandomize=True)

CFG_FREE = SimConfig(max_bodies=16, max_pairs=64, broadphase="n2",
                     solver_backend="pallas", gravity=(0.0, 0.0))
CFG_G = SimConfig(max_bodies=16, max_pairs=64, broadphase="n2",
                  solver_backend="pallas")

box = st.tuples(
    st.floats(-2.0, 2.0), st.floats(-2.0, 2.0),      # pos
    st.floats(-3.1, 3.1),                            # angle
    st.floats(0.3, 1.2), st.floats(0.3, 1.2),        # half extents
    st.floats(-2.0, 2.0), st.floats(-2.0, 2.0),      # velocity
    st.floats(-2.0, 2.0),                            # angvel
)


def _build(boxes, cfg, friction=0.5, restitution=0.0):
    sb = SceneBuilder(cfg)
    for (x, y, a, hx, hy, vx, vy, w) in boxes:
        sb.add_box((x, y), (hx, hy), angle=a, friction=friction,
                   restitution=restitution, velocity=(vx, vy), angvel=w)
    return sb.build()


@settings(**SETTLE)
@given(st.lists(box, min_size=2, max_size=6))
def test_prop_momentum_conserved_without_gravity(boxes):
    """Contact impulses are internal (equal and opposite): with zero
    gravity and no static bodies, total linear momentum is invariant."""
    st_ = _build(boxes, CFG_FREE)
    inv_m = np.asarray(st_.bodies.inv_mass)
    mask = inv_m > 0
    p0 = (np.asarray(st_.bodies.vel)[mask] / inv_m[mask, None]).sum(0)
    for _ in range(10):
        st_ = step(st_, CFG_FREE)
    p1 = (np.asarray(st_.bodies.vel)[mask] / inv_m[mask, None]).sum(0)
    np.testing.assert_allclose(p1, p0, atol=1e-3 * max(1.0, np.abs(p0).max()))


@settings(**SETTLE)
@given(st.lists(box, min_size=2, max_size=6))
def test_prop_no_energy_gain(boxes):
    """With restitution 0 the sequential-impulse solve only dissipates:
    kinetic energy never increases (no gravity; split-impulse displacement
    adds no kinetic energy by construction)."""
    st_ = _build(boxes, CFG_FREE, restitution=0.0)

    def ke(s):
        inv_m = np.asarray(s.bodies.inv_mass)
        inv_i = np.asarray(s.bodies.inv_inertia)
        m = np.where(inv_m > 0, 1.0 / np.maximum(inv_m, 1e-9), 0.0)
        i = np.where(inv_i > 0, 1.0 / np.maximum(inv_i, 1e-9), 0.0)
        v2 = (np.asarray(s.bodies.vel) ** 2).sum(1)
        return float(0.5 * (m * v2 + i * np.asarray(s.bodies.angvel) ** 2).sum())

    e = ke(st_)
    for _ in range(10):
        st_ = step(st_, CFG_FREE)
        e2 = ke(st_)
        assert e2 <= e * (1 + 1e-4) + 1e-6, f"energy grew {e} -> {e2}"
        e = e2


@settings(**SETTLE)
@given(st.lists(box, min_size=2, max_size=6), st.floats(0.1, 0.9))
def test_prop_friction_cone(boxes, mu):
    """Accumulated friction impulses stay inside the cone |t| <= mu*n
    (cache holds the accumulators written back after the solve)."""
    st_ = _build(boxes, CFG_G, friction=mu)
    for _ in range(8):
        st_ = step(st_, CFG_G)
    fn = np.asarray(st_.cache.normal_impulse).ravel()
    ft = np.asarray(st_.cache.friction_impulse).ravel()
    live = np.asarray(st_.cache.fid).ravel() >= 0
    assert np.all(fn[live] >= -1e-6), "negative normal impulse cached"
    assert np.all(np.abs(ft[live]) <= mu * fn[live] + 1e-5), \
        "friction impulse escaped the cone"


@settings(**SETTLE)
@given(st.lists(box, min_size=1, max_size=6))
def test_prop_rotation_basis_stays_normalized(boxes):
    """The (cos, sin) rotation basis must stay unit-norm under integration
    (rot_advance renormalizes)."""
    st_ = _build(boxes, CFG_G)
    for _ in range(15):
        st_ = step(st_, CFG_G)
    norm = (np.asarray(st_.bodies.rot) ** 2).sum(1)
    active = np.asarray(st_.bodies.active)
    np.testing.assert_allclose(norm[active], 1.0, atol=1e-4)


@settings(**SETTLE)
@given(st.lists(box, min_size=1, max_size=4), st.integers(0, 2 ** 31 - 1))
def test_prop_inactive_slots_never_move(boxes, seed):
    """Capacity padding: inactive body slots are parked and must be
    bit-identical after any number of steps."""
    st_ = _build(boxes, CFG_G)
    parked = np.asarray(st_.bodies.pos[len(boxes):])
    for _ in range(5):
        st_ = step(st_, CFG_G)
    np.testing.assert_array_equal(
        np.asarray(st_.bodies.pos[len(boxes):]), parked)
    assert np.all(np.asarray(st_.bodies.vel[len(boxes):]) == 0.0)


@settings(**SETTLE)
@given(st.lists(box, min_size=2, max_size=5))
def test_prop_penetration_resolved_after_settling(boxes):
    """Dropping boxes on a ground plane: after settling, max penetration is
    bounded by slop-scale (the displacement pass must not let bodies sink)."""
    cfg = SimConfig(max_bodies=16, max_pairs=64, broadphase="n2",
                    solver_backend="pallas")
    sb = SceneBuilder(cfg)
    sb.add_box((0.0, -10.0), (50.0, 10.0), static=True, friction=0.6)
    for k, (x, y, a, hx, hy, vx, vy, w) in enumerate(boxes):
        # spread boxes out so the initial state isn't deeply interpenetrating
        sb.add_box((x + 5.0 * k, 1.5 + abs(y)), (hx, hy), angle=a,
                   friction=0.6)
    st_ = sb.build()
    for _ in range(150):
        st_ = step(st_, cfg)
    assert float(st_.stats.max_penetration) < 0.08
    ys = np.asarray(st_.bodies.pos[1:len(boxes) + 1, 1])
    assert ys.min() > 0.0, "a box sank through the ground"


# --- checkify debug guards (SURVEY.md §5.2) ---

def test_checked_step_passes_on_healthy_scene():
    cfg = CFG_G
    st_ = scenes.stack(cfg, 3).build()
    st_ = checked_step(st_, cfg)
    st_ = checked_rollout(st_, cfg, 5)
    assert np.isfinite(np.asarray(st_.bodies.pos)).all()


def test_checked_step_catches_nan():
    cfg = CFG_G
    st_ = scenes.stack(cfg, 3).build()
    bad = st_.replace(bodies=st_.bodies.replace(
        vel=st_.bodies.vel.at[1, 0].set(jnp.nan)))
    with pytest.raises(Exception, match="non-finite"):
        checked_step(bad, cfg)


def test_checked_rollout_catches_midstream_overflow():
    """Overflowing the pair budget mid-rollout raises instead of silently
    dropping contacts."""
    cfg = SimConfig(max_bodies=32, max_pairs=4, broadphase="n2",
                    solver_backend="pallas")
    st_ = scenes.pile(cfg, 12, seed=0).build()
    with pytest.raises(Exception, match="overflow"):
        checked_rollout(st_, cfg, 30)


# --- round-3 key-packing primitives -------------------------------------

_CAPS = st.sampled_from([8, 1024, 16384, 32768, 65536, 1 << 20])


@given(cap=_CAPS, seed=st.integers(0, 2**16))
@settings(**SETTLE)
def test_prop_lex_sort_pairs_matches_two_key(cap, seed):
    import jax

    from phyx_tpu.broadphase import EMPTY, lex_sort_pairs

    rng = np.random.default_rng(seed)
    n = 512
    a = rng.integers(0, cap, n).astype(np.int32)
    b = rng.integers(0, cap, n).astype(np.int32)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    valid = rng.random(n) < rng.random()
    lo = np.where(valid, lo, EMPTY)
    hi = np.where(valid, hi, EMPTY)
    ra, rb = jax.lax.sort((jnp.array(lo), jnp.array(hi)), num_keys=2)
    ga, gb = lex_sort_pairs(jnp.array(lo), jnp.array(hi), cap)
    assert (np.asarray(ga) == np.asarray(ra)).all()
    assert (np.asarray(gb) == np.asarray(rb)).all()


@given(cap=_CAPS, seed=st.integers(0, 2**16))
@settings(**SETTLE)
def test_prop_lex_join_packed_matches_unpacked(cap, seed):
    from phyx_tpu.broadphase import EMPTY
    from phyx_tpu.cache import lex_join

    rng = np.random.default_rng(seed)

    def keys(n, frac):
        a = rng.integers(0, cap, n).astype(np.int32)
        b = rng.integers(0, cap, n).astype(np.int32)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        same = lo == hi
        lo = np.where(same, EMPTY, lo)      # enforce a < b precondition
        hi = np.where(same, EMPTY, hi)
        emp = rng.random(n) < frac
        lo = np.where(emp, EMPTY, lo)
        hi = np.where(emp, EMPTY, hi)
        order = np.lexsort((hi, lo))
        lo, hi = lo[order], hi[order]
        keep = np.ones(n, bool)
        keep[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
        lo = np.where(keep, lo, EMPTY)
        hi = np.where(keep, hi, EMPTY)
        order = np.lexsort((hi, lo))
        return lo[order], hi[order]

    ka, kb = keys(256, 0.3)
    qa, qb = keys(300, 0.4)
    idx_u, hit_u = lex_join(jnp.array(ka), jnp.array(kb),
                            jnp.array(qa), jnp.array(qb), n_cap=None)
    idx_p, hit_p = lex_join(jnp.array(ka), jnp.array(kb),
                            jnp.array(qa), jnp.array(qb), n_cap=cap)
    assert (np.asarray(hit_p) == np.asarray(hit_u)).all()
    h = np.asarray(hit_u)
    assert (np.asarray(idx_p)[h] == np.asarray(idx_u)[h]).all()
