"""Coloring invariants: conflict-free classes, all valid contacts colored
(SURVEY.md §5.2 race-safety by construction)."""

import numpy as np
import jax.numpy as jnp

from phyx_tpu import scenes
from phyx_tpu.broadphase import broadphase
from phyx_tpu.coloring import check_coloring, color_contacts
from phyx_tpu.config import SimConfig
from phyx_tpu.narrowphase import narrowphase
from phyx_tpu.step import integrate_velocities, step


def build_contacts(cfg, sb):
    st = sb.build()
    bodies = integrate_velocities(st.bodies, cfg)
    pairs = broadphase(bodies, cfg)
    contacts = narrowphase(bodies, pairs, cfg)
    body_static = (bodies.inv_mass == 0.0) & (bodies.inv_inertia == 0.0)
    return color_contacts(contacts, body_static, cfg), body_static


def test_pile_coloring_conflict_free():
    """Safety invariant: no dynamic body repeats within a non-final color.

    Contact coloring is edge coloring of the body multigraph, so the
    number of classes needed is ~max body degree (Vizing); with enough
    colors the Jacobi leftover class must be empty.
    """
    cfg = SimConfig(max_bodies=128, max_pairs=1024, broadphase="n2",
                    num_colors=32)
    sb = scenes.pile(cfg, 60, seed=0)
    # settle a few frames so a real contact network forms
    st = sb.build()
    for _ in range(30):
        st = step(st, cfg)
    bodies = integrate_velocities(st.bodies, cfg)
    pairs = broadphase(bodies, cfg)
    contacts = narrowphase(bodies, pairs, cfg)
    body_static = (bodies.inv_mass == 0.0) & (bodies.inv_inertia == 0.0)
    contacts = color_contacts(contacts, body_static, cfg)
    assert int(check_coloring(contacts, body_static, cfg)) == 0
    color = np.asarray(contacts.color)
    valid = np.asarray(contacts.valid)
    leftovers = int((valid & (color == cfg.num_colors - 1)).sum())
    assert leftovers == 0, f"{leftovers} contacts left to Jacobi class"


def test_conflicts_zero_even_when_colors_scarce():
    cfg = SimConfig(max_bodies=128, max_pairs=1024, broadphase="n2",
                    num_colors=6)
    sb = scenes.pile(cfg, 60, seed=0)
    st = sb.build()
    for _ in range(20):
        st = step(st, cfg)
    bodies = integrate_velocities(st.bodies, cfg)
    pairs = broadphase(bodies, cfg)
    contacts = narrowphase(bodies, pairs, cfg)
    body_static = (bodies.inv_mass == 0.0) & (bodies.inv_inertia == 0.0)
    contacts = color_contacts(contacts, body_static, cfg)
    # non-final classes stay conflict-free no matter how scarce colors are
    assert int(check_coloring(contacts, body_static, cfg)) == 0


def test_ground_contacts_dont_conflict():
    """A static ground touching many boxes must not exhaust colors."""
    cfg = SimConfig(max_bodies=128, max_pairs=1024, broadphase="n2",
                    num_colors=8)
    sb = scenes.pile(cfg, 40, seed=1, jitter=0.0)
    contacts, body_static = build_contacts(cfg, sb)
    assert int(check_coloring(contacts, body_static, cfg)) == 0
    # many ground contacts may legally share one color
    color = np.asarray(contacts.color)
    valid = np.asarray(contacts.valid)
    b1 = np.asarray(contacts.b1)
    ground_contacts = valid & (b1 == 0)
    if ground_contacts.sum() > 8:
        # must be spread over < num_colors classes without conflicts
        assert len(set(color[ground_contacts])) <= cfg.num_colors
