"""2D vector / rotation math on SoA arrays.

The reference stores rotation as an x/y basis pair (``Coords2f``), not an
angle (SURVEY.md §2 C1).  We keep exactly that representation: a rotation is
``(c, s) = (cos t, sin t)`` stacked on the last axis, so transforming a point
never calls trig in the hot path and the semantics match the reference's
basis-vector formulation.

All functions are shape-polymorphic over leading batch dims: vectors are
``(..., 2)`` arrays, scalars ``(...)`` arrays.  They work identically under
``jnp`` and ``numpy`` inputs (pure jnp ops), so the NumPy oracle reuses the
same formulas where convenient.
"""

from __future__ import annotations

import jax.numpy as jnp


def vec2(x, y):
    return jnp.stack(jnp.broadcast_arrays(jnp.asarray(x, jnp.float32),
                                          jnp.asarray(y, jnp.float32)), axis=-1)


def dot(a, b):
    return (a * b).sum(axis=-1)


def cross(a, b):
    """2D scalar cross product a.x*b.y - a.y*b.x."""
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def cross_sv(s, v):
    """Cross of scalar (angular velocity) with vector: s x v = (-s*vy, s*vx)."""
    return jnp.stack((-s * v[..., 1], s * v[..., 0]), axis=-1)


def perp(v):
    """Counter-clockwise perpendicular (-y, x)."""
    return jnp.stack((-v[..., 1], v[..., 0]), axis=-1)


def length(v):
    return jnp.sqrt(dot(v, v))


def normalize(v, eps=1e-12):
    return v / jnp.maximum(length(v), eps)[..., None]


# --- rotations: (..., 2) arrays holding (cos, sin) -------------------------

def rot_identity(shape=()):
    c = jnp.ones(shape, jnp.float32)
    s = jnp.zeros(shape, jnp.float32)
    return jnp.stack((c, s), axis=-1)


def rot_from_angle(theta):
    theta = jnp.asarray(theta, jnp.float32)
    return jnp.stack((jnp.cos(theta), jnp.sin(theta)), axis=-1)


def rot_angle(r):
    return jnp.arctan2(r[..., 1], r[..., 0])


def rot_mul(a, b):
    """Compose rotations: result = a * b (apply b then a)."""
    c = a[..., 0] * b[..., 0] - a[..., 1] * b[..., 1]
    s = a[..., 1] * b[..., 0] + a[..., 0] * b[..., 1]
    return jnp.stack((c, s), axis=-1)


def rot_apply(r, v):
    """Rotate vector v by r."""
    x = r[..., 0] * v[..., 0] - r[..., 1] * v[..., 1]
    y = r[..., 1] * v[..., 0] + r[..., 0] * v[..., 1]
    return jnp.stack((x, y), axis=-1)


def rot_inv_apply(r, v):
    """Rotate vector v by the inverse of r."""
    x = r[..., 0] * v[..., 0] + r[..., 1] * v[..., 1]
    y = -r[..., 1] * v[..., 0] + r[..., 0] * v[..., 1]
    return jnp.stack((x, y), axis=-1)


def rot_normalize(r, eps=1e-12):
    """Re-orthonormalize a (cos, sin) pair after repeated composition."""
    return r / jnp.maximum(jnp.sqrt((r * r).sum(axis=-1)), eps)[..., None]


def rot_advance(r, omega_dt):
    """Advance rotation by a small angle omega*dt (exact trig + renorm).

    Matches the reference's basis-advance semantics (SURVEY.md §3.2
    IntegratePositions) without accumulating drift.
    """
    return rot_normalize(rot_mul(rot_from_angle(omega_dt), r))


def transform_point(pos, rot, p_local):
    """World position of a body-local point."""
    return pos + rot_apply(rot, p_local)


def inv_transform_point(pos, rot, p_world):
    return rot_inv_apply(rot, p_world - pos)
