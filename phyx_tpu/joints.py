"""User joints: revolute (pin) and distance constraints.

The reference's "joints" are contact joints only (SURVEY.md §7.9); chains /
bridges / joint-heavy scenes (BASELINE.json:9, config C) need real
articulation constraints.  These reuse the exact limiter machinery of the
contact solver — precomputed Jacobian rows + effective masses, warm-started
accumulated impulses, velocity pass + split-impulse displacement pass — so
they ride the same fused Pallas kernels (row slots appended after the
contact region, see kernels/contact_solver*.py).

Row encodings (12 f32 per row, matching the contact row width):

  revolute: [r1x, r1y, r2x, r2y, m00, m01, m11, dstx, dsty, 0, 0, kind=1]
    2D point-equality constraint solved with the 2x2 effective-mass
    inverse (m00 m01; m01 m11); velocity target 0; displacement target
    (dstx, dsty) = clamped beta * anchor error.

  distance: [nx, ny, r1x, r1y, r2x, r2y, mass, dst, 0, 0, 0, kind=2]
    1D constraint along the current anchor axis n; signed displacement
    target dst = clamped beta * (|d| - rest).

Accumulator layout per row (4 f32): velocity impulse (x, y) and
displacement impulse (x, y) — contacts use (normal, tangent, disp, unused).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from phyx_tpu import math2d as m2
from phyx_tpu.config import SimConfig
from phyx_tpu.types import Bodies, _pytree_dataclass

KIND_NONE = 0
KIND_REVOLUTE = 1
KIND_DISTANCE = 2


@_pytree_dataclass
class Joints:
    """SoA user-joint state, fixed capacity J (static topology)."""

    kind: jax.Array    # (J,) int32: 0 none, 1 revolute, 2 distance
    b1: jax.Array      # (J,) int32
    b2: jax.Array      # (J,) int32
    a1: jax.Array      # (J, 2) f32 local anchor on body 1
    a2: jax.Array      # (J, 2) f32 local anchor on body 2
    rest: jax.Array    # (J,) f32 distance-joint rest length
    accum: jax.Array   # (J, 2) f32 warm-start velocity impulse

    @property
    def capacity(self) -> int:
        return self.kind.shape[-1]

    @staticmethod
    def empty(j: int) -> "Joints":
        return Joints(
            kind=jnp.zeros((j,), jnp.int32),
            b1=jnp.zeros((j,), jnp.int32),
            b2=jnp.zeros((j,), jnp.int32),
            a1=jnp.zeros((j, 2), jnp.float32),
            a2=jnp.zeros((j, 2), jnp.float32),
            rest=jnp.zeros((j,), jnp.float32),
            accum=jnp.zeros((j, 2), jnp.float32),
        )


def prepare_joint_rows(bodies: Bodies, joints: Joints, cfg: SimConfig):
    """Batched joint prepare: returns (rows (J, 12) f32, warm (J, 2) f32).

    Mirrors the contact ``prepare`` (solver.py): everything the iteration
    kernels consume is precomputed here; invalid slots (kind 0) carry zero
    masses so the sweeps treat them as exact no-ops.
    """
    b1, b2 = joints.b1, joints.b2
    valid = joints.kind != KIND_NONE
    rev = joints.kind == KIND_REVOLUTE

    rot1, rot2 = bodies.rot[b1], bodies.rot[b2]
    p1, p2 = bodies.pos[b1], bodies.pos[b2]
    im1, im2 = bodies.inv_mass[b1], bodies.inv_mass[b2]
    ii1, ii2 = bodies.inv_inertia[b1], bodies.inv_inertia[b2]

    r1 = m2.rot_apply(rot1, joints.a1)
    r2 = m2.rot_apply(rot2, joints.a2)
    err = (p2 + r2) - (p1 + r1)              # anchor separation

    # ---- revolute: 2x2 effective mass K^-1 ----
    k00 = im1 + im2 + ii1 * r1[:, 1] ** 2 + ii2 * r2[:, 1] ** 2
    k01 = -ii1 * r1[:, 0] * r1[:, 1] - ii2 * r2[:, 0] * r2[:, 1]
    k11 = im1 + im2 + ii1 * r1[:, 0] ** 2 + ii2 * r2[:, 0] ** 2
    det = k00 * k11 - k01 * k01
    inv_det = jnp.where(jnp.abs(det) > 1e-30, 1.0 / det, 0.0)
    m00 = k11 * inv_det
    m01 = -k01 * inv_det
    m11 = k00 * inv_det
    # displacement target: remove a bounded fraction of the anchor error.
    # The kernels drive the pseudo-velocity d(err)/dt toward the target, so
    # the target must point OPPOSITE the error to shrink it.
    dst_rev = jnp.clip(-cfg.joint_beta * err,
                       -cfg.max_displacement_velocity,
                       cfg.max_displacement_velocity)

    # ---- distance: axis + scalar effective mass ----
    dist = jnp.linalg.norm(err, axis=-1)
    safe = jnp.maximum(dist, 1e-9)[:, None]
    n = jnp.where(dist[:, None] > 1e-9, err / safe,
                  jnp.stack([jnp.ones_like(dist),
                             jnp.zeros_like(dist)], axis=-1))
    rn1 = m2.cross(r1, n)
    rn2 = m2.cross(r2, n)
    kd = im1 + im2 + ii1 * rn1 ** 2 + ii2 * rn2 ** 2
    mass_d = jnp.where(kd > 0.0, 1.0 / jnp.maximum(kd, 1e-30), 0.0)
    # positive when too short -> drive separation rate positive (push apart)
    dst_dist = jnp.clip(cfg.joint_beta * (joints.rest - dist),
                        -cfg.max_displacement_velocity,
                        cfg.max_displacement_velocity)

    zero = jnp.zeros_like(dist)
    rows_rev = jnp.stack([
        r1[:, 0], r1[:, 1], r2[:, 0], r2[:, 1],
        m00, m01, m11, dst_rev[:, 0], dst_rev[:, 1], zero, zero,
        jnp.full_like(dist, float(KIND_REVOLUTE))], axis=1)
    rows_dist = jnp.stack([
        n[:, 0], n[:, 1], r1[:, 0], r1[:, 1], r2[:, 0], r2[:, 1],
        mass_d, dst_dist, zero, zero, zero,
        jnp.full_like(dist, float(KIND_DISTANCE))], axis=1)

    rows = jnp.where(rev[:, None], rows_rev, rows_dist)
    rows = jnp.where(valid[:, None], rows, jnp.zeros_like(rows))
    warm = jnp.where(valid[:, None], joints.accum,
                     jnp.zeros_like(joints.accum))
    return rows, warm
