"""Sequential-impulse solver: prepare + graph-colored Gauss-Seidel sweeps.

TPU-native rebuild of the reference solver (SURVEY.md §2 C6-C8, §3.3-3.4):

  * ``prepare``       = PrepareJoints: Jacobian projectors collapse to 2D
    scalars (normal / tangent rows), effective masses, restitution target
    velocity, displacement target (penetration - slop), all batched.
  * ``warm_start``    = re-applying cached accumulated impulses.
  * ``solve_velocity``= SolveJointsImpulsesSoA: per velocity iteration,
    sweep color classes sequentially; within a color all contacts solve in
    parallel (gather -> row solve -> clamp accumulated -> scatter), which is
    exactly the scalar algorithm under the color-sorted joint order because
    colors are conflict-free on dynamic bodies (coloring.py).
  * ``solve_position``= SolveJointsDisplacementSoA: same sweep on
    pseudo-velocities (split impulse), target = beta*(penetration - slop).

This is the pure-XLA backend (``cfg.solver_backend == "xla"``) — the
always-available correctness fallback per SURVEY.md §7.6; the fused Pallas
backend (kernels/) must match it bit-for-bit up to reassociation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from phyx_tpu import math2d as m2
from phyx_tpu.config import SimConfig
from phyx_tpu.narrowphase import Contacts
from phyx_tpu.types import Bodies


class XlaJoints(NamedTuple):
    """User-joint rows for the XLA fallback backend (VERDICT r2 #3).

    ``rows``/``warm`` come from joints.prepare_joint_rows (encodings in
    joints.py); ``color`` from coloring.color_rows over the joint graph.
    The sweeps process joint colors sequentially AFTER the contact colors
    of each iteration (Gauss-Seidel across colors, conflict-free within —
    the same convergence class as the serial Pallas order, not the same
    order: parity with the Pallas backends is convergence-level, like the
    tiled path)."""

    rows: jax.Array    # (J, 12) f32
    b1: jax.Array      # (J,) int32
    b2: jax.Array      # (J,) int32
    warm: jax.Array    # (J, 2) f32 warm-start impulse
    color: jax.Array   # (J,) int32
    valid: jax.Array   # (J,) bool


def _joint_geom(j: XlaJoints):
    """Decode per-kind row geometry: (is_rev, r1, r2, n)."""
    is_rev = j.rows[:, 11] == 1.0
    r1 = jnp.where(is_rev[:, None], j.rows[:, 0:2], j.rows[:, 2:4])
    r2 = jnp.where(is_rev[:, None], j.rows[:, 2:4], j.rows[:, 4:6])
    n = j.rows[:, 0:2]               # distance-joint axis (rev: unused)
    return is_rev, r1, r2, n


def _joint_apply(vel, angvel, j: XlaJoints, r1, r2, im1, ii1, im2, ii2, p):
    vel = vel.at[j.b1].add(-p * im1[:, None])
    angvel = angvel.at[j.b1].add(-ii1 * m2.cross(r1, p))
    vel = vel.at[j.b2].add(p * im2[:, None])
    angvel = angvel.at[j.b2].add(ii2 * m2.cross(r2, p))
    return vel, angvel


def prepare(bodies: Bodies, contacts: Contacts, cfg: SimConfig,
            pair_props=None) -> Contacts:
    """Batched PrepareJoints (SURVEY.md §3.4).

    ``pair_props`` — optional (props1, props2) from
    narrowphase.narrowphase_with_props, each (C/2, 7) at pair granularity
    with columns [vel.x, vel.y, angvel, inv_mass, inv_inertia, friction,
    restitution]: the same rows this function would otherwise gather
    itself, picked up for free inside narrowphase's geometry gather."""
    b1, b2 = contacts.b1, contacts.b2
    n = contacts.normal
    t = m2.perp(n)
    r1, r2 = contacts.r1, contacts.r2
    if pair_props is not None:
        # expand pair rows to the 2 contact slots: broadcast, no gather
        p1 = jnp.repeat(pair_props[0], 2, axis=0)
        p2 = jnp.repeat(pair_props[1], 2, axis=0)
    else:
        # one packed property gather per side (serial-gather-free on TPU)
        props = jnp.concatenate([
            bodies.vel,                      # 0:2
            bodies.angvel[:, None],          # 2
            bodies.inv_mass[:, None],        # 3
            bodies.inv_inertia[:, None],     # 4
            bodies.friction[:, None],        # 5
            bodies.restitution[:, None],     # 6
        ], axis=1)                           # (N, 7)
        # XLA's native row gather measured faster than a serial Pallas
        # scalar gather on v5e (fenced, ~8 ms/step at 10k) — keep it
        # plain.  Row gathers are row-serialized on this chip, so gather
        # at PAIR granularity (both points of pair p — slots 2p, 2p+1 —
        # share the same bodies by construction, narrowphase.Contacts
        # docstring) and expand x2 with a free broadcast-reshape: half
        # the gather rows.
        def pair_gather(idx):
            rows = props[idx[::2]]                 # (C/2, 7)
            return jnp.repeat(rows, 2, axis=0)     # (C, 7) no gather
        p1 = pair_gather(b1)
        p2 = pair_gather(b2)
    im1, im2 = p1[:, 3], p2[:, 3]
    ii1, ii2 = p1[:, 4], p2[:, 4]

    rn1, rn2 = m2.cross(r1, n), m2.cross(r2, n)
    kn = im1 + im2 + ii1 * rn1 * rn1 + ii2 * rn2 * rn2
    mass_n = jnp.where(kn > 0.0, 1.0 / jnp.maximum(kn, 1e-30), 0.0)

    rt1, rt2 = m2.cross(r1, t), m2.cross(r2, t)
    kt = im1 + im2 + ii1 * rt1 * rt1 + ii2 * rt2 * rt2
    mass_t = jnp.where(kt > 0.0, 1.0 / jnp.maximum(kt, 1e-30), 0.0)

    # Normal->tangent coupling J_t M^-1 J_n^T: the exact change of the
    # tangent relative velocity per unit normal impulse.  Lets the solve
    # visit evaluate the relative velocity ONCE and update vt analytically
    # after the normal impulse instead of re-reading body state — ~20%
    # fewer scalar ops per Gauss-Seidel visit on the serial sweep (the
    # sequential two-apply form and this coupled form are identical in
    # exact arithmetic; t.n = 0 kills the inv-mass term).
    c_nt = ii1 * rn1 * rt1 + ii2 * rn2 * rt2

    friction = jnp.sqrt(p1[:, 5] * p2[:, 5])

    pv1 = p1[:, 0:2] + m2.cross_sv(p1[:, 2], r1)
    pv2 = p2[:, 0:2] + m2.cross_sv(p2[:, 2], r2)
    vn0 = m2.dot(n, pv2 - pv1)
    e = jnp.maximum(p1[:, 6], p2[:, 6])
    dst_v = jnp.where(vn0 < -cfg.restitution_threshold, -e * vn0, 0.0)

    dst_dv = jnp.minimum(
        cfg.max_displacement_velocity,
        cfg.contact_beta * jnp.maximum(0.0, contacts.penetration - cfg.slop))

    v = contacts.valid
    zero = jnp.zeros_like(mass_n)
    return contacts.replace(
        mass_n=jnp.where(v, mass_n, zero),
        mass_t=jnp.where(v, mass_t, zero),
        friction=jnp.where(v, friction, zero),
        dst_v=jnp.where(v, dst_v, zero),
        dst_dv=jnp.where(v, dst_dv, zero),
        c_nt=jnp.where(v, c_nt, zero),
    )


def _apply(vel, angvel, c: Contacts, im1, ii1, im2, ii2, impulse):
    """Scatter-add an impulse (C, 2) to both bodies of each contact.

    Conflict-free within a color class by construction (coloring.py); in
    the final Jacobi class scatter-add accumulates deterministically."""
    vel = vel.at[c.b1].add(-impulse * im1[:, None])
    angvel = angvel.at[c.b1].add(-ii1 * m2.cross(c.r1, impulse))
    vel = vel.at[c.b2].add(impulse * im2[:, None])
    angvel = angvel.at[c.b2].add(ii2 * m2.cross(c.r2, impulse))
    return vel, angvel


def warm_start(bodies: Bodies, contacts: Contacts,
               joints: Optional[XlaJoints] = None) -> Bodies:
    """Apply cached accumulated impulses before iterating (SURVEY.md §3.2).

    With ``joints``, joint warm impulses apply after the contacts (the
    Pallas kernels' order): revolute re-applies the 2D impulse directly,
    distance re-applies its scalar along the current axis."""
    c = contacts
    n = c.normal
    t = m2.perp(n)
    imp = n * c.warm_n[:, None] + t * c.warm_t[:, None]
    imp = jnp.where(c.valid[:, None], imp, 0.0)
    im1, im2 = bodies.inv_mass[c.b1], bodies.inv_mass[c.b2]
    ii1, ii2 = bodies.inv_inertia[c.b1], bodies.inv_inertia[c.b2]
    vel, angvel = _apply(bodies.vel, bodies.angvel, c, im1, ii1, im2, ii2, imp)
    if joints is not None:
        j = joints
        is_rev, r1, r2, jn = _joint_geom(j)
        p = jnp.where(is_rev[:, None], j.warm, jn * j.warm[:, 0:1])
        p = jnp.where(j.valid[:, None], p, 0.0)
        jim1, jim2 = bodies.inv_mass[j.b1], bodies.inv_mass[j.b2]
        jii1, jii2 = bodies.inv_inertia[j.b1], bodies.inv_inertia[j.b2]
        vel, angvel = _joint_apply(vel, angvel, j, r1, r2,
                                   jim1, jii1, jim2, jii2, p)
    return bodies.replace(vel=vel, angvel=angvel)


def impulse_scale(contacts: Contacts,
                  joint_warm: Optional[jax.Array] = None) -> jax.Array:
    """Scene impulse scale for the normalized residual gates: the max
    |warm-start impulse| of the frame (contacts AND user joints) — the
    previous frame's converged impulse magnitude.  Zero on cold starts,
    which disables the relative gates for that frame (safe)."""
    s = jnp.max(jnp.abs(jnp.where(contacts.valid, contacts.warm_n, 0.0)))
    s = jnp.maximum(s, jnp.max(jnp.abs(
        jnp.where(contacts.valid, contacts.warm_t, 0.0))))
    if joint_warm is not None and joint_warm.shape[0]:
        s = jnp.maximum(s, jnp.max(jnp.abs(joint_warm)))
    return s


def velocity_threshold(cfg: SimConfig, contacts: Contacts,
                       joint_warm: Optional[jax.Array] = None) -> jax.Array:
    """Runtime velocity-gate threshold: max(velocity_tol,
    velocity_rel_tol * impulse_scale).  () f32; 0 when both knobs off."""
    t = jnp.float32(cfg.velocity_tol)
    if cfg.velocity_rel_tol > 0.0:
        t = jnp.maximum(t, cfg.velocity_rel_tol
                        * impulse_scale(contacts, joint_warm))
    return t


def position_threshold(cfg: SimConfig, contacts: Contacts,
                       joint_warm: Optional[jax.Array] = None) -> jax.Array:
    """Runtime displacement-gate threshold (position_rel_tol * scale)."""
    if cfg.position_rel_tol <= 0.0:
        return jnp.float32(0.0)
    return cfg.position_rel_tol * impulse_scale(contacts, joint_warm)


def solve_velocity(bodies: Bodies, contacts: Contacts, cfg: SimConfig,
                   joints: Optional[XlaJoints] = None):
    """Velocity ("impulses") iterations — hot loop #1 (SURVEY.md §3.3).

    Returns (bodies', accum_n, accum_t, residual) where residual is the max
    absolute impulse delta of the LAST iteration (the convergence metric of
    BASELINE.json:5).  With ``joints``, joint colors sweep after the
    contact colors of every iteration and a fifth element — the (J, 2)
    joint velocity accumulator — is appended to the return tuple.
    """
    c = contacts
    n = c.normal
    t = m2.perp(n)
    im1, im2 = bodies.inv_mass[c.b1], bodies.inv_mass[c.b2]
    ii1, ii2 = bodies.inv_inertia[c.b1], bodies.inv_inertia[c.b2]
    if joints is not None:
        j = joints
        is_rev, jr1, jr2, jn = _joint_geom(j)
        jim1, jim2 = bodies.inv_mass[j.b1], bodies.inv_mass[j.b2]
        jii1, jii2 = bodies.inv_inertia[j.b1], bodies.inv_inertia[j.b2]
        m00, m01, m11 = j.rows[:, 4], j.rows[:, 5], j.rows[:, 6]

    def rel_vel(vel, angvel):
        pv1 = vel[c.b1] + m2.cross_sv(angvel[c.b1], c.r1)
        pv2 = vel[c.b2] + m2.cross_sv(angvel[c.b2], c.r2)
        return pv2 - pv1

    def color_sweep(col, carry):
        vel, angvel, an, at, jan, res = carry
        mask = c.valid & (c.color == col)
        # one relative-velocity evaluation; the post-normal tangent
        # velocity follows exactly from the precomputed coupling c_nt
        # (= J_t M^-1 J_n^T, see prepare) — halves the gather/scatter
        # passes per color sweep vs the two-apply form
        dv = rel_vel(vel, angvel)
        vn = m2.dot(n, dv)
        vt = m2.dot(t, dv)
        # normal limiter
        d = (c.dst_v - vn) * c.mass_n
        new_an = jnp.maximum(an + d, 0.0)
        dn = jnp.where(mask, new_an - an, 0.0)
        an = an + dn
        res = jnp.maximum(res, jnp.max(jnp.abs(dn)))
        # friction limiter (clamped by accumulated normal impulse)
        d = -(vt + c.c_nt * dn) * c.mass_t
        max_f = c.friction * an
        new_at = jnp.clip(at + d, -max_f, max_f)
        dt = jnp.where(mask, new_at - at, 0.0)
        at = at + dt
        # combined impulse n*dn + t*dt: one scatter apply
        vel, angvel = _apply(vel, angvel, c, im1, ii1, im2, ii2,
                             n * dn[:, None] + t * dt[:, None])
        res = jnp.maximum(res, jnp.max(jnp.abs(dt)))
        return vel, angvel, an, at, jan, res

    def joint_color_sweep(col, carry):
        vel, angvel, an, at, jan, res = carry
        mask = j.valid & (j.color == col)
        pv1 = vel[j.b1] + m2.cross_sv(angvel[j.b1], jr1)
        pv2 = vel[j.b2] + m2.cross_sv(angvel[j.b2], jr2)
        dv = pv2 - pv1
        # revolute: p = -(M @ dv); distance: p = -(m * n.dv) * n
        px_r = -(m00 * dv[:, 0] + m01 * dv[:, 1])
        py_r = -(m01 * dv[:, 0] + m11 * dv[:, 1])
        dd = -m11 * m2.dot(jn, dv)
        p = jnp.where(is_rev[:, None],
                      jnp.stack([px_r, py_r], axis=1), jn * dd[:, None])
        p = jnp.where(mask[:, None], p, 0.0)
        jan = jan + jnp.where(is_rev[:, None], p,
                              jnp.stack([jnp.where(mask, dd, 0.0),
                                         jnp.zeros_like(dd)], axis=1))
        vel, angvel = _joint_apply(vel, angvel, j, jr1, jr2,
                                   jim1, jii1, jim2, jii2, p)
        res = jnp.maximum(res, jnp.max(jnp.abs(p)))
        return vel, angvel, an, at, jan, res

    def iteration(it, carry):
        def run(carry):
            vel, angvel, an, at, jan, _ = carry
            # reset residual: the reported value is the last EXECUTED one's
            carry = (vel, angvel, an, at, jan, jnp.float32(0.0))
            carry = jax.lax.fori_loop(0, cfg.num_colors, color_sweep, carry)
            if joints is not None:
                carry = jax.lax.fori_loop(0, cfg.num_colors,
                                          joint_color_sweep, carry)
            return carry

        if cfg.velocity_tol <= 0.0 and cfg.velocity_rel_tol <= 0.0:
            return run(carry)
        # residual-gated early exit: absolute (velocity_tol) and/or
        # scale-normalized (velocity_rel_tol * max warm impulse) — the
        # first iteration always runs (it == 0)
        converged = (it > 0) & (carry[5] < vthresh)
        return jax.lax.cond(converged, lambda c: c, run, carry)

    vthresh = velocity_threshold(cfg, contacts,
                                 joints.warm if joints is not None else None)

    jan0 = (joints.warm * jnp.stack(
        [jnp.ones_like(joints.warm[:, 0]),
         (joints.rows[:, 11] == 1.0).astype(jnp.float32)], axis=1)
        if joints is not None else jnp.zeros((0, 2), jnp.float32))
    init = (bodies.vel, bodies.angvel, contacts.warm_n, contacts.warm_t,
            jan0, jnp.float32(0.0))
    vel, angvel, an, at, jan, res = jax.lax.fori_loop(
        0, cfg.velocity_iterations, iteration, init)
    out = bodies.replace(vel=vel, angvel=angvel)
    if joints is not None:
        return out, an, at, res, jan
    return out, an, at, res


def pallas_smem_bytes(n_bodies_cap: int, n_contact_cap: int) -> int:
    """SMEM footprint of the fused solver kernel (kernels/contact_solver.py):
    body in+out (2*N*8 f32), con (C*12), warm (C*2), acc (C*4), b1/b2 (C*2
    i32).  Must stay under the ~1MB SMEM budget or Mosaic refuses to
    compile; step.py uses this to pick a backend that fits."""
    return 4 * (2 * n_bodies_cap * 8
                + n_contact_cap * (12 + 2 + 4 + 2))


def pallas_streamed_smem_bytes(n_bodies_cap: int) -> int:
    """SMEM footprint of the streamed solver (contact_solver_streamed.py):
    body (N*8 f32, aliased in/out) + fixed double-buffered block scratch."""
    from phyx_tpu.kernels.contact_solver_streamed import BLK
    return 4 * n_bodies_cap * 8 + 2 * BLK * (12 + 2 + 4 + 1 + 1) * 4


PALLAS_SMEM_BUDGET = 900 * 1024   # leave headroom under the 1MB space


def solve_pallas(bodies: Bodies, contacts: Contacts, num_contacts: jax.Array,
                 cfg: SimConfig, streamed: bool = False, joints=None,
                 joint_rows: jax.Array | None = None,
                 joint_warm: jax.Array | None = None,
                 ) -> Tuple[Bodies, jax.Array, jax.Array, jax.Array,
                            jax.Array]:
    """Fused warm-start + velocity + position solve via the Pallas kernels
    (kernels/contact_solver*.py).  Exact sequential Gauss-Seidel order —
    no coloring needed; returns (bodies', accum_n, accum_t, residual,
    joint_accum (J, 2)).  ``streamed`` selects the HBM-streaming variant
    for contact buffers beyond SMEM capacity.  ``joints`` (+ prepared
    ``joint_rows``/``joint_warm`` from joints.prepare_joint_rows) appends
    user-joint rows after the contact region (fused kernel only)."""
    from phyx_tpu.kernels.contact_solver import solve_contacts_fused

    n = bodies.capacity
    c = contacts.valid.shape[0]
    j_cap = 0 if joints is None else joints.capacity
    zeros3 = jnp.zeros((n, 3), jnp.float32)
    body_flat = jnp.concatenate([
        bodies.vel,
        bodies.angvel[:, None],
        bodies.inv_mass[:, None],
        bodies.inv_inertia[:, None],
        zeros3,
    ], axis=1).reshape(-1)
    con_flat = jnp.stack([
        contacts.normal[:, 0], contacts.normal[:, 1],
        contacts.r1[:, 0], contacts.r1[:, 1],
        contacts.r2[:, 0], contacts.r2[:, 1],
        contacts.mass_n, contacts.mass_t, contacts.friction,
        contacts.dst_v, contacts.dst_dv,
        contacts.c_nt,
    ], axis=1)
    warm_flat = jnp.stack([contacts.warm_n, contacts.warm_t], axis=1)
    b1, b2 = contacts.b1, contacts.b2
    num_joints = None
    j_pad = 0
    if j_cap:
        jrows, jwarm = joint_rows, joint_warm
        nb = jnp.int32(n - 1)
        jb1 = jnp.minimum(joints.b1, nb)
        jb2 = jnp.minimum(joints.b2, nb)
        if streamed:
            # the streamed kernel DMAs whole 1024-slot blocks: pad the
            # joint region to a BLK multiple (zero rows = exact no-ops)
            from phyx_tpu.kernels.contact_solver_streamed import BLK as _B
            j_pad = -(-j_cap // _B) * _B - j_cap
            if j_pad:
                jrows = jnp.concatenate(
                    [jrows, jnp.zeros((j_pad, 12), jnp.float32)], axis=0)
                jwarm = jnp.concatenate(
                    [jwarm, jnp.zeros((j_pad, 2), jnp.float32)], axis=0)
                jb1 = jnp.concatenate([jb1, jnp.zeros((j_pad,), jnp.int32)])
                jb2 = jnp.concatenate([jb2, jnp.zeros((j_pad,), jnp.int32)])
        con_flat = jnp.concatenate([con_flat, jrows], axis=0)
        warm_flat = jnp.concatenate([warm_flat, jwarm], axis=0)
        b1 = jnp.concatenate([b1, jb1])
        b2 = jnp.concatenate([b2, jb2])
        num_joints = (joints.kind != 0).sum(dtype=jnp.int32)
    con_flat = con_flat.reshape(-1)
    warm_flat = warm_flat.reshape(-1)

    # Body ids are pre-scaled to row offsets (id * 8) so the serial sweeps
    # skip the per-visit index multiply (every pass, every kernel).
    b1 = b1 * 8
    b2 = b2 * 8

    # Residual gates: static compile flags (which gates exist) + runtime
    # thresholds (scale-normalized per frame — no recompilation).
    vel_gated = cfg.velocity_tol > 0.0 or cfg.velocity_rel_tol > 0.0
    pos_gated = cfg.position_rel_tol > 0.0
    tols = None
    if vel_gated or pos_gated:
        jw = joint_warm if j_cap else None
        tols = jnp.stack([velocity_threshold(cfg, contacts, jw),
                          position_threshold(cfg, contacts, jw)])
    if streamed:
        from phyx_tpu.kernels.contact_solver_streamed import \
            solve_contacts_streamed
        body_out, acc, res = solve_contacts_streamed(
            body_flat, b1, b2, con_flat, warm_flat,
            num_contacts, cfg.velocity_iterations, cfg.position_iterations,
            num_joints=num_joints, c_cap=c, vel_gated=vel_gated,
            pos_gated=pos_gated, tols=tols)
        acc = acc.reshape(c + j_cap + j_pad, 4)
    else:
        body_out, acc, res = solve_contacts_fused(
            body_flat, b1, b2, con_flat, warm_flat,
            num_contacts, cfg.velocity_iterations, cfg.position_iterations,
            num_joints=num_joints, j_cap=j_cap, vel_gated=vel_gated,
            pos_gated=pos_gated, tols=tols)
        acc = acc.reshape(c + j_cap, 4)

    body_out = body_out.reshape(n, 8)
    bodies = bodies.replace(
        vel=body_out[:, 0:2],
        angvel=body_out[:, 2],
        dvel=body_out[:, 5:7],
        dangvel=body_out[:, 7],
    )
    joint_accum = (acc[c:c + j_cap, 0:2] if j_cap
                   else jnp.zeros((0, 2), jnp.float32))
    return bodies, acc[:c, 0], acc[:c, 1], res[0], joint_accum


def _route_rows_to_slabs(lb1, lb2, slab, live, cols,
                         n_slabs: int, cap_slots: int):
    """Sort rows into a per-slab padded slot layout — NO row gathers.

    Round-4 rework (the profiled 'solve' stage at settled config E
    carried ~200 ms of row-serialized data movement): the row payload
    (endpoints + the ``cols`` f32 columns) is CARRIED through the
    routing sort as extra sort operands (fenced: payload carry beats a
    packed row gather ~5x at mega rows, BASELINE.md), and the padded
    per-slab layout is then built with ``n_slabs`` CONTIGUOUS
    dynamic slices at the run boundaries — replacing one m-row
    permutation gather plus three packed row gathers.  Slots past a
    slab's live count hold junk from the next run, which is safe: the
    kernel sweeps strictly ``k < cnt`` per block and the warm pass
    zero-fills dead acc slots.

    The sort is stable (lax.sort default), so the routing order —
    Gauss-Seidel visit order — is bit-identical to the previous
    (skey, arange) form regardless of payload count.

    Returns (t_b1, t_b2, t_cols (T, len(cols)) f32, per-slab live
    counts (clamped), overflow beyond slab capacity, and an opaque
    ``routing`` handle consumed by _unroute_rows)."""
    m = live.shape[0]
    skey = jnp.where(live, slab, n_slabs)         # dead rows last
    iota = jnp.arange(m, dtype=jnp.int32)
    ops = jax.lax.sort((skey, lb1, lb2, iota) + tuple(cols), num_keys=1)
    skey_s, lb1_s, lb2_s, order2 = ops[:4]
    bounds = jnp.searchsorted(
        skey_s, jnp.arange(n_slabs + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32)
    counts = bounds[1:] - bounds[:-1]
    starts = bounds[:-1]
    overflow = jnp.maximum(counts - cap_slots, 0).sum()
    # within-run position via cummax over run starts (no inverse-
    # permutation scatter: the old zeros.at[order2].set(arange) was a
    # row-serialized m-row scatter)
    chg = jnp.concatenate(
        [jnp.ones((1,), bool), skey_s[1:] != skey_s[:-1]])
    run_start = jax.lax.cummax(jnp.where(chg, iota, 0))
    ok_sorted = (iota - run_start < cap_slots) & (skey_s < n_slabs)

    S_i = jnp.concatenate([jnp.stack([lb1_s, lb2_s], axis=1),
                           jnp.zeros((cap_slots, 2), jnp.int32)])
    S_f = jnp.concatenate([jnp.stack(ops[4:], axis=1),
                           jnp.zeros((cap_slots, len(cols)), jnp.float32)])
    T_i = jnp.concatenate([
        jax.lax.dynamic_slice(S_i, (starts[s], 0), (cap_slots, 2))
        for s in range(n_slabs)])
    T_f = jnp.concatenate([
        jax.lax.dynamic_slice(S_f, (starts[s], 0), (cap_slots, len(cols)))
        for s in range(n_slabs)])
    return (T_i, T_f, jnp.minimum(counts, cap_slots),
            overflow, (starts, order2, ok_sorted))


def _unroute_rows(acc, routing, n_slabs: int, cap_all: int,
                  base_off: int, cap_slots: int):
    """Inverse of _route_rows_to_slabs for solver accumulators — also
    gather/scatter-free.  ``acc`` is (n_slabs*cap_all, ncols); rows
    [s*cap_all + base_off, +cap_slots) belong to this row class's slab
    s.  Per-slab contiguous dynamic_update_slice copies bring the slot
    values back into routing-sorted order (slab s+1's write starts
    exactly at starts[s]+counts[s], so earlier slabs' spill past their
    live count is overwritten; overflow/dead positions keep junk and
    are masked by the carried ``ok`` flag), then ONE stable sort keyed
    by order2 — a permutation of arange(m) — is the exact inverse
    permutation, carrying the acc columns as payload.

    Returns ((m, ncols) acc in original row order, (m,) ok mask)."""
    starts, order2, ok_sorted = routing
    m = order2.shape[0]
    ncols = acc.shape[1]
    buf = jnp.zeros((m + cap_slots, ncols), acc.dtype)
    for s in range(n_slabs):
        block = jax.lax.dynamic_slice(
            acc, (s * cap_all + base_off, 0), (cap_slots, ncols))
        buf = jax.lax.dynamic_update_slice(buf, block, (starts[s], 0))
    sortedv = buf[:m]
    unp = jax.lax.sort(
        (order2, ok_sorted.astype(jnp.int32))
        + tuple(sortedv[:, k] for k in range(ncols)), num_keys=1)
    return jnp.stack(unp[2:], axis=1), unp[1].astype(bool)


def solve_pallas_tiled(bodies: Bodies, contacts: Contacts,
                       order: jax.Array, cfg: SimConfig, joints=None,
                       joint_rows: jax.Array | None = None,
                       joint_warm: jax.Array | None = None,
                       ) -> Tuple[Bodies, jax.Array, jax.Array, jax.Array,
                                  jax.Array, jax.Array]:
    """Tiled solve for scenes whose body table exceeds SMEM (100k+).

    ``order`` is the x-sort permutation (rank r -> body id), normally the
    broadphase's sort.  Bodies are embedded into a slab layout where each
    slab window starts with a 128-row zero block: partners whose body row
    literally EQUALS the zero row (statics at rest) are remapped to it
    (exact — reads return zeros, writes through zero inverse mass are
    no-ops), so a scene-wide ground never forces a giant window; kinematic
    statics keep their real rows.  Dynamic partners must fall inside their
    row's slab window (halo ``cfg.tile_halo`` ranks); violations are
    clamped and counted in the returned overflow.

    User joints (round 2) route to slabs exactly like contacts and sweep
    after each slab's contact blocks (kernels/contact_solver_tiled.py).

    Returns (bodies', accum_n, accum_t, residual, tiled_overflow,
    joint_accum (J, 2)).
    """
    from phyx_tpu.kernels.contact_solver_streamed import BLK
    from phyx_tpu.kernels.contact_solver_tiled import solve_contacts_tiled

    n = bodies.capacity
    c = contacts.valid.shape[0]
    j_cap = 0 if joints is None else joints.capacity
    K = cfg.tile_stride                 # rows per slab stride (mult 128)
    H = cfg.tile_halo                   # extra halo rows (mult 128)
    W = K + H
    rps = K - 128                       # real bodies per slab stride
    n_slabs = -(-n // rps)
    npad = n_slabs * K + H

    # rank of each body id (inverse of order) — a 1-key payload sort of
    # the permutation IS the inverse permutation (round 4: replaces the
    # row-serialized zeros.at[order].set scatter)
    iota_n = jnp.arange(n, dtype=jnp.int32)
    _, rank = jax.lax.sort((order, iota_n), num_keys=1)
    # embedded row of rank r: slab zero-block layout
    def pos_of_rank(r):
        return (r // rps) * K + 128 + r % rps
    pos = pos_of_rank(rank)             # id -> embedded row

    # embedded body table (round 4, gather-free): carry the 5 live body
    # columns through a sort by rank — ranked row r is body order[r] —
    # then the slab layout is static slicing (each slab's window is a
    # contiguous rank range behind its 128-row zero block)
    body_cols = (bodies.vel[:, 0], bodies.vel[:, 1], bodies.angvel,
                 bodies.inv_mass, bodies.inv_inertia)
    ranked_ops = jax.lax.sort((rank,) + body_cols, num_keys=1)
    ranked = jnp.stack(ranked_ops[1:] + (
        jnp.zeros((n,), jnp.float32),) * 3, axis=1)        # (N, 8)
    pad_rows = n_slabs * rps - n
    if pad_rows:
        ranked = jnp.concatenate(
            [ranked, jnp.zeros((pad_rows, 8), jnp.float32)])
    zero_blk = jnp.zeros((128, 8), jnp.float32)
    embedded = jnp.concatenate(
        [jnp.concatenate([zero_blk, ranked[s * rps:(s + 1) * rps]])
         for s in range(n_slabs)]
        + [jnp.zeros((H, 8), jnp.float32)])                # (npad, 8)

    # Only bodies whose row literally EQUALS the zero row (zero
    # velocity/angvel AND both inverse masses zero) may be remapped to
    # it — a kinematic static (inv_mass 0, velocity set, which
    # SceneBuilder.add_box permits) contributes real motion to relative-
    # velocity terms and must keep its actual embedded row (ADVICE r1 #1).
    zero_safe = ((bodies.inv_mass == 0.0) & (bodies.inv_inertia == 0.0)
                 & jnp.all(bodies.vel == 0.0, axis=1) & (bodies.angvel == 0.0))
    # packed per-body lookup: embedded row and the zero-remap flag ride
    # ONE gather (npad*2 < 2^31); contacts resolve it at PAIR level (the
    # two point slots of a pair share endpoints) — together 4 C-row
    # gathers become 2 (C/2)-row gathers
    pz_tab = pos * 2 + zero_safe.astype(jnp.int32)

    def route_endpoints(eb1, eb2):
        z1 = pz_tab[eb1]
        z2 = pz_tab[eb2]
        b1p = z1 >> 1
        b2p = z2 >> 1
        st1 = (z1 & 1) == 1
        st2 = (z2 & 1) == 1
        dyn_min = jnp.where(st1, b2p,
                            jnp.where(st2, b1p, jnp.minimum(b1p, b2p)))
        slab = jnp.clip(dyn_min // K, 0, n_slabs - 1)
        zero_row = slab * K
        lb1 = jnp.where(st1, zero_row, b1p)
        lb2 = jnp.where(st2, zero_row, b2p)
        lo, hi = slab * K, slab * K + W
        in_win = (lb1 >= lo) & (lb1 < hi) & (lb2 >= lo) & (lb2 < hi)
        lb1 = jnp.clip(lb1, lo, hi - 1)
        lb2 = jnp.clip(lb2, lo, hi - 1)
        return lb1, lb2, slab, in_win

    live = contacts.valid
    half = c // 2
    plb1, plb2, pslab, pin = route_endpoints(
        contacts.b1.reshape(half, 2)[:, 0],
        contacts.b2.reshape(half, 2)[:, 0])

    def rep2(x):
        return jnp.repeat(x, 2, total_repeat_length=c)

    lb1, lb2, slab = rep2(plb1), rep2(plb2), rep2(pslab)
    tiled_overflow = (live & ~rep2(pin)).sum(dtype=jnp.int32)

    cbps = -(-(2 * c // n_slabs) // BLK)          # blocks per slab (2x avg)
    if n_slabs == 1:
        cbps = max(cbps, 2)   # kernel hazard guard: >= 2 walked steps/pass
    cap_c = cbps * BLK
    cols_c = (
        contacts.normal[:, 0], contacts.normal[:, 1],
        contacts.r1[:, 0], contacts.r1[:, 1],
        contacts.r2[:, 0], contacts.r2[:, 1],
        contacts.mass_n, contacts.mass_t, contacts.friction,
        contacts.dst_v, contacts.dst_dv,
        contacts.c_nt, contacts.warm_n, contacts.warm_t)
    (t_b12, t_cw, counts_c, ovf_c, routing_c) = _route_rows_to_slabs(
        lb1, lb2, slab, live, cols_c, n_slabs, cap_c)
    tiled_overflow = tiled_overflow + ovf_c

    jbps = 0
    if j_cap:
        jlive = joints.kind != 0
        jb1, jb2, jslab, jin = route_endpoints(joints.b1, joints.b2)
        tiled_overflow = tiled_overflow + (
            jlive & ~jin).sum(dtype=jnp.int32)
        jbps = max(1, -(-(2 * j_cap // n_slabs) // BLK))
        cap_j = jbps * BLK
        cols_j = (tuple(joint_rows[:, k] for k in range(12))
                  + tuple(joint_warm[:, k] for k in range(2)))
        (u_b12, u_cw, counts_j, ovf_j, routing_j) = \
            _route_rows_to_slabs(jb1, jb2, jslab, jlive, cols_j,
                                 n_slabs, cap_j)
        tiled_overflow = tiled_overflow + ovf_j
        # interleave: per slab, contact blocks then joint blocks
        def ilv(a, b):
            a = a.reshape((n_slabs, cap_c) + a.shape[1:])
            b = b.reshape((n_slabs, cap_j) + b.shape[1:])
            return jnp.concatenate([a, b], axis=1).reshape(
                (n_slabs * (cap_c + cap_j),) + a.shape[2:])
        t_b12 = ilv(t_b12, u_b12)
        t_cw = ilv(t_cw, u_cw)
        slab_counts = jnp.concatenate([counts_c, counts_j])
    else:
        slab_counts = jnp.concatenate(
            [counts_c, jnp.zeros((n_slabs,), jnp.int32)])

    # pre-scaled to WINDOW-LOCAL row offsets (round 4): each slot's slab
    # is static (q // cap_all), so the slab window base is subtracted
    # here, vectorized — the kernel's per-visit `- base8` (2 scalar ops
    # per visit) is gone.  Junk/dead slots may go negative: never read.
    cap_all = cap_c + jbps * BLK
    base_rows = (jnp.arange(t_b12.shape[0], dtype=jnp.int32)
                 // cap_all) * K
    t_b12 = (t_b12 - base_rows[:, None]) * 8
    # block-transposed endpoint layout (round 5): each BLK-slot block
    # stores [b1 x BLK][b2 x BLK] instead of interleaved pairs, so the
    # kernel reads b12r[k] / b12r[BLK + k] — one shared index register
    # plus a static offset — instead of computing 2k/2k+1 per visit
    # (~1 scalar op saved per visit on the naive-addressing core; the
    # DMA stays one contiguous BLK*2 copy per block)
    t_b12 = t_b12.reshape(-1, BLK, 2).swapaxes(1, 2)
    # Residual gates (round 4, VERDICT r3 #4 — the tiled kernel was the
    # last backend without them): static compile flags + runtime
    # scale-normalized thresholds, same scheme as solve_pallas above.
    vel_gated = cfg.velocity_tol > 0.0 or cfg.velocity_rel_tol > 0.0
    pos_gated = cfg.position_rel_tol > 0.0
    tols = None
    if vel_gated or pos_gated:
        jw = joint_warm if j_cap else None
        tols = jnp.stack([velocity_threshold(cfg, contacts, jw),
                          position_threshold(cfg, contacts, jw)])
    body_out, acc, res = solve_contacts_tiled(
        embedded.reshape(-1), t_b12.reshape(-1), t_cw.reshape(-1),
        slab_counts,
        cfg.velocity_iterations, cfg.position_iterations,
        n_slabs, K, W, jbps=jbps, vel_gated=vel_gated,
        pos_gated=pos_gated, tols=tols)

    # un-embed bodies (round 4, gather-free): static slices pull the
    # rank-ordered rows out of the slab layout, then one sort keyed by
    # ``order`` (ranked row r belongs to body order[r]) un-permutes the
    # 6 consumed columns back to id order — replaces the (N, 8)
    # body_out[pos] row gather
    body_out = body_out.reshape(npad, 8)
    ranked_out = jnp.concatenate(
        [body_out[s * K + 128:(s + 1) * K] for s in range(n_slabs)])[:n]
    unp = jax.lax.sort(
        (order, ranked_out[:, 0], ranked_out[:, 1], ranked_out[:, 2],
         ranked_out[:, 5], ranked_out[:, 6], ranked_out[:, 7]),
        num_keys=1)
    bodies = bodies.replace(
        vel=jnp.stack(unp[1:3], axis=1), angvel=unp[3],
        dvel=jnp.stack(unp[4:6], axis=1), dangvel=unp[6])

    # un-route accumulators: sort-based inverse routing (round 4 — the
    # old form was an m-row slot gather plus the inverse-permutation
    # scatter inside _route_rows_to_slabs, together ~100 ms of
    # row-serialized movement at settled config E)
    acc2 = acc.reshape(n_slabs * cap_all, 4)[:, :2]
    acc_c, ok_c = _unroute_rows(acc2, routing_c, n_slabs, cap_all,
                                0, cap_c)
    accum_n = jnp.where(live & ok_c, acc_c[:, 0], 0.0)
    accum_t = jnp.where(live & ok_c, acc_c[:, 1], 0.0)
    if j_cap:
        acc_j, ok_j = _unroute_rows(acc2, routing_j, n_slabs, cap_all,
                                    cap_c, cap_j)
        joint_accum = jnp.where((jlive & ok_j)[:, None], acc_j, 0.0)
    else:
        joint_accum = jnp.zeros((0, 2), jnp.float32)
    return bodies, accum_n, accum_t, res[0], tiled_overflow, joint_accum


def solve_pallas_tiled2(bodies: Bodies, contacts: Contacts, routing,
                        cfg: SimConfig
                        ) -> Tuple[Bodies, jax.Array, jax.Array, jax.Array]:
    """Slab-segmented tiled solve (round 5, VERDICT r4 #1/#2): consumes
    the broadphase's slab-major TiledRouting, so the entire prep is
    elementwise — no routing sort (the round-4 path's 20-operand
    _route_rows_to_slabs), no accumulator unroute sort, no body rank /
    ranked-column sorts (they rode the broadphase's own sort), and the
    accumulators come back in natural contact order.

    Visit order equals the round-4 tiled path's (slab-ascending,
    (pi, pj)-ascending within a slab): the round-4 routing sort was
    STABLE over (pi, pj)-finalized pairs, and the slab-major finalize
    sorts by exactly (slab, pi, pj).  SAT-dead slots inside live pairs
    are now visited as exact no-ops instead of being compacted away
    (~9% extra visits at settled config E, traded against ~50+ ms of
    sort movement per step).

    Jointless only — jointed tiled scenes keep solve_pallas_tiled.
    Returns (bodies', accum_n, accum_t, residual); slab clamp overflow
    was already counted by the broadphase into pairs.ovf_slab."""
    from phyx_tpu.kernels.contact_solver_streamed import BLK
    from phyx_tpu.kernels.contact_solver_tiled2 import solve_contacts_tiled2
    from phyx_tpu.tiling import slab_dims

    n = bodies.capacity
    c = contacts.valid.shape[0]
    K, H, W, rps, n_slabs, npad = slab_dims(cfg, n)

    # embedded body table: ranked value columns came off the broadphase
    # sort; the slab layout is static slicing around the 128-row zero
    # blocks (same embedding as solve_pallas_tiled)
    ranked = jnp.concatenate(
        [routing.ranked_cols, jnp.zeros((n, 3), jnp.float32)], axis=1)
    pad_rows = n_slabs * rps - n
    if pad_rows:
        ranked = jnp.concatenate(
            [ranked, jnp.zeros((pad_rows, 8), jnp.float32)])
    zero_blk = jnp.zeros((128, 8), jnp.float32)
    embedded = jnp.concatenate(
        [jnp.concatenate([zero_blk, ranked[s * rps:(s + 1) * rps]])
         for s in range(n_slabs)]
        + [jnp.zeros((H, 8), jnp.float32)])                # (npad, 8)

    def rep2(x):
        return jnp.repeat(x, 2, total_repeat_length=c)

    # block-transposed window-local endpoints (lb* pre-scaled x8 by the
    # broadphase): [b1 x BLK][b2 x BLK] per block, one contiguous DMA
    t_b12 = jnp.stack([rep2(routing.lb1), rep2(routing.lb2)], axis=1)
    t_b12 = t_b12.reshape(-1, BLK, 2).swapaxes(1, 2)
    cw = jnp.stack([
        contacts.normal[:, 0], contacts.normal[:, 1],
        contacts.r1[:, 0], contacts.r1[:, 1],
        contacts.r2[:, 0], contacts.r2[:, 1],
        contacts.mass_n, contacts.mass_t, contacts.friction,
        contacts.dst_v, contacts.dst_dv,
        contacts.c_nt, contacts.warm_n, contacts.warm_t], axis=1)
    cum = routing.pair_cum * 2                              # slots

    vel_gated = cfg.velocity_tol > 0.0 or cfg.velocity_rel_tol > 0.0
    pos_gated = cfg.position_rel_tol > 0.0
    tols = None
    if vel_gated or pos_gated:
        tols = jnp.stack([velocity_threshold(cfg, contacts, None),
                          position_threshold(cfg, contacts, None)])
    body_out, acc, res = solve_contacts_tiled2(
        embedded.reshape(-1), t_b12.reshape(-1), cw.reshape(-1), cum,
        cfg.velocity_iterations, cfg.position_iterations,
        n_slabs, K, W, vel_gated=vel_gated, pos_gated=pos_gated,
        tols=tols)

    # un-embed: static slices + one sort keyed by the broadphase's order
    body_out = body_out.reshape(npad, 8)
    ranked_out = jnp.concatenate(
        [body_out[s * K + 128:(s + 1) * K] for s in range(n_slabs)])[:n]
    unp = jax.lax.sort(
        (routing.order, ranked_out[:, 0], ranked_out[:, 1],
         ranked_out[:, 2], ranked_out[:, 5], ranked_out[:, 6],
         ranked_out[:, 7]),
        num_keys=1)
    bodies = bodies.replace(
        vel=jnp.stack(unp[1:3], axis=1), angvel=unp[3],
        dvel=jnp.stack(unp[4:6], axis=1), dangvel=unp[6])

    # accumulators are already in contact order — no unroute
    acc2 = acc.reshape(c, 4)
    live = contacts.valid
    accum_n = jnp.where(live, acc2[:, 0], 0.0)
    accum_t = jnp.where(live, acc2[:, 1], 0.0)
    return bodies, accum_n, accum_t, res[0]


def solve_position(bodies: Bodies, contacts: Contacts, cfg: SimConfig,
                   joints: Optional[XlaJoints] = None) -> Bodies:
    """Displacement iterations on pseudo-velocities — hot loop #2.

    Split-impulse: resolves penetration without injecting kinetic energy;
    results land in bodies.dvel / bodies.dangvel, consumed once by position
    integration (step.py) and then zeroed.  With ``joints``, joint colors
    (anchor-error targets from prepare_joint_rows) sweep after the contact
    colors of every iteration.
    """
    c = contacts
    n = c.normal
    im1, im2 = bodies.inv_mass[c.b1], bodies.inv_mass[c.b2]
    ii1, ii2 = bodies.inv_inertia[c.b1], bodies.inv_inertia[c.b2]
    if joints is not None:
        j = joints
        is_rev, jr1, jr2, jn = _joint_geom(j)
        jim1, jim2 = bodies.inv_mass[j.b1], bodies.inv_mass[j.b2]
        jii1, jii2 = bodies.inv_inertia[j.b1], bodies.inv_inertia[j.b2]
        m00, m01, m11 = j.rows[:, 4], j.rows[:, 5], j.rows[:, 6]

    gated = cfg.position_rel_tol > 0.0

    def color_sweep(col, carry):
        dvel, dang, ad, res = carry
        mask = c.valid & (c.color == col)
        pv1 = dvel[c.b1] + m2.cross_sv(dang[c.b1], c.r1)
        pv2 = dvel[c.b2] + m2.cross_sv(dang[c.b2], c.r2)
        dv = m2.dot(n, pv2 - pv1)
        d = (c.dst_dv - dv) * c.mass_n
        new_ad = jnp.maximum(ad + d, 0.0)
        d = jnp.where(mask, new_ad - ad, 0.0)
        ad = ad + d
        dvel, dang = _apply(dvel, dang, c, im1, ii1, im2, ii2, n * d[:, None])
        if gated:
            res = jnp.maximum(res, jnp.max(jnp.abs(d)))
        return dvel, dang, ad, res

    def joint_color_sweep(col, carry):
        dvel, dang, ad, res = carry
        mask = j.valid & (j.color == col)
        pv1 = dvel[j.b1] + m2.cross_sv(dang[j.b1], jr1)
        pv2 = dvel[j.b2] + m2.cross_sv(dang[j.b2], jr2)
        dv = pv2 - pv1
        # revolute target (dstx, dsty); distance target scalar along n
        ex = j.rows[:, 7] - dv[:, 0]
        ey = j.rows[:, 8] - dv[:, 1]
        px_r = m00 * ex + m01 * ey
        py_r = m01 * ex + m11 * ey
        dd = m11 * (j.rows[:, 7] - m2.dot(jn, dv))
        p = jnp.where(is_rev[:, None],
                      jnp.stack([px_r, py_r], axis=1), jn * dd[:, None])
        p = jnp.where(mask[:, None], p, 0.0)
        dvel, dang = _joint_apply(dvel, dang, j, jr1, jr2,
                                  jim1, jii1, jim2, jii2, p)
        if gated:
            res = jnp.maximum(res, jnp.max(jnp.abs(p)))
        return dvel, dang, ad, res

    def run(carry):
        dvel, dang, ad, _ = carry
        carry = (dvel, dang, ad, jnp.float32(0.0))
        carry = jax.lax.fori_loop(0, cfg.num_colors, color_sweep, carry)
        if joints is not None:
            carry = jax.lax.fori_loop(0, cfg.num_colors,
                                      joint_color_sweep, carry)
        return carry

    if gated:
        pthresh = position_threshold(
            cfg, contacts, joints.warm if joints is not None else None)

        def iteration(it, carry):
            converged = (it > 0) & (carry[3] < pthresh)
            return jax.lax.cond(converged, lambda x: x, run, carry)
    else:
        def iteration(it, carry):
            return run(carry)

    zeros_ad = jnp.zeros_like(contacts.warm_n)
    dvel, dang, _, _ = jax.lax.fori_loop(
        0, cfg.position_iterations, iteration,
        (jnp.zeros_like(bodies.vel), jnp.zeros_like(bodies.angvel),
         zeros_ad, jnp.float32(0.0)))
    return bodies.replace(dvel=dvel, dangvel=dang)
