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

from typing import Tuple

import jax
import jax.numpy as jnp

from phyx_tpu import math2d as m2
from phyx_tpu.config import SimConfig
from phyx_tpu.narrowphase import Contacts
from phyx_tpu.types import Bodies


def prepare(bodies: Bodies, contacts: Contacts, cfg: SimConfig) -> Contacts:
    """Batched PrepareJoints (SURVEY.md §3.4)."""
    b1, b2 = contacts.b1, contacts.b2
    n = contacts.normal
    t = m2.perp(n)
    r1, r2 = contacts.r1, contacts.r2
    # one packed property gather per side (serial-gather-free on TPU)
    props = jnp.concatenate([
        bodies.vel,                      # 0:2
        bodies.angvel[:, None],          # 2
        bodies.inv_mass[:, None],        # 3
        bodies.inv_inertia[:, None],     # 4
        bodies.friction[:, None],        # 5
        bodies.restitution[:, None],     # 6
        jnp.zeros_like(bodies.angvel[:, None]),
    ], axis=1)                           # (N, 8)
    # XLA's native row gather measured faster than a serial Pallas scalar
    # gather on v5e (fenced, ~8 ms/step at 10k) — keep it plain.
    p1 = props[b1]
    p2 = props[b2]
    im1, im2 = p1[:, 3], p2[:, 3]
    ii1, ii2 = p1[:, 4], p2[:, 4]

    rn1, rn2 = m2.cross(r1, n), m2.cross(r2, n)
    kn = im1 + im2 + ii1 * rn1 * rn1 + ii2 * rn2 * rn2
    mass_n = jnp.where(kn > 0.0, 1.0 / jnp.maximum(kn, 1e-30), 0.0)

    rt1, rt2 = m2.cross(r1, t), m2.cross(r2, t)
    kt = im1 + im2 + ii1 * rt1 * rt1 + ii2 * rt2 * rt2
    mass_t = jnp.where(kt > 0.0, 1.0 / jnp.maximum(kt, 1e-30), 0.0)

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


def warm_start(bodies: Bodies, contacts: Contacts) -> Bodies:
    """Apply cached accumulated impulses before iterating (SURVEY.md §3.2)."""
    c = contacts
    n = c.normal
    t = m2.perp(n)
    imp = n * c.warm_n[:, None] + t * c.warm_t[:, None]
    imp = jnp.where(c.valid[:, None], imp, 0.0)
    im1, im2 = bodies.inv_mass[c.b1], bodies.inv_mass[c.b2]
    ii1, ii2 = bodies.inv_inertia[c.b1], bodies.inv_inertia[c.b2]
    vel, angvel = _apply(bodies.vel, bodies.angvel, c, im1, ii1, im2, ii2, imp)
    return bodies.replace(vel=vel, angvel=angvel)


def solve_velocity(bodies: Bodies, contacts: Contacts, cfg: SimConfig
                   ) -> Tuple[Bodies, jax.Array, jax.Array, jax.Array]:
    """Velocity ("impulses") iterations — hot loop #1 (SURVEY.md §3.3).

    Returns (bodies', accum_n, accum_t, residual) where residual is the max
    absolute impulse delta of the LAST iteration (the convergence metric of
    BASELINE.json:5).
    """
    c = contacts
    n = c.normal
    t = m2.perp(n)
    im1, im2 = bodies.inv_mass[c.b1], bodies.inv_mass[c.b2]
    ii1, ii2 = bodies.inv_inertia[c.b1], bodies.inv_inertia[c.b2]

    def rel_vel(vel, angvel):
        pv1 = vel[c.b1] + m2.cross_sv(angvel[c.b1], c.r1)
        pv2 = vel[c.b2] + m2.cross_sv(angvel[c.b2], c.r2)
        return pv2 - pv1

    def color_sweep(col, carry):
        vel, angvel, an, at, res = carry
        mask = c.valid & (c.color == col)
        # normal limiter
        dv = m2.dot(n, rel_vel(vel, angvel))
        d = (c.dst_v - dv) * c.mass_n
        new_an = jnp.maximum(an + d, 0.0)
        d = jnp.where(mask, new_an - an, 0.0)
        an = an + d
        vel, angvel = _apply(vel, angvel, c, im1, ii1, im2, ii2,
                             n * d[:, None])
        res = jnp.maximum(res, jnp.max(jnp.abs(d)))
        # friction limiter (clamped by accumulated normal impulse)
        dvt = m2.dot(t, rel_vel(vel, angvel))
        d = -dvt * c.mass_t
        max_f = c.friction * an
        new_at = jnp.clip(at + d, -max_f, max_f)
        d = jnp.where(mask, new_at - at, 0.0)
        at = at + d
        vel, angvel = _apply(vel, angvel, c, im1, ii1, im2, ii2,
                             t * d[:, None])
        res = jnp.maximum(res, jnp.max(jnp.abs(d)))
        return vel, angvel, an, at, res

    def iteration(it, carry):
        def run(carry):
            vel, angvel, an, at, _ = carry
            # reset residual: the reported value is the last EXECUTED one's
            carry = (vel, angvel, an, at, jnp.float32(0.0))
            return jax.lax.fori_loop(0, cfg.num_colors, color_sweep, carry)

        if cfg.velocity_tol <= 0.0:
            return run(carry)
        # residual-gated early exit (cfg.velocity_tol): the first
        # iteration always runs (res starts at +inf sentinel via it == 0)
        converged = (it > 0) & (carry[4] < cfg.velocity_tol)
        return jax.lax.cond(converged, lambda c: c, run, carry)

    init = (bodies.vel, bodies.angvel, contacts.warm_n, contacts.warm_t,
            jnp.float32(0.0))
    vel, angvel, an, at, res = jax.lax.fori_loop(
        0, cfg.velocity_iterations, iteration, init)
    return bodies.replace(vel=vel, angvel=angvel), an, at, res


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
        jnp.zeros((c,), jnp.float32),
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

    if streamed:
        from phyx_tpu.kernels.contact_solver_streamed import \
            solve_contacts_streamed
        body_out, acc, res = solve_contacts_streamed(
            body_flat, b1, b2, con_flat, warm_flat,
            num_contacts, cfg.velocity_iterations, cfg.position_iterations,
            num_joints=num_joints, c_cap=c, vel_tol=cfg.velocity_tol)
        acc = acc.reshape(c + j_cap + j_pad, 4)
    else:
        body_out, acc, res = solve_contacts_fused(
            body_flat, b1, b2, con_flat, warm_flat,
            num_contacts, cfg.velocity_iterations, cfg.position_iterations,
            num_joints=num_joints, j_cap=j_cap, vel_tol=cfg.velocity_tol)
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


def solve_pallas_tiled(bodies: Bodies, contacts: Contacts,
                       order: jax.Array, cfg: SimConfig
                       ) -> Tuple[Bodies, jax.Array, jax.Array, jax.Array,
                                  jax.Array]:
    """Tiled solve for scenes whose body table exceeds SMEM (100k+).

    ``order`` is the x-sort permutation (rank r -> body id), normally the
    broadphase's sort.  Bodies are embedded into a slab layout where each
    slab window starts with a 128-row zero block: contacts' STATIC partners
    are remapped to that zero row (exact — static bodies read zero velocity
    and zero inverse masses, and writes through zero inverse mass are
    no-ops), so a scene-wide ground never forces a giant window.  Dynamic
    partners must fall inside their contact's slab window (halo
    ``cfg.tile_halo`` ranks); violations are clamped and counted in the
    returned overflow.

    Returns (bodies', accum_n, accum_t, residual, tiled_overflow).
    """
    from phyx_tpu.kernels.contact_solver_streamed import BLK
    from phyx_tpu.kernels.contact_solver_tiled import solve_contacts_tiled

    n = bodies.capacity
    c = contacts.valid.shape[0]
    K = cfg.tile_stride                 # rows per slab stride (mult 128)
    H = cfg.tile_halo                   # extra halo rows (mult 128)
    W = K + H
    rps = K - 128                       # real bodies per slab stride
    n_slabs = -(-n // rps)
    npad = n_slabs * K + H

    # rank of each body id (inverse of order)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    # embedded row of rank r: slab zero-block layout
    def pos_of_rank(r):
        return (r // rps) * K + 128 + r % rps
    pos = pos_of_rank(rank)             # id -> embedded row

    # embedded body table: pure gather (src id per embedded row, or zero)
    p_iota = jnp.arange(npad, dtype=jnp.int32)
    off = p_iota % K
    r_src = (p_iota // K) * rps + (off - 128)
    row_valid = (off >= 128) & (r_src < n) & (p_iota < n_slabs * K)
    src = order[jnp.clip(r_src, 0, n - 1)]
    body_rows = jnp.concatenate([
        bodies.vel,
        bodies.angvel[:, None],
        bodies.inv_mass[:, None],
        bodies.inv_inertia[:, None],
        jnp.zeros((n, 3), jnp.float32),
    ], axis=1)                           # (N, 8)
    embedded = jnp.where(row_valid[:, None], body_rows[src], 0.0)

    # contact routing.  Only bodies whose row literally EQUALS the zero
    # row (zero velocity/angvel AND both inverse masses zero) may be
    # remapped to it — a kinematic static (inv_mass 0, velocity set, which
    # SceneBuilder.add_box permits) contributes real motion to relative-
    # velocity terms and must keep its actual embedded row (ADVICE r1 #1).
    zero_safe = ((bodies.inv_mass == 0.0) & (bodies.inv_inertia == 0.0)
                 & jnp.all(bodies.vel == 0.0, axis=1) & (bodies.angvel == 0.0))
    b1p = pos[contacts.b1]
    b2p = pos[contacts.b2]
    st1 = zero_safe[contacts.b1]
    st2 = zero_safe[contacts.b2]
    dyn_min = jnp.where(st1, b2p, jnp.where(st2, b1p, jnp.minimum(b1p, b2p)))
    slab = jnp.clip(dyn_min // K, 0, n_slabs - 1)
    zero_row = slab * K
    lb1 = jnp.where(st1, zero_row, b1p)
    lb2 = jnp.where(st2, zero_row, b2p)
    lo, hi = slab * K, slab * K + W
    in_win = (lb1 >= lo) & (lb1 < hi) & (lb2 >= lo) & (lb2 < hi)
    tiled_overflow = (contacts.valid & ~in_win).sum(dtype=jnp.int32)
    lb1 = jnp.clip(lb1, lo, hi - 1)
    lb2 = jnp.clip(lb2, lo, hi - 1)
    # dead slots: park on the zero row (exact no-ops), sort to the END and
    # keep them out of the slab capacity accounting
    live = contacts.valid
    lb1 = jnp.where(live, lb1, zero_row)
    lb2 = jnp.where(live, lb2, zero_row)

    # slab-sorted padded layout, built with gathers only
    bps = -(-(2 * c // n_slabs) // BLK)          # blocks per slab (2x avg)
    cap_slots = bps * BLK
    skey = jnp.where(live, slab, n_slabs)         # dead last
    order2 = jnp.argsort(skey)                    # stable: keeps sweep order
    counts = jnp.zeros((n_slabs,), jnp.int32).at[slab].add(
        live.astype(jnp.int32))
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts)[:-1]])
    c_tiled = n_slabs * cap_slots
    q = jnp.arange(c_tiled, dtype=jnp.int32)
    qslab = q // cap_slots
    within = q % cap_slots
    slot_live = within < jnp.minimum(counts[qslab], cap_slots)
    src_c = order2[jnp.clip(starts[qslab] + within, 0, c - 1)]
    slab_overflow = jnp.maximum(counts - cap_slots, 0).sum()
    tiled_overflow = tiled_overflow + slab_overflow

    def g1(x):
        taken = x[src_c]
        return jnp.where(slot_live[:, None], taken, jnp.zeros_like(taken))

    t_b1 = jnp.where(slot_live, lb1[src_c], qslab * K).astype(jnp.int32)
    t_b2 = jnp.where(slot_live, lb2[src_c], qslab * K).astype(jnp.int32)
    con12 = jnp.stack([
        contacts.normal[:, 0], contacts.normal[:, 1],
        contacts.r1[:, 0], contacts.r1[:, 1],
        contacts.r2[:, 0], contacts.r2[:, 1],
        contacts.mass_n, contacts.mass_t, contacts.friction,
        contacts.dst_v, contacts.dst_dv,
        jnp.zeros((c,), jnp.float32)], axis=1)
    warm2 = jnp.stack([contacts.warm_n, contacts.warm_t], axis=1)
    t_con = g1(con12).reshape(-1)
    t_warm = g1(warm2).reshape(-1)
    slab_counts = jnp.minimum(counts, cap_slots)

    body_out, acc, res = solve_contacts_tiled(
        embedded.reshape(-1), t_b1, t_b2, t_con, t_warm, slab_counts,
        cfg.velocity_iterations, cfg.position_iterations,
        n_slabs, K, W)

    # un-embed bodies
    body_out = body_out.reshape(npad, 8)
    mine = body_out[pos]                          # (N, 8) per body id
    bodies = bodies.replace(
        vel=mine[:, 0:2], angvel=mine[:, 2],
        dvel=mine[:, 5:7], dangvel=mine[:, 7])

    # un-route accumulators: contact c sits at slot slab(c)*cap + within(c)
    inv2 = jnp.zeros((c,), jnp.int32).at[order2].set(
        jnp.arange(c, dtype=jnp.int32))
    within_c = inv2 - starts[slab]
    slot_c = jnp.clip(slab * cap_slots + within_c, 0, c_tiled - 1)
    acc = acc.reshape(c_tiled, 3)
    acc_c = acc[slot_c]
    ok = within_c < cap_slots
    accum_n = jnp.where(live & ok, acc_c[:, 0], 0.0)
    accum_t = jnp.where(live & ok, acc_c[:, 1], 0.0)
    return bodies, accum_n, accum_t, res[0], tiled_overflow


def solve_position(bodies: Bodies, contacts: Contacts, cfg: SimConfig
                   ) -> Bodies:
    """Displacement iterations on pseudo-velocities — hot loop #2.

    Split-impulse: resolves penetration without injecting kinetic energy;
    results land in bodies.dvel / bodies.dangvel, consumed once by position
    integration (step.py) and then zeroed.
    """
    c = contacts
    n = c.normal
    im1, im2 = bodies.inv_mass[c.b1], bodies.inv_mass[c.b2]
    ii1, ii2 = bodies.inv_inertia[c.b1], bodies.inv_inertia[c.b2]

    def color_sweep(col, carry):
        dvel, dang, ad = carry
        mask = c.valid & (c.color == col)
        pv1 = dvel[c.b1] + m2.cross_sv(dang[c.b1], c.r1)
        pv2 = dvel[c.b2] + m2.cross_sv(dang[c.b2], c.r2)
        dv = m2.dot(n, pv2 - pv1)
        d = (c.dst_dv - dv) * c.mass_n
        new_ad = jnp.maximum(ad + d, 0.0)
        d = jnp.where(mask, new_ad - ad, 0.0)
        ad = ad + d
        dvel, dang = _apply(dvel, dang, c, im1, ii1, im2, ii2, n * d[:, None])
        return dvel, dang, ad

    def iteration(_, carry):
        return jax.lax.fori_loop(0, cfg.num_colors, color_sweep, carry)

    zeros_ad = jnp.zeros_like(contacts.warm_n)
    dvel, dang, _ = jax.lax.fori_loop(
        0, cfg.position_iterations, iteration,
        (jnp.zeros_like(bodies.vel), jnp.zeros_like(bodies.angvel), zeros_ad))
    return bodies.replace(dvel=dvel, dangvel=dang)
