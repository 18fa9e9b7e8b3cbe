"""Narrowphase: batched oriented-box SAT + incident-face clipping.

TPU-native rebuild of the reference's box-box contact generation
(SURVEY.md §2 C4, §3.2 UpdateManifolds): every candidate pair is processed
in parallel as pure SoA vector math — no per-pair control flow, all the
C++ early-outs become masks.  Produces fixed two-point manifolds with the
same stable feature ids as the NumPy oracle (oracle/engine.py
``collide_box_box_np``), which is what makes cross-frame contact caching
and warm starting work (SURVEY.md §2 C5).

Geometry conventions (shared with the oracle):
  * Box vertices CCW: 0=(-x,-y) 1=(+x,-y) 2=(+x,+y) 3=(-x,+y).
  * Face f outward normal: 0:+x, 1:+y, 2:-x, 3:-y.
  * Feature id = flip*4 + incident-vertex-id, flip=4 when B is reference.
  * Manifold normal always points from body A (pair.pi) toward body B.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from phyx_tpu import math2d as m2
from phyx_tpu.broadphase import Pairs
from phyx_tpu.config import SimConfig
from phyx_tpu.types import Bodies, _pytree_dataclass

# SAT reference-face preference hysteresis (Box2D-style, same constants as
# the oracle) so the reference face doesn't flip between near-equal axes.
REL_TOL = 0.98
ABS_TOL = 0.001


@_pytree_dataclass
class Contacts:
    """Flat SoA contact-point constraints, capacity C = 2 * max_pairs.

    Contact ``2*p + k`` is point-slot ``k`` of pair-slot ``p``, so the
    (pair, feature) grouping needed by the cache writeback is positional.
    Solver-side fields (masses, targets, accumulators, color) are filled by
    solver.prepare / coloring.
    """

    b1: jax.Array        # (C,) int32 body A index (clamped-safe)
    b2: jax.Array        # (C,) int32 body B index
    normal: jax.Array    # (C, 2) f32, A -> B
    r1: jax.Array        # (C, 2) f32 contact offset from body A center
    r2: jax.Array        # (C, 2) f32 contact offset from body B center
    penetration: jax.Array  # (C,) f32 >= 0
    fid: jax.Array       # (C,) int32 feature id, -1 when invalid
    valid: jax.Array     # (C,) bool
    # warm-start impulses carried from the cache (filled by cache.warm_start)
    warm_n: jax.Array    # (C,) f32
    warm_t: jax.Array    # (C,) f32
    # prepared constraint data (filled by solver.prepare)
    mass_n: jax.Array    # (C,) f32
    mass_t: jax.Array    # (C,) f32
    friction: jax.Array  # (C,) f32
    dst_v: jax.Array     # (C,) f32 restitution target velocity
    dst_dv: jax.Array    # (C,) f32 displacement target velocity
    c_nt: jax.Array      # (C,) f32 normal->tangent coupling J_t M^-1 J_n^T
    # color class for the Gauss-Seidel sweep (filled by coloring)
    color: jax.Array     # (C,) int32


def _sel(cond, a, b):
    """where() broadcasting a trailing vector axis."""
    return jnp.where(cond[..., None] if a.ndim > cond.ndim else cond, a, b)


def _comp(v, k):
    """v[:, k] for per-row k in {0, 1} as a pure VPU select.

    ``jnp.take_along_axis`` lowers to a row-serialized gather on TPU
    (~10 ns/element, measured — BASELINE.md); 13 of them over the pair
    buffer made narrowphase the #2 step cost (~6.7 ms of a 57 ms step at
    10k).  A 2-way where() is a single vector op."""
    return jnp.where(k == 1, v[:, 1], v[:, 0])


def narrowphase(bodies: Bodies, pairs: Pairs, cfg: SimConfig) -> Contacts:
    """Batched SAT + clip over the pair buffer -> flat Contacts."""
    contacts, _ = narrowphase_with_props(bodies, pairs, cfg)
    return contacts


def narrowphase_with_props(bodies: Bodies, pairs: Pairs, cfg: SimConfig):
    """``narrowphase`` + the per-pair solver properties picked up in the
    SAME row gather.

    Row gathers are row-serialized on TPU (~12 ns/row, BASELINE.md), and
    solver.prepare needs per-pair body properties (vel/angvel/inv masses/
    friction/restitution) over exactly the same pair indices — so gather
    ONE packed (N, 13) table per side here and hand prepare its 7-column
    tail instead of paying two more full gather passes.  Returns
    (Contacts, (props1, props2)) with props* = (P, 7):
    [vel.x, vel.y, angvel, inv_mass, inv_inertia, friction, restitution]
    at PAIR granularity (slot p covers contacts 2p, 2p+1)."""
    n = bodies.capacity
    i = jnp.minimum(pairs.pi, n - 1)     # clamp EMPTY slots; masked below
    j = jnp.minimum(pairs.pj, n - 1)
    pvalid = pairs.valid

    # one packed geometry+property gather per side
    geom = jnp.concatenate(
        [bodies.pos, bodies.rot, bodies.half_extent,            # 0:6
         bodies.vel, bodies.angvel[:, None],                    # 6:9
         bodies.inv_mass[:, None], bodies.inv_inertia[:, None],  # 9:11
         bodies.friction[:, None], bodies.restitution[:, None],  # 11:13
         ], axis=1)                                             # (N, 13)
    ga = geom[i]
    gb = geom[j]
    props = (ga[:, 6:13], gb[:, 6:13])
    pa, ra, ha = ga[:, 0:2], ga[:, 2:4], ga[:, 4:6]
    pb, rb, hb = gb[:, 0:2], gb[:, 2:4], gb[:, 4:6]

    d = pb - pa
    da = m2.rot_inv_apply(ra, d)           # B center in A frame
    db = m2.rot_inv_apply(rb, -d)          # A center in B frame

    # C = Ra^T Rb is the rotation by (theta_b - theta_a): rel = conj(ra)*rb
    cr = ra[:, 0] * rb[:, 0] + ra[:, 1] * rb[:, 1]
    sr = ra[:, 0] * rb[:, 1] - ra[:, 1] * rb[:, 0]
    ac, as_ = jnp.abs(cr), jnp.abs(sr)

    # SAT separations on the 4 face axes (2 of A, 2 of B)
    sep_ax = jnp.abs(da[:, 0]) - ha[:, 0] - (ac * hb[:, 0] + as_ * hb[:, 1])
    sep_ay = jnp.abs(da[:, 1]) - ha[:, 1] - (as_ * hb[:, 0] + ac * hb[:, 1])
    sep_bx = jnp.abs(db[:, 0]) - hb[:, 0] - (ac * ha[:, 0] + as_ * ha[:, 1])
    sep_by = jnp.abs(db[:, 1]) - hb[:, 1] - (as_ * ha[:, 0] + ac * ha[:, 1])

    overlapping = (sep_ax <= 0.0) & (sep_ay <= 0.0) & \
                  (sep_bx <= 0.0) & (sep_by <= 0.0) & pvalid

    axis_a = (sep_ay > sep_ax).astype(jnp.int32)      # best axis of A
    best_a = jnp.maximum(sep_ax, sep_ay)
    axis_b = (sep_by > sep_bx).astype(jnp.int32)
    best_b = jnp.maximum(sep_bx, sep_by)
    use_b = best_b > REL_TOL * best_a + ABS_TOL

    # Select reference / incident frames
    ref_p = _sel(use_b, pb, pa)
    ref_r = _sel(use_b, rb, ra)
    ref_h = _sel(use_b, hb, ha)
    inc_p = _sel(use_b, pa, pb)
    inc_r = _sel(use_b, ra, rb)
    inc_h = _sel(use_b, ha, hb)
    axis = jnp.where(use_b, axis_b, axis_a)           # (P,) 0 or 1
    d_ref = _sel(use_b, db, da)
    axc = _comp(d_ref, axis)
    sign = jnp.where(axc >= 0.0, 1.0, -1.0)

    # Reference face world normal: sign * ref_R[:, axis]
    # column 0 of R(c,s) = (c, s); column 1 = (-s, c)
    col0 = jnp.stack([ref_r[:, 0], ref_r[:, 1]], axis=-1)
    col1 = jnp.stack([-ref_r[:, 1], ref_r[:, 0]], axis=-1)
    n_face = sign[:, None] * _sel(axis == 1, col1, col0)
    normal = _sel(use_b, -n_face, n_face)             # always A -> B

    # Incident face: most anti-parallel to n_face, in incident-local frame
    n_inc = m2.rot_inv_apply(inc_r, n_face)
    inc_axis = (jnp.abs(n_inc[:, 1]) > jnp.abs(n_inc[:, 0])).astype(jnp.int32)
    inc_comp = _comp(n_inc, inc_axis)
    inc_sign = jnp.where(inc_comp >= 0.0, -1.0, 1.0)

    # face index: axis==0 -> (0 if sign>0 else 2); axis==1 -> (1 or 3)
    fidx = jnp.where(inc_axis == 0,
                     jnp.where(inc_sign > 0, 0, 2),
                     jnp.where(inc_sign > 0, 1, 3))
    # face -> (v0, v1) vertex ids, CCW: 0:(1,2) 1:(2,3) 2:(3,0) 3:(0,1)
    v0_id = jnp.where(fidx == 0, 1, jnp.where(fidx == 1, 2,
                      jnp.where(fidx == 2, 3, 0)))
    v1_id = jnp.where(fidx == 0, 2, jnp.where(fidx == 1, 3,
                      jnp.where(fidx == 2, 0, 1)))

    # vertex local coords: signs per vid 0..3: x: -,+,+,-  y: -,-,+,+
    def vert_local(vid):
        sx = jnp.where((vid == 1) | (vid == 2), 1.0, -1.0)
        sy = jnp.where(vid >= 2, 1.0, -1.0)
        return jnp.stack([sx * inc_h[:, 0], sy * inc_h[:, 1]], axis=-1)

    def to_ref_local(v_local):
        w = inc_p + m2.rot_apply(inc_r, v_local)
        return m2.rot_inv_apply(ref_r, w - ref_p)

    p0 = to_ref_local(vert_local(v0_id))
    p1 = to_ref_local(vert_local(v1_id))
    id0, id1 = v0_id, v1_id

    # Clip against the two side planes of the reference face
    other = 1 - axis
    ref_h_other = _comp(ref_h, other)
    p0o = _comp(p0, other)
    p1o = _comp(p1, other)

    fully_out = jnp.zeros_like(overlapping)
    for plane_sign in (-1.0, 1.0):
        d0 = plane_sign * p0o - ref_h_other
        d1 = plane_sign * p1o - ref_h_other
        fully_out = fully_out | ((d0 > 0.0) & (d1 > 0.0))
        t0 = d0 / jnp.where(jnp.abs(d0 - d1) > 1e-30, d0 - d1, 1e-30)
        t1 = d1 / jnp.where(jnp.abs(d1 - d0) > 1e-30, d1 - d0, 1e-30)
        new_p0 = _sel(d0 > 0.0, p0 + (p1 - p0) * t0[:, None], p0)
        new_p1 = _sel(d1 > 0.0, p1 + (p0 - p1) * t1[:, None], p1)
        p0, p1 = new_p0, new_p1
        p0o = _comp(p0, other)
        p1o = _comp(p1, other)

    pair_ok = overlapping & ~fully_out
    flip = jnp.where(use_b, 4, 0)

    # Per-point separation along the reference axis; keep if penetrating
    def finish_point(p_local, vid):
        w_axis = _comp(p_local, axis)
        ref_h_axis = _comp(ref_h, axis)
        separation = sign * w_axis - ref_h_axis
        ok = pair_ok & (separation <= 0.0)
        p_world = ref_p + m2.rot_apply(ref_r, p_local)
        return p_world, -separation, (flip + vid).astype(jnp.int32), ok

    w0, pen0, fid0, ok0 = finish_point(p0, id0)
    w1, pen1, fid1, ok1 = finish_point(p1, id1)

    # Interleave the 2 point-slots: contact 2p+k  (k in {0,1})
    def ilv(a0, a1):
        return jnp.stack([a0, a1], axis=1).reshape((-1,) + a0.shape[1:])

    c_valid = ilv(ok0, ok1)
    c_world = ilv(w0, w1)
    c_pen = ilv(pen0, pen1)
    c_fid = jnp.where(c_valid, ilv(fid0, fid1), -1)
    c_b1 = ilv(i, i)
    c_b2 = ilv(j, j)
    c_normal = ilv(normal, normal)
    c_r1 = c_world - ilv(pa, pa)    # pa/pb already gathered per pair
    c_r2 = c_world - ilv(pb, pb)

    C = c_valid.shape[0]
    zf = jnp.zeros((C,), jnp.float32)
    return Contacts(
        b1=c_b1, b2=c_b2,
        normal=jnp.where(c_valid[:, None], c_normal, 0.0),
        r1=c_r1, r2=c_r2,
        penetration=jnp.where(c_valid, c_pen, 0.0),
        fid=c_fid,
        valid=c_valid,
        warm_n=zf, warm_t=zf,
        mass_n=zf, mass_t=zf, friction=zf, dst_v=zf, dst_dv=zf, c_nt=zf,
        color=jnp.zeros((C,), jnp.int32),
    ), props
