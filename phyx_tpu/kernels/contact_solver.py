"""Fused sequential-impulse contact solver kernel (the flagship).

One ``pallas_call`` performs, entirely in SMEM with a serial scalar sweep:

    warm start  ->  velocity ("impulses") iterations
                ->  position ("displacement") iterations

This is the TPU-native re-expression of the reference's hot loops
(SURVEY.md §3.3 SolveJointsImpulsesSoA / SolveJointsDisplacementSoA).  The
reference vectorizes by packing conflict-free joints into SIMD lanes; on
TPU the measured optimum is the opposite: Mosaic pipelines a *serial*
scalar sweep over SMEM at ~1 ns/op, which preserves the exact scalar
Gauss-Seidel ordering of the oracle (oracle/engine.py step §6-7) — so
per-iteration convergence parity with the reference algorithm is
structural, not approximate (BASELINE.json:5).

Memory layout (all flat 1D SMEM; 2D SMEM arrays pad the trailing dim):
  body  (N*8,)  f32: [vx, vy, w, inv_m, inv_i, dvx, dvy, dw] per body
  con   (C*12,) f32: [nx, ny, r1x, r1y, r2x, r2y, mass_n, mass_t,
                      friction, dst_v, dst_dv, c_nt] per contact
                     (c_nt = normal->tangent coupling, solver.prepare)
  warm  (C*2,)  f32: [warm_n, warm_t]
  b1/b2 (C,)    i32
  acc   (C*4,)  f32 out: [accum_n, accum_t, accum_d, pad]
  res   (1,)    f32 out: max |impulse delta| of the LAST velocity iteration

Invalid contact slots carry mass_n = mass_t = 0 and warm = 0, making them
exact no-ops — no branches in the sweep.

SMEM budget (1 MB total): fits C <= ~8k contacts, N <= ~4k bodies in this
single-block version; the grid-blocked variant for 10k+ boxes streams
contact blocks through SMEM while body state stays resident.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _solver_kernel(vel_iters: int, pos_iters: int, c_cap: int, n_cap: int,
                   j_cap: int = 0, vel_gated: bool = False,
                   pos_gated: bool = False):
    """Build the kernel body with static iteration counts / capacities.

    Row slots [0, c_cap) are contacts; slots [c_cap, c_cap + j_cap) are
    user-joint rows (revolute/distance, encodings in joints.py) swept after
    the contacts in every pass.  j_cap == 0 compiles the joint loops away.

    ``vel_gated``/``pos_gated`` compile residual-gated early exit for the
    velocity/displacement iterations; the RUNTIME thresholds arrive in the
    ``tol_ref`` SMEM operand (tol_ref[0] velocity, tol_ref[1] position) so
    a scale-normalized threshold (solver.velocity_threshold, computed from
    the frame's warm-start impulses) needs no recompilation.  A threshold
    of 0.0 never fires (residual >= 0 is never < 0).
    """

    def kern(num_ref, tol_ref, b1_ref, b2_ref, con_ref, warm_ref,
             body_in_ref, body_ref, acc_ref, res_ref, conv_ref, pres_ref):
        num = num_ref[0]
        numj = num_ref[1]
        conv_ref[0] = 0
        conv_ref[1] = 0

        # -- copy body state into the writable SMEM output --
        # (input_output_aliases does NOT work here: for SMEM-blockspec
        # operands it only donates the backing HBM buffer — the SMEM
        # output scratch arrives UNINITIALIZED on real TPU.  Measured
        # 2026-08-17: aliasing away this loop exploded the pile while CPU
        # interpret tests stayed green.  8 elements per loop iteration;
        # n_cap*8 is always a multiple of 8.)
        def cpy8(h, _):
            i = 8 * h
            for o in range(8):
                body_ref[i + o] = body_in_ref[i + o]
            return 0
        jax.lax.fori_loop(0, n_cap, cpy8, 0)

        # -- init accumulators (all slots, incl. beyond num) --
        def ini4(k, _):
            acc_ref[k * 4] = 0.0
            acc_ref[k * 4 + 1] = 0.0
            acc_ref[k * 4 + 2] = 0.0
            acc_ref[k * 4 + 3] = 0.0
            return 0
        jax.lax.fori_loop(0, c_cap + j_cap, ini4, 0)

        # ---- user-joint row sweeps (slots offset by c_cap) ----

        def joint_load(k):
            base = k * 12
            i = b1_ref[k]
            j = b2_ref[k]
            return base, i, j

        def joint_apply(i, j, r1x, r1y, r2x, r2y, px, py, off):
            im1 = body_ref[i + 3]
            ii1 = body_ref[i + 4]
            im2 = body_ref[j + 3]
            ii2 = body_ref[j + 4]
            body_ref[i + off] = body_ref[i + off] - px * im1
            body_ref[i + off + 1] = body_ref[i + off + 1] - py * im1
            body_ref[i + off + 2] = (body_ref[i + off + 2]
                                     - ii1 * (r1x * py - r1y * px))
            body_ref[j + off] = body_ref[j + off] + px * im2
            body_ref[j + off + 1] = body_ref[j + off + 1] + py * im2
            body_ref[j + off + 2] = (body_ref[j + off + 2]
                                     + ii2 * (r2x * py - r2y * px))

        def joint_warm_one(kk, _):
            k = c_cap + kk
            base, i, j = joint_load(k)
            kind = con_ref[base + 11]
            wx = warm_ref[k * 2]
            wy = warm_ref[k * 2 + 1]
            is_rev = kind == 1.0
            r1x = jnp.where(is_rev, con_ref[base], con_ref[base + 2])
            r1y = jnp.where(is_rev, con_ref[base + 1], con_ref[base + 3])
            r2x = jnp.where(is_rev, con_ref[base + 2], con_ref[base + 4])
            r2y = jnp.where(is_rev, con_ref[base + 3], con_ref[base + 5])
            px = jnp.where(is_rev, wx, con_ref[base] * wx)
            py = jnp.where(is_rev, wy, con_ref[base + 1] * wx)
            joint_apply(i, j, r1x, r1y, r2x, r2y, px, py, 0)
            acc_ref[k * 4] = wx
            acc_ref[k * 4 + 1] = jnp.where(is_rev, wy, 0.0)
            return 0

        def make_joint_vel_one(with_res):
            def joint_vel_one(kk, _):
                k = c_cap + kk
                base, i, j = joint_load(k)
                kind = con_ref[base + 11]
                is_rev = kind == 1.0
                r1x = jnp.where(is_rev, con_ref[base], con_ref[base + 2])
                r1y = jnp.where(is_rev, con_ref[base + 1], con_ref[base + 3])
                r2x = jnp.where(is_rev, con_ref[base + 2], con_ref[base + 4])
                r2y = jnp.where(is_rev, con_ref[base + 3], con_ref[base + 5])
                vx1 = body_ref[i]
                vy1 = body_ref[i + 1]
                w1 = body_ref[i + 2]
                vx2 = body_ref[j]
                vy2 = body_ref[j + 1]
                w2 = body_ref[j + 2]
                dvx = vx2 - w2 * r2y - vx1 + w1 * r1y
                dvy = vy2 + w2 * r2x - vy1 - w1 * r1x
                # revolute: impulse = -(M @ dv); distance: -m * (n.dv) * n
                m00 = con_ref[base + 4]
                m01 = con_ref[base + 5]
                m11 = con_ref[base + 6]
                px_r = -(m00 * dvx + m01 * dvy)
                py_r = -(m01 * dvx + m11 * dvy)
                nx = con_ref[base]
                ny = con_ref[base + 1]
                dd = -(con_ref[base + 6]) * (nx * dvx + ny * dvy)
                px = jnp.where(is_rev, px_r, nx * dd)
                py = jnp.where(is_rev, py_r, ny * dd)
                acc_ref[k * 4] = acc_ref[k * 4] + jnp.where(is_rev, px, dd)
                acc_ref[k * 4 + 1] = acc_ref[k * 4 + 1] + jnp.where(
                    is_rev, py, 0.0)
                joint_apply(i, j, r1x, r1y, r2x, r2y, px, py, 0)
                if with_res:
                    res_ref[0] = jnp.maximum(
                        res_ref[0], jnp.maximum(jnp.abs(px), jnp.abs(py)))
                return 0
            return joint_vel_one

        joint_vel_one = make_joint_vel_one(True)
        joint_vel_one_nores = make_joint_vel_one(False)

        def make_joint_pos_one(with_res):
            def joint_pos_one(kk, _):
                k = c_cap + kk
                base, i, j = joint_load(k)
                kind = con_ref[base + 11]
                is_rev = kind == 1.0
                r1x = jnp.where(is_rev, con_ref[base], con_ref[base + 2])
                r1y = jnp.where(is_rev, con_ref[base + 1], con_ref[base + 3])
                r2x = jnp.where(is_rev, con_ref[base + 2], con_ref[base + 4])
                r2y = jnp.where(is_rev, con_ref[base + 3], con_ref[base + 5])
                px1 = body_ref[i + 5]
                py1 = body_ref[i + 6]
                q1 = body_ref[i + 7]
                px2 = body_ref[j + 5]
                py2 = body_ref[j + 6]
                q2 = body_ref[j + 7]
                dvx = px2 - q2 * r2y - px1 + q1 * r1y
                dvy = py2 + q2 * r2x - py1 - q1 * r1x
                m00 = con_ref[base + 4]
                m01 = con_ref[base + 5]
                m11 = con_ref[base + 6]
                dstx = con_ref[base + 7]
                dsty = con_ref[base + 8]
                ex = dstx - dvx
                ey = dsty - dvy
                px_r = m00 * ex + m01 * ey
                py_r = m01 * ex + m11 * ey
                nx = con_ref[base]
                ny = con_ref[base + 1]
                dd = con_ref[base + 6] * (con_ref[base + 7]
                                          - (nx * dvx + ny * dvy))
                px = jnp.where(is_rev, px_r, nx * dd)
                py = jnp.where(is_rev, py_r, ny * dd)
                acc_ref[k * 4 + 2] = acc_ref[k * 4 + 2] + jnp.where(
                    is_rev, px, dd)
                acc_ref[k * 4 + 3] = acc_ref[k * 4 + 3] + jnp.where(
                    is_rev, py, 0.0)
                joint_apply(i, j, r1x, r1y, r2x, r2y, px, py, 5)
                if with_res:
                    pres_ref[0] = jnp.maximum(
                        pres_ref[0], jnp.maximum(jnp.abs(px), jnp.abs(py)))
                return 0
            return joint_pos_one

        joint_pos_one = make_joint_pos_one(False)

        def unroll2(visit, cnt):
            """Sixteen visits per hardware-loop iteration (cuts the loop
            overhead; 2x/4x/8x/16x measured +7%/+5%/+2%/+1% on the streamed
            kernel at 10k).  Gauss-Seidel order unchanged."""
            W = 16 if not _use_interpret() else 4   # interpret: faster
            #   test tracing, same structure (block + tail)

            def block(h, _):
                k = W * h
                for o in range(W):
                    visit(k + o, 0)
                return 0
            jax.lax.fori_loop(0, cnt // W, block, 0)
            jax.lax.fori_loop(W * (cnt // W), cnt,
                              lambda k, _: visit(k, 0), 0)

        # -- warm start: apply cached impulses (SURVEY.md §3.2) --
        def warm(k, _):
            base = k * 12
            nx = con_ref[base]
            ny = con_ref[base + 1]
            wn = warm_ref[k * 2]
            wt = warm_ref[k * 2 + 1]
            # impulse = n*wn + perp(n)*wt,  perp(n) = (-ny, nx)
            px = nx * wn - ny * wt
            py = ny * wn + nx * wt
            r1x = con_ref[base + 2]
            r1y = con_ref[base + 3]
            r2x = con_ref[base + 4]
            r2y = con_ref[base + 5]
            i = b1_ref[k]
            j = b2_ref[k]
            im1 = body_ref[i + 3]
            ii1 = body_ref[i + 4]
            im2 = body_ref[j + 3]
            ii2 = body_ref[j + 4]
            body_ref[i] = body_ref[i] - px * im1
            body_ref[i + 1] = body_ref[i + 1] - py * im1
            body_ref[i + 2] = body_ref[i + 2] - ii1 * (r1x * py - r1y * px)
            body_ref[j] = body_ref[j] + px * im2
            body_ref[j + 1] = body_ref[j + 1] + py * im2
            body_ref[j + 2] = body_ref[j + 2] + ii2 * (r2x * py - r2y * px)
            acc_ref[k * 4] = wn
            acc_ref[k * 4 + 1] = wt
            return 0
        unroll2(warm, num)
        if j_cap:
            jax.lax.fori_loop(0, numj, joint_warm_one, 0)

        # -- velocity iterations (hot loop #1) --
        # ``with_res`` builds the residual-recording variant; the residual
        # is only REPORTED for the last executed pass, so when gating is
        # off the earlier passes run a ~5-op-cheaper sweep body.
        def make_vel_one(with_res):
            # with_res: the max-|impulse-delta| residual accumulates into
            # res_ref (same max order as the old fori carry — bit-equal)
            def one(k, res):
                base = k * 12
                nx = con_ref[base]
                ny = con_ref[base + 1]
                r1x = con_ref[base + 2]
                r1y = con_ref[base + 3]
                r2x = con_ref[base + 4]
                r2y = con_ref[base + 5]
                mn = con_ref[base + 6]
                mt = con_ref[base + 7]
                fr = con_ref[base + 8]
                dstv = con_ref[base + 9]
                ctn = con_ref[base + 11]
                i = b1_ref[k]
                j = b2_ref[k]
                im1 = body_ref[i + 3]
                ii1 = body_ref[i + 4]
                im2 = body_ref[j + 3]
                ii2 = body_ref[j + 4]
                vx1 = body_ref[i]
                vy1 = body_ref[i + 1]
                w1 = body_ref[i + 2]
                vx2 = body_ref[j]
                vy2 = body_ref[j + 1]
                w2 = body_ref[j + 2]
                # ONE relative-velocity evaluation: the tangent velocity
                # after the normal impulse follows exactly from the
                # precomputed coupling ctn = J_t M^-1 J_n^T (solver.prepare)
                dvx = vx2 - w2 * r2y - vx1 + w1 * r1y
                dvy = vy2 + w2 * r2x - vy1 - w1 * r1x
                vn = nx * dvx + ny * dvy
                vt = -ny * dvx + nx * dvy
                # normal limiter
                d = (dstv - vn) * mn
                a = acc_ref[k * 4]
                na = jnp.maximum(a + d, 0.0)
                dn = na - a
                acc_ref[k * 4] = na
                if with_res:
                    res = jnp.abs(dn)
                # friction limiter on the exact post-normal tangent velocity
                d = -(vt + ctn * dn) * mt
                a = acc_ref[k * 4 + 1]
                mf = fr * na
                ta = jnp.minimum(jnp.maximum(a + d, -mf), mf)
                dt = ta - a
                acc_ref[k * 4 + 1] = ta
                # combined impulse n*dn + t*dt (t = (-ny, nx)): one apply
                px = nx * dn - ny * dt
                py = ny * dn + nx * dt
                body_ref[i] = vx1 - px * im1
                body_ref[i + 1] = vy1 - py * im1
                body_ref[i + 2] = w1 - ii1 * (r1x * py - r1y * px)
                body_ref[j] = vx2 + px * im2
                body_ref[j + 1] = vy2 + py * im2
                body_ref[j + 2] = w2 + ii2 * (r2x * py - r2y * px)
                if with_res:
                    res_ref[0] = jnp.maximum(
                        res_ref[0], jnp.maximum(res, jnp.abs(dt)))
                return 0
            return one

        vel_one_res = make_vel_one(True)

        def run_res_sweep():
            res_ref[0] = 0.0   # reset -> reports the last EXECUTED pass
            unroll2(vel_one_res, num)
            if j_cap:
                jax.lax.fori_loop(0, numj, joint_vel_one, 0)

        if vel_gated:
            # residual-gated early exit needs the residual EVERY pass:
            # once an iteration's residual (contacts + joints) drops below
            # the runtime threshold, remaining velocity iterations skip
            def vel_iter(_, carry):
                @pl.when(conv_ref[0] == 0)
                def _():
                    run_res_sweep()
                    @pl.when(res_ref[0] < tol_ref[0])
                    def _():
                        conv_ref[0] = 1
                return carry
            jax.lax.fori_loop(0, vel_iters, vel_iter, 0)
        else:
            vel_one_fast = make_vel_one(False)

            def vel_iter_fast(_, carry):
                unroll2(vel_one_fast, num)
                if j_cap:
                    jax.lax.fori_loop(0, numj, joint_vel_one_nores, 0)
                return carry
            jax.lax.fori_loop(0, max(vel_iters - 1, 0), vel_iter_fast, 0)
            res_ref[0] = 0.0
            if vel_iters > 0:
                run_res_sweep()

        # -- position (displacement) iterations on pseudo-velocities --
        def make_pos_one(with_res):
            def one(k, _c):
                base = k * 12
                nx = con_ref[base]
                ny = con_ref[base + 1]
                r1x = con_ref[base + 2]
                r1y = con_ref[base + 3]
                r2x = con_ref[base + 4]
                r2y = con_ref[base + 5]
                mn = con_ref[base + 6]
                ddv = con_ref[base + 10]
                i = b1_ref[k]
                j = b2_ref[k]
                im1 = body_ref[i + 3]
                ii1 = body_ref[i + 4]
                im2 = body_ref[j + 3]
                ii2 = body_ref[j + 4]
                px1 = body_ref[i + 5]
                py1 = body_ref[i + 6]
                q1 = body_ref[i + 7]
                px2 = body_ref[j + 5]
                py2 = body_ref[j + 6]
                q2 = body_ref[j + 7]
                dvx = px2 - q2 * r2y - px1 + q1 * r1y
                dvy = py2 + q2 * r2x - py1 - q1 * r1x
                vn = nx * dvx + ny * dvy
                d = (ddv - vn) * mn
                a = acc_ref[k * 4 + 2]
                na = jnp.maximum(a + d, 0.0)
                d = na - a
                acc_ref[k * 4 + 2] = na
                ix = nx * d
                iy = ny * d
                body_ref[i + 5] = px1 - ix * im1
                body_ref[i + 6] = py1 - iy * im1
                body_ref[i + 7] = q1 - ii1 * (r1x * iy - r1y * ix)
                body_ref[j + 5] = px2 + ix * im2
                body_ref[j + 6] = py2 + iy * im2
                body_ref[j + 7] = q2 + ii2 * (r2x * iy - r2y * ix)
                if with_res:
                    pres_ref[0] = jnp.maximum(pres_ref[0], jnp.abs(d))
                return 0
            return one

        if pos_gated:
            # same latch structure as the velocity gate; the first
            # position iteration always runs (conv starts 0)
            pos_one_res = make_pos_one(True)
            joint_pos_one_res = make_joint_pos_one(True)

            def pos_iter(_, carry):
                @pl.when(conv_ref[1] == 0)
                def _():
                    pres_ref[0] = 0.0
                    unroll2(pos_one_res, num)
                    if j_cap:
                        jax.lax.fori_loop(0, numj, joint_pos_one_res, 0)
                    @pl.when(pres_ref[0] < tol_ref[1])
                    def _():
                        conv_ref[1] = 1
                return carry
        else:
            pos_one = make_pos_one(False)

            def pos_iter(_, carry):
                unroll2(pos_one, num)
                if j_cap:
                    jax.lax.fori_loop(0, numj, joint_pos_one, 0)
                return carry
        jax.lax.fori_loop(0, pos_iters, pos_iter, 0)

    return kern


@functools.partial(jax.jit, static_argnames=("vel_iters", "pos_iters",
                                             "j_cap", "vel_gated",
                                             "pos_gated"))
def solve_contacts_fused(
    body_flat: jax.Array,    # (N*8,) f32
    b1: jax.Array,           # (C+J,) int32
    b2: jax.Array,           # (C+J,) int32
    con_flat: jax.Array,     # ((C+J)*12,) f32
    warm_flat: jax.Array,    # ((C+J)*2,) f32
    num_contacts: jax.Array,  # () int32
    vel_iters: int,
    pos_iters: int,
    num_joints: jax.Array | None = None,   # () int32
    j_cap: int = 0,
    vel_gated: bool = False,
    pos_gated: bool = False,
    tols: jax.Array | None = None,   # (2,) f32 [vel, pos] runtime thresholds
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (body_flat', acc ((C+J)*4,), residual (1,)).

    Slots [0, C) are contact rows; slots [C, C+J) are user-joint rows
    (joints.py encodings), swept after the contacts in every pass.
    ``vel_gated``/``pos_gated`` compile residual-gated early exit; the
    runtime thresholds in ``tols`` (solver.velocity_threshold /
    position_threshold — scale-normalized) gate without recompiling."""
    n_cap = body_flat.shape[0] // 8
    c_cap = b1.shape[0] - j_cap
    kern = _solver_kernel(vel_iters, pos_iters, c_cap, n_cap, j_cap,
                          vel_gated, pos_gated)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    if num_joints is None:
        num_joints = jnp.zeros((), jnp.int32)
    if tols is None:
        tols = jnp.zeros((2,), jnp.float32)
    nums = jnp.stack([num_contacts.astype(jnp.int32),
                      num_joints.astype(jnp.int32)])
    body_out, acc, res = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((n_cap * 8,), jnp.float32),
            jax.ShapeDtypeStruct(((c_cap + j_cap) * 4,), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ),
        in_specs=[smem] * 7,
        out_specs=(smem, smem, smem),
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32),
                        pltpu.SMEM((1,), jnp.float32)],
        interpret=_use_interpret(),
    )(nums, tols, b1, b2, con_flat, warm_flat, body_flat)
    return body_out, acc, res
