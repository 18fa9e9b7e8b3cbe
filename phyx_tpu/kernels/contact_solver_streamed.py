"""Streamed fused contact solver: contacts beyond SMEM capacity.

Same algorithm as kernels/contact_solver.py (warm start -> velocity
iterations -> position iterations, exact serial Gauss-Seidel order matching
the oracle), but contact data lives in HBM and is streamed through SMEM in
1024-slot blocks with double-buffered DMAs, while body state stays
SMEM-resident for the whole solve.  This is the TPU-native analog of the
reference's SolveJoints* loops walking SoA joint arrays that exceed cache
(SURVEY.md §3.3): the working set is the body state; joints stream.

USER JOINTS (round 2): joint rows (revolute/distance, encodings in
joints.py — same 12-f32 row width) stream exactly like contacts, as whole
blocks appended AFTER the contact region.  Within every pass the block
order is contacts then joints, so the sweep order equals the fused kernel's
(contacts, then user joints, per iteration) and the oracle's.  Each slot
carries 4 accumulator floats (contacts use normal/tangent/displacement;
joints use velocity-impulse x,y + displacement-impulse x,y).

Capacity envelope (SMEM ~1MB):
  bodies:   N*8*4 bytes resident (aliased in/out)  -> N <= ~20k
  contacts/joints: unlimited (HBM), streamed; SMEM cost is
            2 buffer sets * BLK*(12+2+4)*4 f32 + 2*BLK*2*4 i32 = ~160KB.

Accumulated impulses are read-modify-written back to HBM once per block
visit per pass so the next pass (and the final cache rebuild) sees them.

Constraints honored for Mosaic:
  * 1D HBM arrays are DMA-sliced only at 1024-element granularity
    (hardware tile), so per-contact arrays are padded to BLK multiples.
  * Scratch buffers and semaphores are never indexed by a traced value:
    the double buffering is unrolled — each loop iteration executes TWO
    global (pass, block) steps with statically chosen buffer sets A/B.

Hazard discipline: the acc write-out issued at global step g is waited at
step g+1 before that scratch set is refilled; with n_blocks >= 2 the
previous pass's write to a block lands before that block's next read is
issued.  Callers must guarantee n_blocks >= 2 (solver.py routes smaller
problems to the all-SMEM kernel).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 1024  # contact slots per streamed block; 1024 = f32/i32 1D DMA tile


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _streamed_kernel(vel_iters: int, pos_iters: int, n_blocks: int,
                     n_cap: int, c_blocks: int, vel_gated: bool = False,
                     pos_gated: bool = False):
    """Pass p: 0 = warm start, 1..vel_iters = velocity, rest = position.
    Blocks [0, c_blocks) hold contact rows; [c_blocks, n_blocks) hold
    user-joint rows (compiled away when c_blocks == n_blocks).

    ``vel_gated``/``pos_gated`` compile residual-gated early exit; the
    RUNTIME thresholds live in ``tol_ref`` (tol_ref[0] velocity,
    tol_ref[1] position) so scale-normalized thresholds change per frame
    without recompiling.  A skipped pass still streams its blocks (the
    DMA pipeline is unconditional); only the sweep work is skipped."""

    n_passes = 1 + vel_iters + pos_iters
    total = n_passes * n_blocks
    has_joints = c_blocks < n_blocks
    gated = vel_gated or pos_gated

    def kern(num_ref,                     # (2,) i32 SMEM: [contacts, joints]
             tol_ref,                     # (2,) f32 SMEM: [vel, pos] thresholds
             b1_hbm, b2_hbm, con_hbm, warm_hbm,   # ANY (HBM)
             body_io_hbm,                 # (N*8,) f32 ANY (aliased input)
             acc_init_hbm,                # (C*4,) f32 ANY (aliased input)
             body_hbm,                    # out (N*8,) f32 ANY == body_io_hbm
             acc_hbm,                     # out ANY (C*4,) f32 == acc_init_hbm
             res_ref,                     # out (1,) f32 SMEM
             body_ref, body_sem,          # SMEM body working set + its DMA sem
             conv_ref,                    # SMEM (2,) i32 early-exit flags
             pres_ref,                    # SMEM (1,) f32 position residual
             b1_a, b2_a, con_a, warm_a, acc_a, sem_a, osem_a,
             b1_b, b2_b, con_b, warm_b, acc_b, sem_b, osem_b):
        del body_io_hbm  # aliased with body_hbm; all HBM access via body_hbm
        del acc_init_hbm  # aliased with acc_hbm (pre-zeroed by the caller:
        #                   blocks past the live region are never visited)
        num = num_ref[0]
        numj = num_ref[1]
        res_ref[0] = 0.0
        conv_ref[0] = 0
        conv_ref[1] = 0

        # Live block count: the pair budget is sized for worst-case scenes,
        # so the tail of the contact region is routinely dead (cnt == 0) —
        # at the 10k bench ~23 of 63 blocks.  Without joints nothing pins
        # blocks to static positions, so every pass walks only the first
        # ceil(num/BLK) blocks (>= 2 to preserve the DMA hazard argument).
        # With joints the joint region sits at static block positions
        # [c_blocks, n_blocks): keep the static walk.
        if has_joints:
            nb = n_blocks
            total_d = total
        else:
            nb = jnp.clip((num + BLK - 1) // BLK, 2, n_blocks)
            total_d = n_passes * nb

        # Body state: one whole-array DMA into SMEM (stays resident for the
        # entire solve), written back after the last pass.
        body_in_cp = pltpu.make_async_copy(body_hbm, body_ref, body_sem)
        body_in_cp.start()
        body_in_cp.wait()

        set_a = (b1_a, b2_a, con_a, warm_a, acc_a, sem_a, osem_a)
        set_b = (b1_b, b2_b, con_b, warm_b, acc_b, sem_b, osem_b)

        def in_copies(bufs, b):
            b1_s, b2_s, con_s, warm_s, acc_s, sem, _ = bufs
            off = pl.multiple_of(b * BLK, BLK)
            off12 = pl.multiple_of(b * (BLK * 12), BLK)
            off2 = pl.multiple_of(b * (BLK * 2), BLK)
            off4 = pl.multiple_of(b * (BLK * 4), BLK)
            return (
                pltpu.make_async_copy(b1_hbm.at[pl.ds(off, BLK)],
                                      b1_s, sem.at[0]),
                pltpu.make_async_copy(b2_hbm.at[pl.ds(off, BLK)],
                                      b2_s, sem.at[1]),
                pltpu.make_async_copy(con_hbm.at[pl.ds(off12, BLK * 12)],
                                      con_s, sem.at[2]),
                pltpu.make_async_copy(warm_hbm.at[pl.ds(off2, BLK * 2)],
                                      warm_s, sem.at[3]),
                pltpu.make_async_copy(acc_hbm.at[pl.ds(off4, BLK * 4)],
                                      acc_s, sem.at[4]),
            )

        def acc_out_copy(bufs, b):
            acc_s = bufs[4]
            osem = bufs[6]
            off4 = pl.multiple_of(b * (BLK * 4), BLK)
            return pltpu.make_async_copy(
                acc_s, acc_hbm.at[pl.ds(off4, BLK * 4)], osem)

        def start_block(bufs, b):
            for cp in in_copies(bufs, b):
                cp.start()

        def wait_block(bufs, b):
            for cp in in_copies(bufs, b):
                cp.wait()

        # ---- per-contact sweeps (k = slot inside SMEM block) ----

        def unroll2(visit, cnt):
            """Run visit(0..cnt): sixteen visits per hardware-loop iteration
            (cuts the increment/compare/branch overhead; the serial
            Gauss-Seidel order is unchanged).  2x/4x/8x/16x: +7%/+5%/+2%/+1%."""
            W = 16 if not _use_interpret() else 4   # interpret: 5x
            #   faster test tracing, same structure (block + tail)

            def block(h, _):
                k = W * h
                for o in range(W):
                    visit(k + o, 0)
                return 0
            jax.lax.fori_loop(0, cnt // W, block, 0)

            def one(k, _):
                visit(k, 0)
                return 0
            jax.lax.fori_loop(W * (cnt // W), cnt, one, 0)

        def warm_sweep(bufs, cnt):
            b1_s, b2_s, con_s, warm_s, acc_s = bufs[:5]

            def one(k, _):
                base = k * 12
                nx = con_s[base]
                ny = con_s[base + 1]
                wn = warm_s[k * 2]
                wt = warm_s[k * 2 + 1]
                px = nx * wn - ny * wt
                py = ny * wn + nx * wt
                r1x = con_s[base + 2]
                r1y = con_s[base + 3]
                r2x = con_s[base + 4]
                r2y = con_s[base + 5]
                i = b1_s[k]
                j = b2_s[k]
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
                acc_s[k * 4] = wn
                acc_s[k * 4 + 1] = wt
                acc_s[k * 4 + 2] = 0.0
                acc_s[k * 4 + 3] = 0.0
                return 0
            unroll2(one, cnt)
            # dead tail: only the accumulators need initializing (their
            # rows are exact no-ops in every later pass)
            jax.lax.fori_loop(cnt, BLK, _acc_zero(acc_s), 0)

        def _acc_zero(acc_s):
            def zero(k, _):
                acc_s[k * 4] = 0.0
                acc_s[k * 4 + 1] = 0.0
                acc_s[k * 4 + 2] = 0.0
                acc_s[k * 4 + 3] = 0.0
                return 0
            return zero

        def make_vel_sweep(with_res):
            # ``with_res`` records the residual; only the LAST executed
            # velocity pass is reported, so when the gates are off the other
            # passes run this body without the ~6 residual ops per visit.
            def vel_sweep(bufs, cnt):
                b1_s, b2_s, con_s, warm_s, acc_s = bufs[:5]

                def one(k, _):
                    base = k * 12
                    nx = con_s[base]
                    ny = con_s[base + 1]
                    r1x = con_s[base + 2]
                    r1y = con_s[base + 3]
                    r2x = con_s[base + 4]
                    r2y = con_s[base + 5]
                    mn = con_s[base + 6]
                    mt = con_s[base + 7]
                    fr = con_s[base + 8]
                    dstv = con_s[base + 9]
                    ctn = con_s[base + 11]
                    i = b1_s[k]
                    j = b2_s[k]
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
                    # ONE relative-velocity evaluation; exact post-normal
                    # vt via the precomputed coupling ctn = J_t M^-1 J_n^T.
                    # Op order matches kernels/contact_solver.py bit-for-bit.
                    dvx = vx2 - w2 * r2y - vx1 + w1 * r1y
                    dvy = vy2 + w2 * r2x - vy1 - w1 * r1x
                    vn = nx * dvx + ny * dvy
                    vt = -ny * dvx + nx * dvy
                    d = (dstv - vn) * mn
                    a = acc_s[k * 4]
                    na = jnp.maximum(a + d, 0.0)
                    dn = na - a
                    acc_s[k * 4] = na
                    if with_res:
                        res = jnp.abs(dn)
                    d = -(vt + ctn * dn) * mt
                    a = acc_s[k * 4 + 1]
                    mf = fr * na
                    ta = jnp.minimum(jnp.maximum(a + d, -mf), mf)
                    dt = ta - a
                    acc_s[k * 4 + 1] = ta
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
                unroll2(one, cnt)
            return vel_sweep

        vel_sweep = make_vel_sweep(True)
        vel_sweep_nores = make_vel_sweep(False)

        def make_pos_sweep(with_res):
            def pos_sweep(bufs, cnt):
                b1_s, b2_s, con_s, warm_s, acc_s = bufs[:5]

                def one(k, _):
                    base = k * 12
                    nx = con_s[base]
                    ny = con_s[base + 1]
                    r1x = con_s[base + 2]
                    r1y = con_s[base + 3]
                    r2x = con_s[base + 4]
                    r2y = con_s[base + 5]
                    mn = con_s[base + 6]
                    ddv = con_s[base + 10]
                    i = b1_s[k]
                    j = b2_s[k]
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
                    a = acc_s[k * 4 + 2]
                    na = jnp.maximum(a + d, 0.0)
                    d = na - a
                    acc_s[k * 4 + 2] = na
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
                unroll2(one, cnt)
            return pos_sweep

        pos_sweep = make_pos_sweep(False)

        # ---- user-joint sweeps (row encodings: joints.py docstring;
        # math mirrors kernels/contact_solver.py joint_*_one) ----

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

        def joint_geom(con_s, base):
            kind = con_s[base + 11]
            is_rev = kind == 1.0
            r1x = jnp.where(is_rev, con_s[base], con_s[base + 2])
            r1y = jnp.where(is_rev, con_s[base + 1], con_s[base + 3])
            r2x = jnp.where(is_rev, con_s[base + 2], con_s[base + 4])
            r2y = jnp.where(is_rev, con_s[base + 3], con_s[base + 5])
            return is_rev, r1x, r1y, r2x, r2y

        def joint_warm_sweep(bufs, cnt):
            b1_s, b2_s, con_s, warm_s, acc_s = bufs[:5]

            def one(k, _):
                base = k * 12
                is_rev, r1x, r1y, r2x, r2y = joint_geom(con_s, base)
                wx = warm_s[k * 2]
                wy = warm_s[k * 2 + 1]
                px = jnp.where(is_rev, wx, con_s[base] * wx)
                py = jnp.where(is_rev, wy, con_s[base + 1] * wx)
                i = b1_s[k]
                j = b2_s[k]
                joint_apply(i, j, r1x, r1y, r2x, r2y, px, py, 0)
                acc_s[k * 4] = wx
                acc_s[k * 4 + 1] = jnp.where(is_rev, wy, 0.0)
                acc_s[k * 4 + 2] = 0.0
                acc_s[k * 4 + 3] = 0.0
                return 0
            jax.lax.fori_loop(0, cnt, one, 0)
            jax.lax.fori_loop(cnt, BLK, _acc_zero(acc_s), 0)

        def make_joint_vel_sweep(with_res):
            def joint_vel_sweep(bufs, cnt):
                b1_s, b2_s, con_s, warm_s, acc_s = bufs[:5]

                def one(k, _):
                    base = k * 12
                    is_rev, r1x, r1y, r2x, r2y = joint_geom(con_s, base)
                    i = b1_s[k]
                    j = b2_s[k]
                    vx1 = body_ref[i]
                    vy1 = body_ref[i + 1]
                    w1 = body_ref[i + 2]
                    vx2 = body_ref[j]
                    vy2 = body_ref[j + 1]
                    w2 = body_ref[j + 2]
                    dvx = vx2 - w2 * r2y - vx1 + w1 * r1y
                    dvy = vy2 + w2 * r2x - vy1 - w1 * r1x
                    # revolute: impulse = -(M @ dv); distance: -m*(n.dv) along n
                    m00 = con_s[base + 4]
                    m01 = con_s[base + 5]
                    m11 = con_s[base + 6]
                    px_r = -(m00 * dvx + m01 * dvy)
                    py_r = -(m01 * dvx + m11 * dvy)
                    nx = con_s[base]
                    ny = con_s[base + 1]
                    dd = -(con_s[base + 6]) * (nx * dvx + ny * dvy)
                    px = jnp.where(is_rev, px_r, nx * dd)
                    py = jnp.where(is_rev, py_r, ny * dd)
                    acc_s[k * 4] = acc_s[k * 4] + jnp.where(is_rev, px, dd)
                    acc_s[k * 4 + 1] = acc_s[k * 4 + 1] + jnp.where(
                        is_rev, py, 0.0)
                    joint_apply(i, j, r1x, r1y, r2x, r2y, px, py, 0)
                    if with_res:
                        res_ref[0] = jnp.maximum(
                            res_ref[0],
                            jnp.maximum(jnp.abs(px), jnp.abs(py)))
                    return 0
                jax.lax.fori_loop(0, cnt, one, 0)
            return joint_vel_sweep

        joint_vel_sweep = make_joint_vel_sweep(True)
        joint_vel_sweep_nores = make_joint_vel_sweep(False)

        def make_joint_pos_sweep(with_res):
            def joint_pos_sweep(bufs, cnt):
                b1_s, b2_s, con_s, warm_s, acc_s = bufs[:5]

                def one(k, _):
                    base = k * 12
                    is_rev, r1x, r1y, r2x, r2y = joint_geom(con_s, base)
                    i = b1_s[k]
                    j = b2_s[k]
                    px1 = body_ref[i + 5]
                    py1 = body_ref[i + 6]
                    q1 = body_ref[i + 7]
                    px2 = body_ref[j + 5]
                    py2 = body_ref[j + 6]
                    q2 = body_ref[j + 7]
                    dvx = px2 - q2 * r2y - px1 + q1 * r1y
                    dvy = py2 + q2 * r2x - py1 - q1 * r1x
                    m00 = con_s[base + 4]
                    m01 = con_s[base + 5]
                    m11 = con_s[base + 6]
                    dstx = con_s[base + 7]
                    dsty = con_s[base + 8]
                    ex = dstx - dvx
                    ey = dsty - dvy
                    px_r = m00 * ex + m01 * ey
                    py_r = m01 * ex + m11 * ey
                    nx = con_s[base]
                    ny = con_s[base + 1]
                    dd = con_s[base + 6] * (con_s[base + 7]
                                            - (nx * dvx + ny * dvy))
                    px = jnp.where(is_rev, px_r, nx * dd)
                    py = jnp.where(is_rev, py_r, ny * dd)
                    acc_s[k * 4 + 2] = acc_s[k * 4 + 2] + jnp.where(
                        is_rev, px, dd)
                    acc_s[k * 4 + 3] = acc_s[k * 4 + 3] + jnp.where(
                        is_rev, py, 0.0)
                    joint_apply(i, j, r1x, r1y, r2x, r2y, px, py, 5)
                    if with_res:
                        pres_ref[0] = jnp.maximum(
                            pres_ref[0],
                            jnp.maximum(jnp.abs(px), jnp.abs(py)))
                    return 0
                jax.lax.fori_loop(0, cnt, one, 0)
            return joint_pos_sweep

        joint_pos_sweep = make_joint_pos_sweep(False)

        # ---- orchestration: two global steps per loop iteration with
        # statically assigned buffer sets (A for even g, B for odd g) ----

        def do_step(p, b, has_next, cur, nxt):
            # (p, b) are carried incrementally (no traced div/mod on the
            # scalar core); has_next == "a global step follows this one".
            next_b = jnp.where(b + 1 == nb, 0, b + 1)
            prev_b = jnp.where(b == 0, nb - 1, b - 1)
            not_first = (p > 0) | (b > 0)

            # Prefetch step g+1 into the other set.  Its previous acc
            # write-out (issued at step g-1) must land first: WAR on that
            # scratch, and it is the most recent write, so all older
            # writes — incl. last pass's write to block b+1 — are done.
            @pl.when(has_next)
            def _():
                @pl.when(not_first)
                def _():
                    acc_out_copy(nxt, prev_b).wait()
                start_block(nxt, next_b)

            wait_block(cur, b)

            if has_joints:
                is_j = (b >= c_blocks).astype(jnp.int32)
                cnt = jnp.where(
                    is_j == 1,
                    jnp.clip(numj - (b - c_blocks) * BLK, 0, BLK),
                    jnp.clip(num - b * BLK, 0, BLK))
            else:
                is_j = None
                cnt = jnp.clip(num - b * BLK, 0, BLK)

            if gated:
                # Residual-gated mode: EVERY velocity pass records the
                # residual (the gate reads it); reset at the start of each
                # velocity pass (unless early-exited).  The runtime
                # thresholds come from tol_ref (0.0 never fires).
                @pl.when((b == 0) & (p >= 1) & (p <= vel_iters)
                         & (conv_ref[0] == 0))
                def _():
                    res_ref[0] = 0.0

                if pos_gated:
                    @pl.when((b == 0) & (p > vel_iters)
                             & (conv_ref[1] == 0))
                    def _():
                        pres_ref[0] = 0.0

                # Pass kind: 0 warm, 1 velocity, 2 position (+3 joints)
                kind = jnp.where(p == 0, 0,
                                 jnp.where(p <= vel_iters, 1, 2))

                def gated_vel(f):
                    # skip the velocity SWEEP once converged; the DMA
                    # pipeline runs on (a skipped pass costs only its ~us
                    # of streaming)
                    @pl.when(conv_ref[0] == 0)
                    def _():
                        f()

                def gated_pos(f):
                    if not pos_gated:
                        f()
                        return

                    @pl.when(conv_ref[1] == 0)
                    def _():
                        f()

                pos_fn = make_pos_sweep(pos_gated)
                joint_pos_fn = make_joint_pos_sweep(pos_gated)

                if has_joints:
                    jax.lax.switch(kind + 3 * is_j, [
                        lambda: warm_sweep(cur, cnt),
                        lambda: gated_vel(lambda: vel_sweep(cur, cnt)),
                        lambda: gated_pos(lambda: pos_fn(cur, cnt)),
                        lambda: joint_warm_sweep(cur, cnt),
                        lambda: gated_vel(
                            lambda: joint_vel_sweep(cur, cnt)),
                        lambda: gated_pos(
                            lambda: joint_pos_fn(cur, cnt)),
                    ])
                else:
                    jax.lax.switch(kind, [
                        lambda: warm_sweep(cur, cnt),
                        lambda: gated_vel(lambda: vel_sweep(cur, cnt)),
                        lambda: gated_pos(lambda: pos_fn(cur, cnt)),
                    ])
            else:
                # Fixed-count mode: only the LAST velocity pass (the one
                # whose residual is reported) pays the residual ops.
                # Pass kind: 0 warm, 1 velocity (no residual), 2 last
                # velocity (records residual), 3 position (+4 joints).
                @pl.when((b == 0) & (p == vel_iters))
                def _():
                    res_ref[0] = 0.0

                kind = jnp.where(
                    p == 0, 0,
                    jnp.where(p < vel_iters, 1,
                              jnp.where(p == vel_iters, 2, 3)))
                if has_joints:
                    jax.lax.switch(kind + 4 * is_j, [
                        lambda: warm_sweep(cur, cnt),
                        lambda: vel_sweep_nores(cur, cnt),
                        lambda: vel_sweep(cur, cnt),
                        lambda: pos_sweep(cur, cnt),
                        lambda: joint_warm_sweep(cur, cnt),
                        lambda: joint_vel_sweep_nores(cur, cnt),
                        lambda: joint_vel_sweep(cur, cnt),
                        lambda: joint_pos_sweep(cur, cnt),
                    ])
                else:
                    jax.lax.switch(kind, [
                        lambda: warm_sweep(cur, cnt),
                        lambda: vel_sweep_nores(cur, cnt),
                        lambda: vel_sweep(cur, cnt),
                        lambda: pos_sweep(cur, cnt),
                    ])

            if gated:
                # end of a velocity/position pass: latch convergence
                @pl.when((b == nb - 1) & (p >= 1) & (p <= vel_iters)
                         & (res_ref[0] < tol_ref[0]))
                def _():
                    conv_ref[0] = 1

                if pos_gated:
                    @pl.when((b == nb - 1) & (p > vel_iters)
                             & (pres_ref[0] < tol_ref[1]))
                    def _():
                        conv_ref[1] = 1

            acc_out_copy(cur, b).start()

        def advance(p, b):
            wrap = b + 1 == nb
            return jnp.where(wrap, p + 1, p), jnp.where(wrap, 0, b + 1)

        def more(p, b):
            return (p < n_passes - 1) | (b < nb - 1)

        start_block(set_a, jnp.int32(0))

        def g2step(h, carry):
            p, b = carry
            do_step(p, b, more(p, b), set_a, set_b)
            p1, b1 = advance(p, b)

            @pl.when(more(p, b))
            def _():
                do_step(p1, b1, more(p1, b1), set_b, set_a)
            return advance(p1, b1)

        jax.lax.fori_loop(0, (total_d + 1) // 2, g2step,
                          (jnp.int32(0), jnp.int32(0)))
        # Drain BOTH in-flight acc write-outs (steps total_d-2 and
        # total_d-1); the one from total_d-2 was only ever waited by
        # total_d's (nonexistent) prefetch.  total_d >= 2 via nb >= 2.
        # Step total_d-1 sits at block nb-1 of the last pass, total_d-2
        # at block nb-2 (nb >= 2); buffer-set parity = step parity.
        if has_joints:   # total_d static: parity known at trace time
            acc_out_copy(set_a if (total_d - 2) % 2 == 0 else set_b,
                         jnp.int32(nb - 2)).wait()
            acc_out_copy(set_a if (total_d - 1) % 2 == 0 else set_b,
                         jnp.int32(nb - 1)).wait()
        else:            # dynamic parity: total_d = n_passes * nb
            even_total = (total_d & 1) == 0

            def drain(step_parity_odd, blk):
                # step g is even -> buffer set A, odd -> set B
                @pl.when(~step_parity_odd)
                def _():
                    acc_out_copy(set_a, blk).wait()

                @pl.when(step_parity_odd)
                def _():
                    acc_out_copy(set_b, blk).wait()

            # parity of total_d-2 == parity of total_d; total_d-1 opposite
            drain(~even_total, nb - 2)
            drain(even_total, nb - 1)
        # Flush the body working set back to its (aliased) HBM buffer.
        body_out_cp = pltpu.make_async_copy(body_ref, body_hbm, body_sem)
        body_out_cp.start()
        body_out_cp.wait()

    return kern


@functools.partial(jax.jit, static_argnames=("vel_iters", "pos_iters",
                                              "c_cap", "vel_gated",
                                              "pos_gated"))
def solve_contacts_streamed(
    body_flat: jax.Array,    # (N*8,) f32
    b1: jax.Array,           # (R,) int32, R multiple of BLK, R >= 2*BLK
    b2: jax.Array,           # (R,) int32
    con_flat: jax.Array,     # (R*12,) f32
    warm_flat: jax.Array,    # (R*2,) f32
    num_contacts: jax.Array,  # () int32
    vel_iters: int,
    pos_iters: int,
    num_joints: Optional[jax.Array] = None,  # () int32
    c_cap: Optional[int] = None,  # contact rows; joint rows at [c_cap, R)
    vel_gated: bool = False,
    pos_gated: bool = False,
    tols: Optional[jax.Array] = None,  # (2,) f32 [vel, pos] thresholds
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (body_flat', acc (R*4,), residual (1,)).

    Row slots >= num_contacts in the contact region (and >= num_joints in
    the joint region) must be no-ops (masses = 0, warm = 0, clamped body
    ids) — guaranteed by solver.py packing.  Accumulator layout per slot:
    contacts (normal, tangent, displacement, unused); joints (velocity
    impulse x, y, displacement impulse x, y).

    ``vel_gated``/``pos_gated`` compile residual-gated early exit for the
    velocity/displacement passes; the runtime thresholds in ``tols``
    (solver.velocity_threshold / position_threshold — scale-normalized)
    gate without recompiling (0.0 never fires)."""
    n_cap = body_flat.shape[0] // 8
    r_cap = b1.shape[0]
    if c_cap is None:
        c_cap = r_cap
    assert c_cap % BLK == 0 and c_cap >= 2 * BLK, c_cap
    assert r_cap % BLK == 0, r_cap
    n_blocks = r_cap // BLK
    c_blocks = c_cap // BLK
    kern = _streamed_kernel(vel_iters, pos_iters, n_blocks, n_cap, c_blocks,
                            vel_gated, pos_gated)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)

    def bufset():
        return [
            pltpu.SMEM((BLK,), jnp.int32),        # b1_s
            pltpu.SMEM((BLK,), jnp.int32),        # b2_s
            pltpu.SMEM((BLK * 12,), jnp.float32),  # con_s
            pltpu.SMEM((BLK * 2,), jnp.float32),   # warm_s
            pltpu.SMEM((BLK * 4,), jnp.float32),   # acc_s
            pltpu.SemaphoreType.DMA((5,)),         # in sems
            pltpu.SemaphoreType.DMA,               # acc out sem
        ]

    if num_joints is None:
        num_joints = jnp.int32(0)
    if tols is None:
        tols = jnp.zeros((2,), jnp.float32)
    nums = jnp.stack([num_contacts.astype(jnp.int32),
                      num_joints.astype(jnp.int32)])

    # acc is aliased to a zeroed input so blocks past the dynamic live
    # region (never visited by the kernel) read back as exact zeros.
    acc_init = jnp.zeros((r_cap * 4,), jnp.float32)
    body_out, acc, res = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((n_cap * 8,), jnp.float32),
            jax.ShapeDtypeStruct((r_cap * 4,), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ),
        in_specs=[smem, smem, anyspec, anyspec, anyspec, anyspec, anyspec,
                  anyspec],
        out_specs=(anyspec, anyspec, smem),
        input_output_aliases={6: 0, 7: 1},   # body + acc buffers reused
        scratch_shapes=([pltpu.SMEM((n_cap * 8,), jnp.float32),
                         pltpu.SemaphoreType.DMA,
                         pltpu.SMEM((2,), jnp.int32),
                         pltpu.SMEM((1,), jnp.float32)]
                        + bufset() + bufset()),
        interpret=_use_interpret(),
    )(nums, tols, b1, b2, con_flat, warm_flat, body_flat, acc_init)
    return body_out, acc, res
