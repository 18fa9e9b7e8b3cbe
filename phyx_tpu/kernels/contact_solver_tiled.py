"""Tiled contact solver: scenes whose BODY state exceeds SMEM (100k+).

The streamed kernel (contact_solver_streamed.py) keeps the whole body
table SMEM-resident (cap ~20k bodies).  This variant additionally tiles
the body axis: bodies are pre-permuted into spatial (x-rank) order by the
caller, so each SLAB of contacts touches only a contiguous window of body
rows, which is DMA'd in and out around that slab's sweep.  This is the
TPU-native form of domain decomposition (SURVEY.md §5.8): slabs are swept
sequentially within every pass, so Gauss-Seidel ordering is preserved
globally — the halo region of slab s is written back before slab s+1
reads it.

USER JOINTS (round 2): each slab's block range is [contact blocks ×
blocks_per_slab_c][joint blocks × blocks_per_slab_j]; joint rows
(encodings in joints.py) are routed to slabs exactly like contacts (both
endpoints inside the slab window, violations clamped + counted) and swept
after that slab's contacts in every pass.  blocks_per_slab_j == 0
compiles all joint handling away.  Each slot carries 4 accumulator floats
(contacts: normal/tangent/displacement; joints: velocity impulse x,y +
displacement impulse x,y).

Caller contract (solver.solve_pallas_tiled):
  * body rows permuted by x-rank; slab s's window = rows
    [s*K, s*K + W) with K = slab stride, W = window (both multiples of
    128 so the (rows*8) f32 DMA offsets hit the 1024-element tile).
  * contact/joint rows sorted by slab, each slab's range padded to
    BLK-multiples (dead slots are exact no-ops; round 4: blocks with
    ZERO live rows skip DMA + dispatch entirely after the warm pass —
    block budgets are capacity-sized, so at settled states most blocks
    are dead padding); live counts per slab in ``slab_counts``
    ((2*n_slabs,) i32: contacts then joints).
  * every row's two bodies lie inside its slab's window; the caller
    counts violations and clamps.
  * bodies whose row equals the zero row (statics at rest) may be
    remapped by the caller to the slab's 128-row zero block, so a global
    ground never forces a giant window; kinematic statics keep their
    real rows (solver.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phyx_tpu.kernels.contact_solver_streamed import BLK


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tiled_kernel(vel_iters: int, pos_iters: int, n_slabs: int,
                  cbps: int, jbps: int, window_rows: int, slab_stride: int,
                  vel_gated: bool = False, pos_gated: bool = False):
    """Pass p: 0 = warm start, 1..vel_iters = velocity, rest = position.
    Global order: pass -> slab -> contact blocks -> joint blocks
    (sequential GS).

    ``vel_gated``/``pos_gated`` (round 4, VERDICT r3 #4) compile the
    residual-gated early exit the other backends got in round 3: every
    velocity pass then records its residual, and once a pass's residual
    falls below the RUNTIME threshold ``tol_ref[0]`` the remaining
    velocity passes skip their sweeps (same for displacement passes vs
    ``tol_ref[1]``).

    Round-5 walk (VERDICT r4 #1): pass/slab/block indices are CARRIED
    incrementally (the round-4 walk recomputed them with ~12 traced
    div/rem per block — measured expensive on the scalar core), passes
    p >= 1 walk ONLY live blocks (the round-4 skip saved dead blocks'
    DMA + dispatch but still walked them; block budgets are capacity-
    sized so most are dead at settled states), windows are DMA'd only
    on slab CHANGE, and blocks of a converged gated pass are skipped
    entirely.  The live-block visit order is unchanged, so physics is
    bit-identical to the round-4 kernel."""

    n_passes = 1 + vel_iters + pos_iters
    bps = cbps + jbps
    has_joints = jbps > 0
    gated = vel_gated or pos_gated

    def kern(num_ref,                 # (2*n_slabs,) i32 SMEM live/slab (c, j)
             tol_ref,                 # (2,) f32 SMEM [vel, pos] thresholds
             b12_hbm, cw_hbm,         # ANY (HBM): packed (S,2) i32 + (S,14) f32
             body_io_hbm, body_hbm, acc_hbm, res_ref,
             win_ref, win_sem,        # SMEM window + DMA sem
             conv_ref, pres_ref,      # SMEM (2,) i32 flags + (1,) f32
             started_ref, pending_ref,  # SMEM (2,) i32 per-buffer-set
             b12_s, cw_s, acc_s, sem_s, osem_s,
             b12_t, cw_t, acc_t, sem_t, osem_t):
        del body_io_hbm
        res_ref[0] = 0.0
        conv_ref[0] = 0
        conv_ref[1] = 0
        pres_ref[0] = 0.0

        set_a = (b12_s, cw_s, acc_s, sem_s, osem_s)
        set_b = (b12_t, cw_t, acc_t, sem_t, osem_t)

        def win_in(s):
            off = pl.multiple_of(s * (slab_stride * 8), 1024)
            return pltpu.make_async_copy(
                body_hbm.at[pl.ds(off, window_rows * 8)], win_ref, win_sem)

        def win_out(s):
            off = pl.multiple_of(s * (slab_stride * 8), 1024)
            return pltpu.make_async_copy(
                win_ref, body_hbm.at[pl.ds(off, window_rows * 8)], win_sem)

        def in_copies(bufs, blk):
            b12r, cwr, accr, sem, _ = bufs
            off2 = pl.multiple_of(blk * (BLK * 2), BLK)
            off14 = pl.multiple_of(blk * (BLK * 14), BLK)
            off4 = pl.multiple_of(blk * (BLK * 4), BLK)
            return (
                pltpu.make_async_copy(b12_hbm.at[pl.ds(off2, BLK * 2)],
                                      b12r, sem.at[0]),
                pltpu.make_async_copy(cw_hbm.at[pl.ds(off14, BLK * 14)],
                                      cwr, sem.at[1]),
                pltpu.make_async_copy(acc_hbm.at[pl.ds(off4, BLK * 4)],
                                      accr, sem.at[2]),
            )

        def acc_out_copy(bufs, blk):
            off4 = pl.multiple_of(blk * (BLK * 4), BLK)
            return pltpu.make_async_copy(
                bufs[2], acc_hbm.at[pl.ds(off4, BLK * 4)], bufs[4])

        def start_block(bufs, blk):
            for cp in in_copies(bufs, blk):
                cp.start()

        def wait_block(bufs, blk):
            for cp in in_copies(bufs, blk):
                cp.wait()

        # --- per-contact sweeps; body indices are window-local ---

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

        def warm_sweep(bufs, cnt):
            b12r, conr, accr = bufs[:3]

            def one(k, _):
                cb = k * 14
                nx = conr[cb]
                ny = conr[cb + 1]
                wn = conr[cb + 12]
                wt = conr[cb + 13]
                px = nx * wn - ny * wt
                py = ny * wn + nx * wt
                r1x = conr[cb + 2]
                r1y = conr[cb + 3]
                r2x = conr[cb + 4]
                r2y = conr[cb + 5]
                i = b12r[k]
                j = b12r[BLK + k]
                im1 = win_ref[i + 3]
                ii1 = win_ref[i + 4]
                im2 = win_ref[j + 3]
                ii2 = win_ref[j + 4]
                win_ref[i] = win_ref[i] - px * im1
                win_ref[i + 1] = win_ref[i + 1] - py * im1
                win_ref[i + 2] = win_ref[i + 2] - ii1 * (r1x * py - r1y * px)
                win_ref[j] = win_ref[j] + px * im2
                win_ref[j + 1] = win_ref[j + 1] + py * im2
                win_ref[j + 2] = win_ref[j + 2] + ii2 * (r2x * py - r2y * px)
                accr[k * 4] = wn
                accr[k * 4 + 1] = wt
                accr[k * 4 + 2] = 0.0
                accr[k * 4 + 3] = 0.0
                return 0
            unroll2(one, cnt)
            # dead tail: only the accumulators need initializing
            jax.lax.fori_loop(cnt, BLK, _acc_zero(accr), 0)

        def _acc_zero(accr):
            def zero(k, _):
                accr[k * 4] = 0.0
                accr[k * 4 + 1] = 0.0
                accr[k * 4 + 2] = 0.0
                accr[k * 4 + 3] = 0.0
                return 0
            return zero

        def make_vel_sweep(with_res):
            def vel_sweep(bufs, cnt):
                b12r, conr, accr = bufs[:3]

                def one(k, _):
                    cb = k * 14
                    nx = conr[cb]
                    ny = conr[cb + 1]
                    r1x = conr[cb + 2]
                    r1y = conr[cb + 3]
                    r2x = conr[cb + 4]
                    r2y = conr[cb + 5]
                    mn = conr[cb + 6]
                    mt = conr[cb + 7]
                    fr = conr[cb + 8]
                    dstv = conr[cb + 9]
                    ctn = conr[cb + 11]
                    i = b12r[k]
                    j = b12r[BLK + k]
                    im1 = win_ref[i + 3]
                    ii1 = win_ref[i + 4]
                    im2 = win_ref[j + 3]
                    ii2 = win_ref[j + 4]
                    vx1 = win_ref[i]
                    vy1 = win_ref[i + 1]
                    w1 = win_ref[i + 2]
                    vx2 = win_ref[j]
                    vy2 = win_ref[j + 1]
                    w2 = win_ref[j + 2]
                    # ONE relative-velocity evaluation; exact post-normal vt
                    # via the precomputed coupling ctn = J_t M^-1 J_n^T
                    # (solver.prepare) — same restructure as the fused kernel.
                    dvx = vx2 - w2 * r2y - vx1 + w1 * r1y
                    dvy = vy2 + w2 * r2x - vy1 - w1 * r1x
                    vn = nx * dvx + ny * dvy
                    vt = -ny * dvx + nx * dvy
                    d = (dstv - vn) * mn
                    a = accr[k * 4]
                    na = jnp.maximum(a + d, 0.0)
                    dn = na - a
                    accr[k * 4] = na
                    if with_res:
                        res = jnp.abs(dn)
                    d = -(vt + ctn * dn) * mt
                    a = accr[k * 4 + 1]
                    mf = fr * na
                    ta = jnp.minimum(jnp.maximum(a + d, -mf), mf)
                    dt = ta - a
                    accr[k * 4 + 1] = ta
                    px = nx * dn - ny * dt
                    py = ny * dn + nx * dt
                    win_ref[i] = vx1 - px * im1
                    win_ref[i + 1] = vy1 - py * im1
                    win_ref[i + 2] = w1 - ii1 * (r1x * py - r1y * px)
                    win_ref[j] = vx2 + px * im2
                    win_ref[j + 1] = vy2 + py * im2
                    win_ref[j + 2] = w2 + ii2 * (r2x * py - r2y * px)
                    if with_res:
                        res_ref[0] = jnp.maximum(
                            res_ref[0], jnp.maximum(res, jnp.abs(dt)))
                    return 0
                unroll2(one, cnt)

            return vel_sweep

        vel_sweep = make_vel_sweep(True)
        vel_sweep_nores = make_vel_sweep(False)

        def make_pos_sweep(with_pres):
            def pos_sweep(bufs, cnt):
                b12r, conr, accr = bufs[:3]

                def one(k, _):
                    cb = k * 14
                    nx = conr[cb]
                    ny = conr[cb + 1]
                    r1x = conr[cb + 2]
                    r1y = conr[cb + 3]
                    r2x = conr[cb + 4]
                    r2y = conr[cb + 5]
                    mn = conr[cb + 6]
                    ddv = conr[cb + 10]
                    i = b12r[k]
                    j = b12r[BLK + k]
                    im1 = win_ref[i + 3]
                    ii1 = win_ref[i + 4]
                    im2 = win_ref[j + 3]
                    ii2 = win_ref[j + 4]
                    px1 = win_ref[i + 5]
                    py1 = win_ref[i + 6]
                    q1 = win_ref[i + 7]
                    px2 = win_ref[j + 5]
                    py2 = win_ref[j + 6]
                    q2 = win_ref[j + 7]
                    dvx = px2 - q2 * r2y - px1 + q1 * r1y
                    dvy = py2 + q2 * r2x - py1 - q1 * r1x
                    vn = nx * dvx + ny * dvy
                    d = (ddv - vn) * mn
                    a = accr[k * 4 + 2]
                    na = jnp.maximum(a + d, 0.0)
                    d = na - a
                    accr[k * 4 + 2] = na
                    ix = nx * d
                    iy = ny * d
                    win_ref[i + 5] = px1 - ix * im1
                    win_ref[i + 6] = py1 - iy * im1
                    win_ref[i + 7] = q1 - ii1 * (r1x * iy - r1y * ix)
                    win_ref[j + 5] = px2 + ix * im2
                    win_ref[j + 6] = py2 + iy * im2
                    win_ref[j + 7] = q2 + ii2 * (r2x * iy - r2y * ix)
                    if with_pres:
                        pres_ref[0] = jnp.maximum(pres_ref[0], jnp.abs(d))
                    return 0
                unroll2(one, cnt)

            return pos_sweep

        pos_sweep = make_pos_sweep(pos_gated)

        # --- user-joint sweeps (row encodings: joints.py; math mirrors
        # the streamed kernel's joint sweeps, window-local indices) ---

        def joint_apply(i, j, r1x, r1y, r2x, r2y, px, py, off):
            im1 = win_ref[i + 3]
            ii1 = win_ref[i + 4]
            im2 = win_ref[j + 3]
            ii2 = win_ref[j + 4]
            win_ref[i + off] = win_ref[i + off] - px * im1
            win_ref[i + off + 1] = win_ref[i + off + 1] - py * im1
            win_ref[i + off + 2] = (win_ref[i + off + 2]
                                    - ii1 * (r1x * py - r1y * px))
            win_ref[j + off] = win_ref[j + off] + px * im2
            win_ref[j + off + 1] = win_ref[j + off + 1] + py * im2
            win_ref[j + off + 2] = (win_ref[j + off + 2]
                                    + ii2 * (r2x * py - r2y * px))

        def joint_geom(conr, cb):
            kind = conr[cb + 11]
            is_rev = kind == 1.0
            r1x = jnp.where(is_rev, conr[cb], conr[cb + 2])
            r1y = jnp.where(is_rev, conr[cb + 1], conr[cb + 3])
            r2x = jnp.where(is_rev, conr[cb + 2], conr[cb + 4])
            r2y = jnp.where(is_rev, conr[cb + 3], conr[cb + 5])
            return is_rev, r1x, r1y, r2x, r2y

        def joint_warm_sweep(bufs, cnt):
            b12r, conr, accr = bufs[:3]

            def one(k, _):
                cb = k * 14
                is_rev, r1x, r1y, r2x, r2y = joint_geom(conr, cb)
                wx = conr[cb + 12]
                wy = conr[cb + 13]
                px = jnp.where(is_rev, wx, conr[cb] * wx)
                py = jnp.where(is_rev, wy, conr[cb + 1] * wx)
                i = b12r[k]
                j = b12r[BLK + k]
                joint_apply(i, j, r1x, r1y, r2x, r2y, px, py, 0)
                accr[k * 4] = wx
                accr[k * 4 + 1] = jnp.where(is_rev, wy, 0.0)
                accr[k * 4 + 2] = 0.0
                accr[k * 4 + 3] = 0.0
                return 0
            jax.lax.fori_loop(0, cnt, one, 0)
            jax.lax.fori_loop(cnt, BLK, _acc_zero(accr), 0)

        def make_joint_vel_sweep(with_res):
            def joint_vel_sweep(bufs, cnt):
                b12r, conr, accr = bufs[:3]

                def one(k, _):
                    cb = k * 14
                    is_rev, r1x, r1y, r2x, r2y = joint_geom(conr, cb)
                    i = b12r[k]
                    j = b12r[BLK + k]
                    vx1 = win_ref[i]
                    vy1 = win_ref[i + 1]
                    w1 = win_ref[i + 2]
                    vx2 = win_ref[j]
                    vy2 = win_ref[j + 1]
                    w2 = win_ref[j + 2]
                    dvx = vx2 - w2 * r2y - vx1 + w1 * r1y
                    dvy = vy2 + w2 * r2x - vy1 - w1 * r1x
                    m00 = conr[cb + 4]
                    m01 = conr[cb + 5]
                    m11 = conr[cb + 6]
                    px_r = -(m00 * dvx + m01 * dvy)
                    py_r = -(m01 * dvx + m11 * dvy)
                    nx = conr[cb]
                    ny = conr[cb + 1]
                    dd = -(conr[cb + 6]) * (nx * dvx + ny * dvy)
                    px = jnp.where(is_rev, px_r, nx * dd)
                    py = jnp.where(is_rev, py_r, ny * dd)
                    accr[k * 4] = accr[k * 4] + jnp.where(is_rev, px, dd)
                    accr[k * 4 + 1] = accr[k * 4 + 1] + jnp.where(
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

        def make_joint_pos_sweep(with_pres):
            def joint_pos_sweep(bufs, cnt):
                b12r, conr, accr = bufs[:3]

                def one(k, _):
                    cb = k * 14
                    is_rev, r1x, r1y, r2x, r2y = joint_geom(conr, cb)
                    i = b12r[k]
                    j = b12r[BLK + k]
                    px1 = win_ref[i + 5]
                    py1 = win_ref[i + 6]
                    q1 = win_ref[i + 7]
                    px2 = win_ref[j + 5]
                    py2 = win_ref[j + 6]
                    q2 = win_ref[j + 7]
                    dvx = px2 - q2 * r2y - px1 + q1 * r1y
                    dvy = py2 + q2 * r2x - py1 - q1 * r1x
                    m00 = conr[cb + 4]
                    m01 = conr[cb + 5]
                    m11 = conr[cb + 6]
                    dstx = conr[cb + 7]
                    dsty = conr[cb + 8]
                    ex = dstx - dvx
                    ey = dsty - dvy
                    px_r = m00 * ex + m01 * ey
                    py_r = m01 * ex + m11 * ey
                    nx = conr[cb]
                    ny = conr[cb + 1]
                    dd = conr[cb + 6] * (conr[cb + 7]
                                         - (nx * dvx + ny * dvy))
                    px = jnp.where(is_rev, px_r, nx * dd)
                    py = jnp.where(is_rev, py_r, ny * dd)
                    accr[k * 4 + 2] = accr[k * 4 + 2] + jnp.where(
                        is_rev, px, dd)
                    accr[k * 4 + 3] = accr[k * 4 + 3] + jnp.where(
                        is_rev, py, 0.0)
                    joint_apply(i, j, r1x, r1y, r2x, r2y, px, py, 5)
                    if with_pres:
                        pres_ref[0] = jnp.maximum(
                            pres_ref[0],
                            jnp.maximum(jnp.abs(px), jnp.abs(py)))
                    return 0
                jax.lax.fori_loop(0, cnt, one, 0)

            return joint_pos_sweep

        joint_pos_sweep = make_joint_pos_sweep(pos_gated)

        # --- orchestration: pass -> slab -> block (round 5 rework) ---
        #
        # The round-4 walk recomputed pass/slab/block indices from the
        # global step id with ~12 traced integer div/rem per block —
        # expensive on the single-issue scalar core (the streamed kernel
        # carries (p, b) incrementally for exactly this reason, a
        # measured round-2 win) — and walked every CAPACITY-sized block
        # (the dead-block skip saved the DMA + dispatch, not the walk).
        # Now the walk carries (p, s, bi) incrementally with ZERO traced
        # div/rem per block, and on passes p >= 1 visits ONLY live
        # blocks: slab s contributes ceil(counts[s]/BLK) contact blocks
        # then ceil(counts_j[s]/BLK) joint blocks (an all-dead slab
        # contributes one dummy step so the advance needs no inner
        # loop).  The warm pass still walks all blocks (it zero-fills
        # dead acc slots in HBM).  The live-block visit ORDER is
        # unchanged (slab asc, contacts then joints, block asc), so
        # physics is bit-identical.  Windows are DMA'd only when the
        # slab CHANGES (a pass wrap on the same slab is a semantic
        # no-op round trip).

        BSH = BLK.bit_length() - 1
        assert BLK == 1 << BSH

        def _ceil_blk(x):
            return jax.lax.shift_right_logical(x + (BLK - 1), BSH)

        def c_end(p, s):
            """One past the last contact block index walked in slab s."""
            live = jnp.minimum(_ceil_blk(num_ref[s]), cbps)
            if n_slabs == 1:
                # Hazard guard: a pass must span >= 2 walked steps so
                # the next pass's first acc read is never issued in the
                # same step that sweeps (and writes) that block.  With
                # n_slabs >= 2 the per-slab dummy steps guarantee it;
                # a single slab walks >= 2 contact blocks instead
                # (cbps >= 2 enforced by solve_contacts_tiled).
                live = jnp.maximum(live, 2)
            return jnp.where(p == 0, cbps, live)

        def j_end(p, s):
            """One past the last joint block index (absolute, >= cbps)."""
            if not has_joints:
                return jnp.int32(bps)    # == cbps: no joint region
            live = cbps + jnp.minimum(_ceil_blk(num_ref[n_slabs + s]), jbps)
            return jnp.where(p == 0, bps, live)

        def first_bi(p, s):
            """First walked block of slab s on pass p; bps = dummy
            sentinel for an all-dead slab (one no-op step)."""
            ce = c_end(p, s)
            je = j_end(p, s)
            return jnp.where(ce > 0, 0, jnp.where(je > cbps, cbps, bps))

        def advance(p, s, bi):
            """Next (p, s, bi, pstart) after (p, s, bi) in the live
            walk.  No div/rem; worst case ~4 SMEM reads."""
            ce = c_end(p, s)
            je = j_end(p, s)
            nbi = bi + 1
            # contacts exhausted -> joint region (or dummy-end)
            nbi = jnp.where((bi < cbps) & (nbi >= ce),
                            jnp.where(je > cbps, cbps, bps), nbi)
            done = nbi >= je
            wrap = s + 1 >= n_slabs
            s2 = jnp.where(done, jnp.where(wrap, 0, s + 1), s)
            p2 = jnp.where(done & wrap, p + 1, p)
            bi2 = jnp.where(done, first_bi(p2, s2), nbi)
            return p2, s2, bi2, done & wrap

        def _gate_alive(p):
            alive = p == p  # True
            if vel_gated:
                alive = alive & ~((p >= 1) & (p <= vel_iters)
                                  & (conv_ref[0] == 1))
            if pos_gated:
                alive = alive & ~((p > vel_iters) & (conv_ref[1] == 1))
            return alive

        def do_block(cur, nxt, ci, ni, p, s, bi, pstart,
                     np_, ns_, nbi_, has_next):
            """(p, s, bi) = this step; (np_, ns_, nbi_) = next step
            (valid iff has_next); ci/ni = static buffer-set index
            (0 = set_a) of cur/nxt; pstart = first walked block of
            pass p.

            started_ref[k]: 1 iff input DMAs are in flight for buffer
            set k (written by the block that started them, read by the
            block that owns them — paired exactly even when the skip
            predicate's conv flags change in between).  pending_ref[k]:
            blk+1 of the outstanding acc write-back from set k (0 =
            none); waited before the set's buffers are reused and in
            the final drain."""
            blk = s * bps + bi
            dummy = bi >= bps
            pass_end = has_next & (np_ != p) | ~has_next

            @pl.when(has_next)
            def _():
                # Gated mode skips converged passes' blocks; a dummy
                # step (all-dead slab) never owns DMA.  On p >= 1 every
                # walked non-dummy block is live by construction.
                want = (nbi_ < bps) & _gate_alive(np_)
                started_ref[ni] = want.astype(jnp.int32)

                @pl.when(want)
                def _():
                    @pl.when(pending_ref[ni] > 0)
                    def _():
                        acc_out_copy(nxt, pending_ref[ni] - 1).wait()
                        pending_ref[ni] = 0
                    # RAW airtightness: dummy/skipped steps defer the
                    # usual pending wait, and HBM DMAs on different
                    # semaphores are unordered — so ANY outstanding acc
                    # write (either set) must land before new reads are
                    # issued.  pending[ci] is 0 in steady state (waited
                    # by the previous step's prefetch); this fires only
                    # after skip runs.
                    @pl.when(pending_ref[ci] > 0)
                    def _():
                        acc_out_copy(cur, pending_ref[ci] - 1).wait()
                        pending_ref[ci] = 0
                    start_block(nxt, ns_ * bps + nbi_)

            mine = (started_ref[ci] == 1) & ~dummy

            if has_joints:
                is_j = (bi >= cbps).astype(jnp.int32)
                cnt = jnp.where(
                    is_j == 1,
                    jnp.clip(num_ref[n_slabs + s] - (bi - cbps) * BLK,
                             0, BLK),
                    jnp.clip(num_ref[s] - bi * BLK, 0, BLK))
            else:
                is_j = None
                cnt = jnp.clip(num_ref[s] - bi * BLK, 0, BLK)

            if gated:
                # Residual-gated mode: EVERY velocity pass records the
                # residual (the gate reads it); reset at each pass start
                # unless already converged.  Runtime thresholds from
                # tol_ref (0.0 never fires).
                @pl.when(pstart & (p >= 1) & (p <= vel_iters)
                         & (conv_ref[0] == 0))
                def _():
                    res_ref[0] = 0.0

                if pos_gated:
                    @pl.when(pstart & (p > vel_iters)
                             & (conv_ref[1] == 0))
                    def _():
                        pres_ref[0] = 0.0

                # 0 warm, 1 velocity (with residual), 2 position
                kind = jnp.where(p == 0, 0,
                                 jnp.where(p <= vel_iters, 1, 2))

                def gated_vel(f):
                    # skip the SWEEP once converged; the DMA pipeline
                    # (windows + blocks) streams on regardless — ~100 us
                    # against a ~58 ms sweep pass at mega scale
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

                @pl.when(mine)
                def _():
                    wait_block(cur, blk)
                    if has_joints:
                        jax.lax.switch(kind + 3 * is_j, [
                            lambda: warm_sweep(cur, cnt),
                            lambda: gated_vel(
                                lambda: vel_sweep(cur, cnt)),
                            lambda: gated_pos(
                                lambda: pos_sweep(cur, cnt)),
                            lambda: joint_warm_sweep(cur, cnt),
                            lambda: gated_vel(
                                lambda: joint_vel_sweep(cur, cnt)),
                            lambda: gated_pos(
                                lambda: joint_pos_sweep(cur, cnt)),
                        ])
                    else:
                        jax.lax.switch(kind, [
                            lambda: warm_sweep(cur, cnt),
                            lambda: gated_vel(
                                lambda: vel_sweep(cur, cnt)),
                            lambda: gated_pos(
                                lambda: pos_sweep(cur, cnt)),
                        ])
                    acc_out_copy(cur, blk).start()
                    pending_ref[ci] = blk + 1

                # end of a velocity/position pass: latch convergence
                # (outside the skip guard — a dummy/skipped last block
                # must still latch; res/pres survive skipped blocks)
                @pl.when(pass_end & (p >= 1)
                         & (p <= vel_iters) & (res_ref[0] < tol_ref[0]))
                def _():
                    conv_ref[0] = 1

                if pos_gated:
                    @pl.when(pass_end
                             & (p > vel_iters)
                             & (pres_ref[0] < tol_ref[1]))
                    def _():
                        conv_ref[1] = 1
            else:
                # Fixed-count mode: the residual is reported for the LAST
                # velocity pass only, so earlier velocity passes run the
                # no-residual sweep variant (~6 fewer ops per live visit).
                @pl.when(pstart & (p == vel_iters))
                def _():
                    res_ref[0] = 0.0

                # 0 warm, 1 velocity (no residual), 2 last velocity,
                # 3 position
                kind = jnp.where(
                    p == 0, 0,
                    jnp.where(p < vel_iters, 1,
                              jnp.where(p == vel_iters, 2, 3)))

                @pl.when(mine)
                def _():
                    wait_block(cur, blk)
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
                    acc_out_copy(cur, blk).start()
                    pending_ref[ci] = blk + 1

        # total walked steps: warm pass walks all blocks; each later pass
        # walks the live blocks (>= 1 dummy step per all-dead slab)
        def _count_live(s, acc):
            lc = jnp.minimum(_ceil_blk(num_ref[s]), cbps)
            if has_joints:
                lc = lc + jnp.minimum(_ceil_blk(num_ref[n_slabs + s]),
                                      jbps)
            return acc + jnp.maximum(lc, 1)

        live_per_pass = jax.lax.fori_loop(0, n_slabs, _count_live,
                                          jnp.int32(0))
        total_d = n_slabs * bps + (n_passes - 1) * live_per_pass

        # window handling: flush + load only when the slab CHANGES (a
        # pass wrap on the same slab would be a no-op round trip);
        # dummy steps never touch the window.
        def maybe_window(s, dummy, win_slab):
            @pl.when((s != win_slab) & ~dummy)
            def _():
                @pl.when(win_slab >= 0)
                def _():
                    cpo = win_out(win_slab)
                    cpo.start()
                    cpo.wait()
                cpi = win_in(s)
                cpi.start()
                cpi.wait()
            return jnp.where(dummy, win_slab, s)

        start_block(set_a, jnp.int32(0))   # block 0 = warm pass: always live
        started_ref[0] = 1
        started_ref[1] = 0
        pending_ref[0] = 0
        pending_ref[1] = 0

        def one_step(has_self, has_next, st, cur, nxt, ci, ni):
            """Execute one walked step from state st = (p, s, bi,
            pstart, win_slab) and return the advanced state.  The step
            body is guarded by ``has_self`` (the window DMA inside
            maybe_window and everything in do_block are side effects);
            the returned state only advances when the step ran."""
            p, s, bi, pstart, win_slab = st
            np_, ns_, nbi_, npstart = advance(p, s, bi)
            dummy = bi >= bps

            @pl.when(has_self)
            def _():
                maybe_window(s, dummy, win_slab)
                do_block(cur, nxt, ci, ni, p, s, bi, pstart,
                         np_, ns_, nbi_, has_next)

            win2 = jnp.where(has_self & ~dummy, s, win_slab)
            return (jnp.where(has_self, np_, p),
                    jnp.where(has_self, ns_, s),
                    jnp.where(has_self, nbi_, bi),
                    jnp.where(has_self, npstart, pstart), win2)

        def g2step(h, st):
            g = 2 * h
            true_ = h >= 0
            st = one_step(true_, g + 1 < total_d, st, set_a, set_b, 0, 1)
            st = one_step(g + 1 < total_d, g + 2 < total_d, st,
                          set_b, set_a, 1, 0)
            return st

        init = (jnp.int32(0), jnp.int32(0), jnp.int32(0),
                jnp.int32(1) == 1, jnp.int32(-1))
        final = jax.lax.fori_loop(0, (total_d + 1) // 2, g2step, init)

        # drain: at most one acc write-back outstanding per buffer set
        @pl.when(pending_ref[0] > 0)
        def _():
            acc_out_copy(set_a, pending_ref[0] - 1).wait()

        @pl.when(pending_ref[1] > 0)
        def _():
            acc_out_copy(set_b, pending_ref[1] - 1).wait()

        @pl.when(final[4] >= 0)
        def _():
            cpo = win_out(final[4])
            cpo.start()
            cpo.wait()

    return kern


@functools.partial(jax.jit, static_argnames=("vel_iters", "pos_iters",
                                             "n_slabs", "slab_stride",
                                             "window_rows", "jbps",
                                             "vel_gated", "pos_gated"))
def solve_contacts_tiled(
    body_flat: jax.Array,    # (Npad*8,) f32, x-rank permuted, Npad mult 128
    b12_flat: jax.Array,     # (S*2,) i32 window-LOCAL row offsets (x8),
    #   block-transposed: each BLK-slot block is [b1 x BLK][b2 x BLK]
    #   (round 5: k / BLK+k reads beat per-visit 2k/2k+1 address math),
    #   slab-sorted+padded
    cw_flat: jax.Array,      # (S*14,) f32 [12 con cols | warm_n | warm_t]
    slab_counts: jax.Array,  # (2*n_slabs,) i32 live contact/joint per slab
    vel_iters: int,
    pos_iters: int,
    n_slabs: int,
    slab_stride: int,        # rows between slab window starts (mult 128)
    window_rows: int,        # rows per window (mult 128)
    jbps: int = 0,           # joint blocks per slab (after the contacts)
    vel_gated: bool = False,
    pos_gated: bool = False,
    tols: jax.Array | None = None,  # (2,) f32 [vel, pos] thresholds
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (body_flat', acc (S*4,), residual (1,)).

    Slot layout per slab: ``cbps`` contact blocks then ``jbps`` joint
    blocks, where cbps = S/(n_slabs*BLK) - jbps.

    ``vel_gated``/``pos_gated`` compile the residual-gated early exit
    (VERDICT r3 #4 — the tiled kernel was the last backend without it);
    the runtime thresholds in ``tols`` (solver.velocity_threshold /
    position_threshold) gate without recompiling (0.0 never fires).

    Round 4: the per-slot inputs arrive PACKED ((S,2) i32 endpoints +
    (S,14) f32 con|warm) so each contact block costs 3 DMA issue+wait
    round trips instead of 5 — the caller's routing tables are already
    in these layouts."""
    s_cap = b12_flat.shape[0] // 2
    assert s_cap % (n_slabs * BLK) == 0
    bps = s_cap // (n_slabs * BLK)
    cbps = bps - jbps
    assert cbps >= 1
    # hazard guard (see c_end): a single-slab walk needs >= 2 contact
    # blocks so no pass is a single step
    assert n_slabs > 1 or cbps >= 2, (n_slabs, cbps)
    npad = body_flat.shape[0] // 8
    assert (n_slabs - 1) * slab_stride + window_rows <= npad
    if tols is None:
        tols = jnp.zeros((2,), jnp.float32)
    kern = _tiled_kernel(vel_iters, pos_iters, n_slabs, cbps, jbps,
                         window_rows, slab_stride, vel_gated, pos_gated)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)

    def bufset():
        return [
            pltpu.SMEM((BLK * 2,), jnp.int32),
            pltpu.SMEM((BLK * 14,), jnp.float32),
            pltpu.SMEM((BLK * 4,), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA,
        ]

    body_out, acc, res = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((npad * 8,), jnp.float32),
            jax.ShapeDtypeStruct((s_cap * 4,), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ),
        in_specs=[smem, smem, anyspec, anyspec, anyspec],
        out_specs=(anyspec, anyspec, smem),
        input_output_aliases={4: 0},
        scratch_shapes=([pltpu.SMEM((window_rows * 8,), jnp.float32),
                         pltpu.SemaphoreType.DMA,
                         pltpu.SMEM((2,), jnp.int32),
                         pltpu.SMEM((1,), jnp.float32),
                         pltpu.SMEM((2,), jnp.int32),
                         pltpu.SMEM((2,), jnp.int32)]
                        + bufset() + bufset()),
        interpret=_use_interpret(),
    )(slab_counts.astype(jnp.int32), tols, b12_flat, cw_flat, body_flat)
    return body_out, acc, res
