"""Slab-segmented tiled contact solver (round 5).

Same body-window tiling idea as contact_solver_tiled.py — bodies are
pre-permuted into x-rank order and embedded into slab windows that are
DMA'd through one SMEM window buffer — but the CONTACT stream is laid
out exactly like the streamed kernel's: live slots tightly packed in
slab-major order, walked as contiguous BLK blocks with the streamed
kernel's double-buffer discipline.  Slab boundaries fall anywhere
inside a block; the kernel switches the body window mid-block at the
(rare) straddle points instead of padding every slab to block
multiples.

Why: the round-4 tiled layout padded each slab's rows to
capacity-sized per-slab block budgets, which required the caller to
route rows with a 20-operand sort (solver._route_rows_to_slabs), an
inverse 5-operand sort for the accumulators, and made the warm pass
walk thousands of dead capacity blocks at settled mega-scenes.  Here
the caller passes rows ALREADY in slab-major order (the broadphase
finalize sort emits pairs keyed by (slab, pi, pj) — broadphase.py
slab-major path), so the prep needs no routing sort at all, the
accumulator output is in natural contact order (no unroute), and every
walked block is live.

Sweep bodies, visit arithmetic, and the live-visit ORDER are identical
to contact_solver_tiled.py (slab-ascending, (pi, pj)-ascending within a
slab — see solver.solve_pallas_tiled2's stability argument), so physics
matches the round-4 tiled backend at exact equality (dead slots inside
valid pairs are visited as exact no-ops: zero masses and zero warm
impulses make every write a ``x - 0.0 * m`` identity, differing at most
in the sign of a written ±0.0).

Caller contract (solver.solve_pallas_tiled2):
  * body rows x-rank permuted + embedded: slab s's window = rows
    [s*K, s*K + W), each slab led by a 128-row zero block (statics at
    rest remap there), K/W multiples of 128.
  * contact slots slab-major, live pairs first (2 slots per pair),
    ``cum[s]`` = total live slots of slabs < s; slots of dead pairs
    (>= cum[n_slabs]) never walked; SAT-dead slots inside live pairs
    are exact no-ops (masses/warm zeroed by solver.prepare + cache).
  * b12 window-LOCAL row offsets (x8), block-transposed like the
    round-4 kernel ([b1 x BLK][b2 x BLK] per block).
  * joints are NOT handled here — jointed scenes take the round-4
    kernel (solver.py dispatches).

Reference parity: this replaces the reference's per-island solver loop
(SURVEY.md §3.3) at 100k+ body counts; domain decomposition is slab
windows, Gauss-Seidel order is preserved globally because slabs are
swept sequentially within every pass.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phyx_tpu.kernels.contact_solver_streamed import BLK


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tiled2_kernel(vel_iters: int, pos_iters: int, n_slabs: int,
                   n_cap_blocks: int, window_rows: int, slab_stride: int,
                   vel_gated: bool = False, pos_gated: bool = False):
    """Pass p: 0 = warm start, 1..vel_iters = velocity, rest = position.
    Walk: pass -> contiguous live block -> slab segments inside the
    block (usually one)."""

    n_passes = 1 + vel_iters + pos_iters
    gated = vel_gated or pos_gated
    BSH = BLK.bit_length() - 1
    assert BLK == 1 << BSH

    def kern(cum_ref,                 # (n_slabs+1,) i32 SMEM live-slot cumsum
             tol_ref,                 # (2,) f32 SMEM [vel, pos] thresholds
             b12_hbm, cw_hbm,         # ANY: packed (S,2) i32 + (S,14) f32
             body_io_hbm, acc_io_hbm,  # aliased inputs (use output refs)
             body_hbm, acc_hbm, res_ref,
             win_ref, win_sem,        # SMEM window + DMA sem
             conv_ref, pres_ref,      # SMEM (2,) i32 flags + (1,) f32
             s_ref,                   # SMEM (1,) i32 loaded-window slab
             b12_s, cw_s, acc_s, sem_s, osem_s,
             b12_t, cw_t, acc_t, sem_t, osem_t):
        del body_io_hbm, acc_io_hbm
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

        def switch_window(s_old, s_new):
            cpo = win_out(s_old)
            cpo.start()
            cpo.wait()
            cpi = win_in(s_new)
            cpi.start()
            cpi.wait()

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

        # --- per-contact sweeps over slot range [k0, k1); body indices
        # are window-local (the caller pre-subtracted slab*K and x8'd)

        def unroll2(visit, k0, k1):
            """Sixteen visits per hardware-loop iteration (same measured
            unroll as the other kernels); segment bounds are traced."""
            W = 16 if not _use_interpret() else 4
            span = k1 - k0

            def block(h, _):
                k = k0 + W * h
                for o in range(W):
                    visit(k + o, 0)
                return 0
            jax.lax.fori_loop(0, jax.lax.shift_right_logical(span, 4)
                              if W == 16 else span // W, block, 0)
            jax.lax.fori_loop(k0 + (span // W) * W, k1,
                              lambda k, _: visit(k, 0), 0)

        def warm_sweep(bufs, k0, k1):
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
            unroll2(one, k0, k1)

        def _acc_zero(accr):
            def zero(k, _):
                accr[k * 4] = 0.0
                accr[k * 4 + 1] = 0.0
                accr[k * 4 + 2] = 0.0
                accr[k * 4 + 3] = 0.0
                return 0
            return zero

        def make_vel_sweep(with_res):
            def vel_sweep(bufs, k0, k1):
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
                unroll2(one, k0, k1)

            return vel_sweep

        vel_sweep = make_vel_sweep(True)
        vel_sweep_nores = make_vel_sweep(False)

        def make_pos_sweep(with_pres):
            def pos_sweep(bufs, k0, k1):
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
                unroll2(one, k0, k1)

            return pos_sweep

        pos_sweep = make_pos_sweep(pos_gated)

        # --- walk bookkeeping ---

        nbt = cum_ref[n_slabs]                     # total live slots
        nb = jnp.maximum(
            jax.lax.shift_right_logical(nbt + (BLK - 1), BSH), 2)
        total_d = n_passes * nb

        # first slab with any live slots (cum is nondecreasing, so the
        # empty prefix is exactly the slabs with cum[s+1] == 0)
        s_first = jax.lax.fori_loop(
            0, n_slabs,
            lambda s, a: a + (cum_ref[s + 1] <= 0).astype(jnp.int32),
            jnp.int32(0))
        s_first = jnp.minimum(s_first, n_slabs - 1)

        def sweep_segments(kind_dispatch, cur, b, cnt):
            """Sweep this block's [0, cnt) live rows, switching the body
            window at slab boundaries.  ``s_ref`` holds the loaded slab;
            the common case (whole block inside one slab) pays one SMEM
            read + compare beyond the streamed kernel's block cost."""
            base = b * BLK
            s = s_ref[0]
            k1 = jnp.clip(cum_ref[s + 1] - base, 0, cnt)
            kind_dispatch(cur, jnp.int32(0), k1)

            @pl.when(k1 < cnt)
            def _():                      # straddle: advance slab by slab
                def adv(_, k0):
                    active = k0 < cnt

                    @pl.when(active)
                    def _():
                        so = s_ref[0]
                        switch_window(so, so + 1)
                        s_ref[0] = so + 1
                    s2 = s_ref[0]
                    k1b = jnp.clip(cum_ref[s2 + 1] - base, 0, cnt)

                    @pl.when(active & (k1b > k0))
                    def _():
                        kind_dispatch(cur, k0, k1b)
                    return jnp.where(active, k1b, k0)
                jax.lax.fori_loop(0, n_slabs, adv, k1)

        def do_step(p, b, has_next, cur, nxt):
            nb_i = nb
            next_b = jnp.where(b + 1 == nb_i, 0, b + 1)
            prev_b = jnp.where(b == 0, nb_i - 1, b - 1)
            not_first = (p > 0) | (b > 0)

            @pl.when(has_next)
            def _():
                @pl.when(not_first)
                def _():
                    acc_out_copy(nxt, prev_b).wait()
                start_block(nxt, next_b)

            wait_block(cur, b)

            cnt = jnp.clip(nbt - b * BLK, 0, BLK)

            # pass wrap: rewind the window to the first live slab (only
            # when it actually changed — single-slab scenes never flush)
            @pl.when((b == 0) & (s_ref[0] != s_first))
            def _():
                switch_window(s_ref[0], s_first)
                s_ref[0] = s_first

            if gated:
                @pl.when((b == 0) & (p >= 1) & (p <= vel_iters)
                         & (conv_ref[0] == 0))
                def _():
                    res_ref[0] = 0.0

                if pos_gated:
                    @pl.when((b == 0) & (p > vel_iters)
                             & (conv_ref[1] == 0))
                    def _():
                        pres_ref[0] = 0.0

                kind = jnp.where(p == 0, 0,
                                 jnp.where(p <= vel_iters, 1, 2))

                def gated_vel(f):
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

                def dispatch(bufs, k0, k1):
                    jax.lax.switch(kind, [
                        lambda: warm_sweep(bufs, k0, k1),
                        lambda: gated_vel(lambda: vel_sweep(bufs, k0, k1)),
                        lambda: gated_pos(lambda: pos_sweep(bufs, k0, k1)),
                    ])

                sweep_segments(dispatch, cur, b, cnt)

                @pl.when((b == nb_i - 1) & (p >= 1) & (p <= vel_iters)
                         & (res_ref[0] < tol_ref[0]))
                def _():
                    conv_ref[0] = 1

                if pos_gated:
                    @pl.when((b == nb_i - 1) & (p > vel_iters)
                             & (pres_ref[0] < tol_ref[1]))
                    def _():
                        conv_ref[1] = 1
            else:
                @pl.when((b == 0) & (p == vel_iters))
                def _():
                    res_ref[0] = 0.0

                kind = jnp.where(
                    p == 0, 0,
                    jnp.where(p < vel_iters, 1,
                              jnp.where(p == vel_iters, 2, 3)))

                def dispatch(bufs, k0, k1):
                    jax.lax.switch(kind, [
                        lambda: warm_sweep(bufs, k0, k1),
                        lambda: vel_sweep_nores(bufs, k0, k1),
                        lambda: vel_sweep(bufs, k0, k1),
                        lambda: pos_sweep(bufs, k0, k1),
                    ])

                sweep_segments(dispatch, cur, b, cnt)

            # warm pass: the block's dead tail still owns acc slots that
            # the aliased-zeros init doesn't cover (this block IS walked
            # and written back whole)
            @pl.when(p == 0)
            def _():
                jax.lax.fori_loop(cnt, BLK, _acc_zero(cur[2]), 0)

            acc_out_copy(cur, b).start()

        def advance(p, b):
            wrap = b + 1 == nb
            return jnp.where(wrap, p + 1, p), jnp.where(wrap, 0, b + 1)

        def more(p, b):
            return (p < n_passes - 1) | (b < nb - 1)

        # initial window + first block
        cpi = win_in(s_first)
        cpi.start()
        cpi.wait()
        s_ref[0] = s_first
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
        # Drain both in-flight acc write-outs (same argument as the
        # streamed kernel: steps total_d-2 and total_d-1, nb >= 2, buffer
        # parity = step parity; total_d is dynamic here).
        even_total = (total_d & 1) == 0

        def drain(step_parity_odd, blk):
            @pl.when(~step_parity_odd)
            def _():
                acc_out_copy(set_a, blk).wait()

            @pl.when(step_parity_odd)
            def _():
                acc_out_copy(set_b, blk).wait()

        drain(~even_total, nb - 2)
        drain(even_total, nb - 1)
        # flush the body window back
        cpo = win_out(s_ref[0])
        cpo.start()
        cpo.wait()

    return kern


@functools.partial(jax.jit, static_argnames=("vel_iters", "pos_iters",
                                             "n_slabs", "slab_stride",
                                             "window_rows",
                                             "vel_gated", "pos_gated"))
def solve_contacts_tiled2(
    body_flat: jax.Array,    # (npad*8,) f32, embedded slab layout
    b12_flat: jax.Array,     # (S*2,) i32 window-LOCAL rows (x8),
    #   block-transposed [b1 x BLK][b2 x BLK], slab-major slot order
    cw_flat: jax.Array,      # (S*14,) f32 [12 con cols | warm_n | warm_t]
    cum: jax.Array,          # (n_slabs+1,) i32 live-slot cumsum
    vel_iters: int,
    pos_iters: int,
    n_slabs: int,
    slab_stride: int,        # rows between slab window starts (mult 128)
    window_rows: int,        # rows per window (mult 128)
    vel_gated: bool = False,
    pos_gated: bool = False,
    tols: Optional[jax.Array] = None,  # (2,) f32 [vel, pos] thresholds
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (body_flat', acc (S*4,), residual (1,)).

    ``acc`` is in the INPUT slot order (slab-major) — no unrouting
    needed by the caller.  Slots past ``cum[n_slabs]`` read back as
    exact zeros (aliased zero init; never walked except the >= 2
    walked-blocks floor, whose extra block is swept empty)."""
    s_cap = b12_flat.shape[0] // 2
    assert s_cap % BLK == 0 and s_cap >= 2 * BLK, s_cap
    npad = body_flat.shape[0] // 8
    assert (n_slabs - 1) * slab_stride + window_rows <= npad
    assert cum.shape[0] == n_slabs + 1
    if tols is None:
        tols = jnp.zeros((2,), jnp.float32)
    kern = _tiled2_kernel(vel_iters, pos_iters, n_slabs,
                          s_cap // BLK, window_rows, slab_stride,
                          vel_gated, pos_gated)
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

    acc_init = jnp.zeros((s_cap * 4,), jnp.float32)
    body_out, acc, res = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((npad * 8,), jnp.float32),
            jax.ShapeDtypeStruct((s_cap * 4,), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ),
        in_specs=[smem, smem, anyspec, anyspec, anyspec, anyspec],
        out_specs=(anyspec, anyspec, smem),
        input_output_aliases={4: 0, 5: 1},
        scratch_shapes=([pltpu.SMEM((window_rows * 8,), jnp.float32),
                         pltpu.SemaphoreType.DMA,
                         pltpu.SMEM((2,), jnp.int32),
                         pltpu.SMEM((1,), jnp.float32),
                         pltpu.SMEM((1,), jnp.int32)]
                        + bufset() + bufset()),
        interpret=_use_interpret(),
    )(cum.astype(jnp.int32), tols, b12_flat, cw_flat, body_flat, acc_init)
    return body_out, acc, res
