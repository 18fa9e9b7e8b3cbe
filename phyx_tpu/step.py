"""The fused simulation step — TPU-native ``Scene::Update``.

One jitted program per (config, capacity) pair, zero host round-trips
(SURVEY.md §3.2, BASELINE.json:5):

    integrate velocities (gravity)
    -> broadphase (sorted sweep & prune, static shapes)
    -> [jointed-pair collision exclusion]
    -> narrowphase (batched SAT + clip)
    -> contact-cache join (warm-start impulses carried across frames)
    -> prepare + compaction + fused Pallas solve (warm start, velocity
       sweeps, displacement sweeps, user-joint rows); colored XLA sweeps
       as the fallback backend
    -> integrate positions (velocity + split-impulse pseudo-velocity)
    -> rebuild cache, emit stats

``step`` is a pure ``State -> State`` function of SoA pytrees composing
with ``jax.jit`` and ``jax.lax.scan`` (rollouts).  Batched independent
scenes run as one block-diagonal mega-scene (parallel/envs.py) — the
preferred form; ``jax.vmap`` works only with the XLA solver backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from phyx_tpu import math2d as m2
from phyx_tpu import solver
from phyx_tpu.broadphase import broadphase
from phyx_tpu.cache import build_cache, warm_start_from_cache
from phyx_tpu.coloring import color_contacts
from phyx_tpu.config import SimConfig
from phyx_tpu.narrowphase import narrowphase_with_props
from phyx_tpu.types import Bodies, SolverStats, State


def integrate_velocities(bodies: Bodies, cfg: SimConfig) -> Bodies:
    g = jnp.asarray(cfg.gravity, jnp.float32)
    dynamic = (bodies.inv_mass > 0.0) & bodies.active
    vel = jnp.where(dynamic[:, None], bodies.vel + g * cfg.dt, bodies.vel)
    return bodies.replace(vel=vel)


def integrate_positions(bodies: Bodies, cfg: SimConfig) -> Bodies:
    dynamic = (bodies.inv_mass > 0.0) & bodies.active
    pos = jnp.where(dynamic[:, None],
                    bodies.pos + bodies.vel * cfg.dt + bodies.dvel,
                    bodies.pos)
    dw = bodies.angvel * cfg.dt + bodies.dangvel
    rot = jnp.where(dynamic[:, None],
                    m2.rot_advance(bodies.rot, dw), bodies.rot)
    zero2 = jnp.zeros_like(bodies.dvel)
    zero1 = jnp.zeros_like(bodies.dangvel)
    return bodies.replace(pos=pos, rot=rot, dvel=zero2, dangvel=zero1)


def exclude_joint_pairs(pairs, joints, n_cap=None):
    """Drop candidate pairs whose bodies are connected by a user joint
    (collide-connected = false, matching standard engine semantics): the
    contact constraints would fight the joint and jitter the chain.

    ``n_cap`` (body capacity) enables the packed single-key pair sort
    (broadphase.lex_sort_pairs); None falls back to the two-key sort."""
    from phyx_tpu.broadphase import EMPTY, Pairs, lex_sort_pairs

    def _sort(a, b):
        return (lex_sort_pairs(a, b, n_cap) if n_cap is not None
                else jax.lax.sort((a, b), num_keys=2))

    from phyx_tpu.cache import lex_join

    ja = jnp.minimum(joints.b1, joints.b2)
    jb = jnp.maximum(joints.b1, joints.b2)
    live = joints.kind != 0
    ja = jnp.where(live, ja, EMPTY)
    jb = jnp.where(live, jb, EMPTY)
    ja, jb = _sort(ja, jb)
    _, hit = lex_join(ja, jb, pairs.pi, pairs.pj, n_cap=n_cap)
    pi = jnp.where(hit, EMPTY, pairs.pi)
    pj = jnp.where(hit, EMPTY, pairs.pj)
    pi, pj = _sort(pi, pj)
    return pairs.replace(pi=pi, pj=pj, valid=pi != EMPTY,
                         num=pairs.num - hit.sum(dtype=jnp.int32))


@functools.partial(jax.jit, static_argnames=("cfg",))
def step(state: State, cfg: SimConfig) -> State:
    """One simulation frame.  jit-compiled per static cfg."""
    bodies = integrate_velocities(state.bodies, cfg)

    # jointed scenes: no slab-major routing (exclude_joint_pairs re-sorts
    # the pair buffer, and the jointed tiled path keeps the round-4 kernel)
    pairs = broadphase(bodies, cfg,
                       tiled_routing=False if state.joints.capacity
                       else None)
    if state.joints.capacity:
        pairs = exclude_joint_pairs(pairs, state.joints,
                                    n_cap=cfg.max_bodies)
    # one gather serves both SAT geometry and solver-prepare properties
    contacts, pair_props = narrowphase_with_props(bodies, pairs, cfg)
    contacts = warm_start_from_cache(contacts, pairs, state.cache,
                                     n_cap=cfg.max_bodies)

    contacts = solver.prepare(bodies, contacts, cfg, pair_props=pair_props)

    joint_rows, joint_warm = prepare_joint_stage(bodies, state.joints, cfg)
    (bodies, accum_n, accum_t, residual, joints_out,
     pairs) = solve_stage(bodies, contacts, pairs, state.joints,
                          joint_rows, joint_warm, cfg)
    bodies = integrate_positions(bodies, cfg)

    cache = build_cache(contacts, pairs, accum_n, accum_t)
    stats = SolverStats(
        num_pairs=pairs.num,
        num_contacts=contacts.valid.sum(dtype=jnp.int32),
        pair_overflow=pairs.overflow,
        max_penetration=jnp.max(
            jnp.where(contacts.valid, contacts.penetration, 0.0)),
        residual=residual,
        halo_overflow=state.stats.halo_overflow,  # set by spatial sharding
        ovf_window=pairs.ovf_window,
        ovf_slots=pairs.ovf_slots,
        ovf_drop=pairs.ovf_drop,
        ovf_band=pairs.ovf_band,
        ovf_slab=pairs.ovf_slab,
    )
    return State(bodies=bodies, joints=joints_out, cache=cache, stats=stats)


def prepare_joint_stage(bodies: Bodies, joints, cfg: SimConfig):
    """User-joint row prepare (joints.prepare_joint_rows) — a distinct
    profiling stage; (None, None) for jointless scenes."""
    if joints.capacity == 0:
        return None, None
    from phyx_tpu.joints import prepare_joint_rows
    return prepare_joint_rows(bodies, joints, cfg)


def solve_stage(bodies: Bodies, contacts, pairs, joints,
                joint_rows, joint_warm, cfg: SimConfig):
    """Constraint solve: backend selection + compaction + velocity/position
    passes.  Shared verbatim by step() and profiling.profile_step so the
    profiled solve IS the shipped solve.

    Returns (bodies', accum_n, accum_t, residual, joints_out, pairs') —
    pairs' carries any tiled slab overflow added into pairs.overflow.
    """
    # Backend selection (static, by capacity): all-SMEM fused kernel when
    # everything fits; HBM-streamed kernel when only the body state fits;
    # colored XLA sweeps as the last-resort correctness fallback.
    from phyx_tpu.kernels.contact_solver_streamed import BLK as _BLK
    c_cap = contacts.valid.shape[0]
    j_cap = joints.capacity
    use_pallas = cfg.solver_backend in ("pallas", "pallas_tiled")
    streamed = False
    tiled = False
    if cfg.solver_backend == "pallas_tiled":
        # forced tiled path (tests / dryrun / micro benches exercise the
        # 100k-class kernel at small shapes)
        assert c_cap % _BLK == 0 and c_cap >= 2 * _BLK, c_cap
        tiled = True
    elif use_pallas and solver.pallas_smem_bytes(
            bodies.capacity, c_cap + j_cap) > solver.PALLAS_SMEM_BUDGET:
        if (c_cap % _BLK == 0 and c_cap >= 2 * _BLK
                and solver.pallas_streamed_smem_bytes(bodies.capacity)
                <= solver.PALLAS_SMEM_BUDGET):
            # joints stream too (blocks appended after the contact region)
            streamed = True
        elif c_cap % _BLK == 0 and c_cap >= 2 * _BLK:
            # body table beyond SMEM too: x-sorted slab windows (joints
            # route to slabs like contacts)
            tiled = True
        else:
            use_pallas = False
    joints_out = joints
    if use_pallas:
        # fused kernel: exact serial Gauss-Seidel order, no coloring needed
        if tiled and getattr(pairs, "routing", None) is not None \
                and j_cap == 0:
            # Slab-major path (round 5): the broadphase finalized pairs
            # in slab order with routed endpoints riding along — zero
            # solve-side routing sorts, accumulators in natural order.
            # ovf_slab was already counted into pairs by the broadphase.
            (bodies, accum_n, accum_t,
             residual) = solver.solve_pallas_tiled2(
                bodies, contacts, pairs.routing, cfg)
            joint_accum = jnp.zeros((0, 2), jnp.float32)
        elif tiled:
            # No pre-compaction: the tiled path re-sorts rows into slabs
            # itself (stable, dead rows last) and returns accumulators in
            # the original contact order — compacting first would just add
            # a redundant full-buffer permute at 100k+ scale.
            from phyx_tpu.broadphase import (banded_x, compute_aabbs,
                                             segmented_order)
            lo, hi = compute_aabbs(bodies)
            # banded keys (band-grid mega-scenes) concentrate each env's
            # contact partners into nearby ranks, shrinking slab-halo
            # spreads; slab-window violations are clamped + counted by
            # the solver either way (crossers counted by broadphase).
            swx_lo, _, _, _ = banded_x(lo, hi, bodies.active, cfg)
            xkeys = jnp.where(bodies.active, swx_lo, jnp.float32(jnp.inf))
            if cfg.sweep_band_rows > 0:
                # per-band batched sort — identical permutation while
                # bodies sit in their home bands (broadphase counts the
                # ones that left; slab violations are clamped+counted by
                # the solver regardless of rank layout)
                xorder = segmented_order(xkeys, cfg)
            else:
                xorder = jnp.argsort(xkeys).astype(jnp.int32)
            (bodies, accum_n, accum_t, residual, tiled_ovf,
             joint_accum) = solver.solve_pallas_tiled(
                bodies, contacts, xorder, cfg,
                joints=joints if j_cap else None,
                joint_rows=joint_rows, joint_warm=joint_warm)
            pairs = pairs.replace(overflow=pairs.overflow + tiled_ovf,
                                  ovf_slab=pairs.ovf_slab + tiled_ovf)
        else:
            # Compact live contacts to the front (stable, so the sweep
            # order of valid rows is unchanged): the serial kernel then
            # visits only live rows — SAT rejects ~30% of candidate slots
            # in dense piles, and each dead slot would still cost a full
            # sweep body.  Row gathers are row-serialized on this chip
            # (~12 ns/row, BASELINE.md), so instead of permuting all 19
            # Contacts fields we pack the 14 solver-read columns (+2
            # astype'd int ids) into ONE (C, 16) matrix, gather it once,
            # and un-permute the accumulators with one scatter (fenced:
            # benches/micro_compaction.py, 2.16 -> 0.64 ms at 10k shapes).
            order = jnp.argsort(jnp.logical_not(contacts.valid))
            # Body ids ride in the f32 pack VALUE-converted (exact for
            # ids < 2^24), NOT bitcast: TPU canonicalizes odd f32 bit
            # patterns (NaN payloads, possibly denormals) in data
            # movement — a bitcast int survives only by luck (the cache
            # join's bitcast fid measurably lost its -1 sentinels).
            pack = jnp.concatenate([
                contacts.normal, contacts.r1, contacts.r2,
                jnp.stack([
                    contacts.mass_n, contacts.mass_t, contacts.friction,
                    contacts.dst_v, contacts.dst_dv, contacts.c_nt,
                    contacts.warm_n, contacts.warm_t,
                    contacts.b1.astype(jnp.float32),
                    contacts.b2.astype(jnp.float32)], axis=1),
            ], axis=1)[order]
            # Only the fields solve_pallas reads are re-pointed at the
            # permuted pack; the rest (valid/fid/penetration/color) stay
            # in original order and MUST NOT be read from ``compacted``.
            compacted = contacts.replace(
                normal=pack[:, 0:2], r1=pack[:, 2:4], r2=pack[:, 4:6],
                mass_n=pack[:, 6], mass_t=pack[:, 7], friction=pack[:, 8],
                dst_v=pack[:, 9], dst_dv=pack[:, 10], c_nt=pack[:, 11],
                warm_n=pack[:, 12], warm_t=pack[:, 13],
                b1=pack[:, 14].astype(jnp.int32),
                b2=pack[:, 15].astype(jnp.int32))
            num_live = contacts.valid.sum(dtype=jnp.int32)
            (bodies, accum_n, accum_t, residual,
             joint_accum) = solver.solve_pallas(
                bodies, compacted, num_live, cfg, streamed=streamed,
                joints=joints if j_cap else None,
                joint_rows=joint_rows, joint_warm=joint_warm)
            back = jnp.zeros((order.shape[0], 2), jnp.float32).at[order].set(
                jnp.stack([accum_n, accum_t], axis=1))
            accum_n = back[:, 0]
            accum_t = back[:, 1]
        if j_cap:
            joints_out = joints.replace(accum=joint_accum)
    else:
        # Pure-XLA fallback (SURVEY.md §7.6): colored Gauss-Seidel sweeps.
        # User joints (VERDICT r2 #3) are colored like contacts and swept
        # after them each iteration — convergence-level parity with the
        # serial Pallas order; also the vmap/sharded-env path for jointed
        # scenes (the SMEM kernels don't auto-batch).
        body_static = (bodies.inv_mass == 0.0) & (bodies.inv_inertia == 0.0)
        contacts = color_contacts(contacts, body_static, cfg)
        xj = None
        if j_cap:
            from phyx_tpu.coloring import color_rows
            jvalid = joints.kind != 0
            nb = jnp.int32(bodies.capacity - 1)
            jb1 = jnp.minimum(joints.b1, nb)
            jb2 = jnp.minimum(joints.b2, nb)
            jcolor = color_rows(jb1, jb2, jvalid, body_static,
                                cfg.num_colors)
            xj = solver.XlaJoints(rows=joint_rows, b1=jb1, b2=jb2,
                                  warm=joint_warm, color=jcolor,
                                  valid=jvalid)
        bodies = solver.warm_start(bodies, contacts, xj)
        if xj is not None:
            (bodies, accum_n, accum_t, residual,
             joint_accum) = solver.solve_velocity(bodies, contacts, cfg, xj)
            joints_out = joints.replace(accum=joint_accum)
        else:
            bodies, accum_n, accum_t, residual = solver.solve_velocity(
                bodies, contacts, cfg)
        bodies = solver.solve_position(bodies, contacts, cfg, xj)
    return bodies, accum_n, accum_t, residual, joints_out, pairs


@functools.partial(jax.jit, static_argnames=("cfg", "n"))
def _rollout_impl(state: State, cfg: SimConfig, n: int) -> State:
    def body(s, _):
        return step(s, cfg), None
    out, _ = jax.lax.scan(body, state, None, length=n)
    return out


def rollout(state: State, cfg: SimConfig, num_steps: int) -> State:
    """num_steps frames under one jit via lax.scan (no per-step dispatch).

    The jitted callable is module-level so repeat calls with the same
    (cfg, num_steps) skip retracing — defining the jit inside this function
    would re-trace per call and cost ~0.5 s of host time each time."""
    return _rollout_impl(state, cfg, num_steps)
