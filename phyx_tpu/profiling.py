"""Per-stage step profiling as a library facility (SURVEY.md §5.1, C15).

The reference vendors microprofile for scoped per-phase timers; on this
stack per-op tracing is unusable (``jax.profiler`` instruments every DMA
and inflates Pallas kernels ~50x — measured, BASELINE.md) so the TPU-native
equivalent is PREFIX TRUNCATION: time jitted scans of progressively longer
prefixes of the step pipeline; consecutive differences are per-stage costs
under real fusion.

Measurement-integrity rules baked in (BASELINE.md "Measurement integrity"):

  * every timing is fenced by fetching a live scalar (a value transfer
    cannot return early; ``block_until_ready`` can on this PJRT stack);
  * no iteration is repeatable: each scan step perturbs positions above
    f32 ulp and feeds stage outputs back into the carried state;
  * everything scans on device (per-dispatch timing would measure the
    ~300 ms host tunnel).

Usage::

    from phyx_tpu.profiling import profile_step
    rows = profile_step(state, cfg, reps=100)
    # rows = [{"stage": "broadphase", "ms": 11.2, "cum_ms": ...}, ...]

Joint scenes (round 3, VERDICT r2 #8): joint-pair exclusion rides in the
broadphase stage (as in step()), joint-row prepare is its own
``joint_prepare`` stage, and the solve stage runs contacts + joints fused
— via step.solve_stage, the EXACT function step() ships, so the profiled
solve is the shipped solve on every backend (fused/streamed/tiled/XLA).
"""

from __future__ import annotations

import functools
import time
from typing import Dict, List

import jax
import jax.numpy as jnp

from phyx_tpu import solver
from phyx_tpu.broadphase import broadphase
from phyx_tpu.cache import build_cache, warm_start_from_cache
from phyx_tpu.config import SimConfig
from phyx_tpu.narrowphase import narrowphase_with_props
from phyx_tpu.step import (exclude_joint_pairs, integrate_velocities,
                           prepare_joint_stage, solve_stage, step)
from phyx_tpu.types import State

STAGES = ["integrate", "broadphase", "narrowphase", "cache_join", "prepare",
          "solve", "build_cache"]
STAGES_JOINTS = ["integrate", "broadphase", "narrowphase", "cache_join",
                 "prepare", "joint_prepare", "solve", "build_cache"]


def _prefix_step(st: State, k, depth: int, cfg: SimConfig,
                 has_joints: bool) -> State:
    """First ``depth`` stages of step(); returns a perturbed state whose
    positions depend on every executed stage's output (nothing is dead)."""
    d_jp = 5 if has_joints else 99      # joint_prepare stage index
    d_solve = 6 if has_joints else 5
    d_cache = d_solve + 1

    bodies = st.bodies.replace(pos=st.bodies.pos + 1e-5 * (k % 7))
    bodies = integrate_velocities(bodies, cfg)
    fb = jnp.float32(0.0)
    if depth >= 1:
        pairs = broadphase(bodies, cfg)
        if has_joints:
            pairs = exclude_joint_pairs(pairs, st.joints,
                                        n_cap=cfg.max_bodies)
        fb += (pairs.num % 3).astype(jnp.float32) * 1e-9
    if depth >= 2:
        contacts, pair_props = narrowphase_with_props(bodies, pairs, cfg)
        fb += jnp.sum(contacts.penetration) * 1e-12
        fb += jnp.sum(pair_props[0][:, 3]) * 1e-12   # keep the props live
    if depth >= 3:
        contacts = warm_start_from_cache(contacts, pairs, st.cache,
                                         n_cap=cfg.max_bodies)
        fb += jnp.sum(contacts.warm_n) * 1e-12
    if depth >= 4:
        contacts = solver.prepare(bodies, contacts, cfg,
                                  pair_props=pair_props)
        fb += jnp.sum(contacts.mass_n) * 1e-12
    joint_rows = joint_warm = None
    if depth >= d_jp:
        joint_rows, joint_warm = prepare_joint_stage(bodies, st.joints, cfg)
        fb += jnp.sum(joint_rows) * 1e-12
    if depth >= d_solve:
        # depth >= d_solve implies depth >= d_jp: joint_rows are ready
        (bodies2, an, at, res, joints_out, pairs) = solve_stage(
            bodies, contacts, pairs, st.joints, joint_rows, joint_warm,
            cfg)
        fb += res * 1e-9
        if has_joints:
            fb += jnp.sum(joints_out.accum) * 1e-12
    if depth >= d_cache:
        cache = build_cache(contacts, pairs, an, at)
        fb += jnp.sum(cache.normal_impulse) * 1e-12
        st = st.replace(cache=cache)
    return st.replace(bodies=st.bodies.replace(
        pos=st.bodies.pos + fb + 1e-5 * (k % 7)))


@functools.lru_cache(maxsize=None)
def _runner(cfg: SimConfig, depth: int, reps: int, has_joints: bool):
    @jax.jit
    def run(st):
        def body(carry, _):
            s, k = carry
            return (_prefix_step(s, k, depth, cfg, has_joints), k + 1), None

        (out, _), _ = jax.lax.scan(body, (st, jnp.float32(0.0)), None,
                                   length=reps)
        return out

    return run


@functools.lru_cache(maxsize=None)
def _full_runner(cfg: SimConfig, reps: int):
    @jax.jit
    def run(st):
        def body(s, _):
            return step(s, cfg), None

        out, _ = jax.lax.scan(body, st, None, length=reps)
        return out

    return run


def _fence(st: State) -> float:
    """A live scalar fetch — the only trustworthy fence on this stack."""
    return float(st.bodies.pos[0, 0])


def profile_step(state: State, cfg: SimConfig, reps: int = 100
                 ) -> List[Dict]:
    """Fenced per-stage breakdown of ``step`` on (state, cfg).

    Returns a list of rows ``{"stage", "ms", "cum_ms"}`` (per-stage delta
    and cumulative prefix cost), ending with a ``{"stage": "REAL full
    step", "ms": ...}`` ground-truth row measured on the actual ``step``.
    Joint scenes get an extra ``joint_prepare`` row; their solve row is
    the fused contacts+joints solve.
    """
    has_joints = bool(state.joints.capacity)
    stages = STAGES_JOINTS if has_joints else STAGES

    def timed(depth: int) -> float:
        run = _runner(cfg, depth, reps, has_joints)
        out = run(state)
        _fence(out)
        t0 = time.perf_counter()
        out = run(out)          # chain: new input = previous output
        _fence(out)
        return (time.perf_counter() - t0) / reps * 1e3

    rows: List[Dict] = []
    prev = timed(0)
    rows.append({"stage": "integrate", "ms": round(prev, 3),
                 "cum_ms": round(prev, 3)})
    for d in range(1, len(stages)):
        t = timed(d)
        rows.append({"stage": stages[d], "ms": round(t - prev, 3),
                     "cum_ms": round(t, 3)})
        prev = t

    run = _full_runner(cfg, reps)
    out = run(state)
    _fence(out)
    t0 = time.perf_counter()
    out = run(out)
    _fence(out)
    rows.append({"stage": "REAL full step",
                 "ms": round((time.perf_counter() - t0) / reps * 1e3, 3)})
    return rows
