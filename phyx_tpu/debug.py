"""Debug-mode stepping: checkify NaN/overflow guards (SURVEY.md §5.2).

The reference's safety story is "by construction" plus eyeballing the demo;
the rebuild's production step is a pure jitted program where a NaN produced
mid-rollout would silently propagate through the whole ``lax.scan``.  This
module wraps ``step``/``rollout`` with ``jax.experimental.checkify`` guards
that fail loudly instead:

  * non-finite positions / velocities / rotations after the step,
  * denormalized rotation basis (|(cos, sin)| drifting from 1),
  * broadphase pair-budget overflow (dropped contacts = silently wrong
    physics; raise ``max_pairs`` instead).

Use in debugging / CI only — the checks add a fenced reduction per field.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from phyx_tpu.config import SimConfig
from phyx_tpu.step import step
from phyx_tpu.types import State


def _guards(out: State) -> None:
    checkify.check(jnp.all(jnp.isfinite(out.bodies.pos)),
                   "non-finite body position after step")
    checkify.check(jnp.all(jnp.isfinite(out.bodies.vel)),
                   "non-finite body velocity after step")
    checkify.check(jnp.all(jnp.isfinite(out.bodies.angvel)),
                   "non-finite angular velocity after step")
    rot_norm = jnp.sum(out.bodies.rot * out.bodies.rot, axis=1)
    ok = jnp.where(out.bodies.active,
                   jnp.abs(rot_norm - 1.0) < 1e-3, True)
    checkify.check(jnp.all(ok), "rotation basis denormalized")
    checkify.check(out.stats.pair_overflow == 0,
                   "pair budget overflow: {n} candidate pairs dropped "
                   "(raise max_pairs)", n=out.stats.pair_overflow)
    checkify.check(out.stats.halo_overflow == 0,
                   "spatial halo overflow: {n} bodies reach past the "
                   "exported halo (grow halo / rebalance)",
                   n=out.stats.halo_overflow)


@functools.lru_cache(maxsize=None)
def _checked_step(cfg: SimConfig):
    def guarded(state: State) -> State:
        out = step(state, cfg)
        _guards(out)
        return out

    return jax.jit(checkify.checkify(guarded, errors=checkify.user_checks))


@functools.lru_cache(maxsize=None)
def _checked_rollout(cfg: SimConfig, num_steps: int):
    def guarded(state: State) -> State:
        def body(s, _):
            out = step(s, cfg)
            _guards(out)
            return out, None

        out, _ = jax.lax.scan(body, state, None, length=num_steps)
        return out

    return jax.jit(checkify.checkify(guarded, errors=checkify.user_checks))


def checked_step(state: State, cfg: SimConfig) -> State:
    """``step`` with NaN/denorm/overflow guards; raises on violation."""
    err, out = _checked_step(cfg)(state)
    err.throw()
    return out


def checked_rollout(state: State, cfg: SimConfig, num_steps: int) -> State:
    """``rollout`` with per-frame guards inside the scan; raises on the
    first violating frame's error (the scan still runs to completion —
    checkify joins errors — but the FIRST error is reported)."""
    err, out = _checked_rollout(cfg, num_steps)(state)
    err.throw()
    return out
