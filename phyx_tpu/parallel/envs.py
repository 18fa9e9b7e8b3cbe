"""Batch-sharded independent scenes: the data-parallel axis.

The RL-style rollout config (BASELINE.json:11: 4096 envs × 256 bodies) maps
each env to a vmap lane and shards the env axis across the device mesh.
XLA inserts no collectives at all inside the step (envs are independent);
the mesh only partitions work — the ideal weak-scaling case.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from phyx_tpu.config import SimConfig
from phyx_tpu.step import step
from phyx_tpu.types import State


def make_env_batch(states, mesh: Optional[Mesh] = None,
                   axis: str = "env") -> State:
    """Stack per-env States into a batched State, sharded over mesh[axis]."""
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    if mesh is not None:
        sharding = NamedSharding(mesh, P(axis))
        batch = jax.tree.map(
            lambda x: jax.device_put(x, sharding), batch)
    return batch


def sharded_env_step(cfg: SimConfig, mesh: Mesh, axis: str = "env"):
    """Returns a jitted batched step whose env axis is sharded over the mesh.

    The output sharding constraint keeps every step's result distributed —
    no implicit gathers between steps.
    """
    sharding = NamedSharding(mesh, P(axis))

    @jax.jit
    def _vstep(batch: State) -> State:
        batch = jax.lax.with_sharding_constraint(batch, sharding)
        out = jax.vmap(lambda s: step(s, cfg))(batch)
        return jax.lax.with_sharding_constraint(out, sharding)

    return _vstep
