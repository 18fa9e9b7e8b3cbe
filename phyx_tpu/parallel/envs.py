"""Batch-sharded independent scenes: the data-parallel axis.

The RL-style rollout config (BASELINE.json:11: 4096 envs × 256 bodies) has
two TPU-native realizations:

* ``concat_envs`` — the preferred single-chip form: envs are CONCATENATED
  into one mega-scene, each env shifted to its own disjoint x-band.  The
  physics is block-diagonal by construction (AABBs of different envs can
  never overlap), so one ``step`` call advances every env with zero
  batching machinery, and the broadphase/solver see one large scene —
  exactly the regime the kernels are optimized for.  O(1) compiled
  programs regardless of env count.

* ``make_env_batch`` / ``sharded_env_step`` — vmap over a leading env axis,
  sharded over a device mesh for multi-chip scale-out.  XLA inserts no
  collectives inside the step (envs are independent); the mesh only
  partitions work — the ideal weak-scaling case.  (vmap currently requires
  the XLA solver backend; the SMEM kernels don't auto-batch.)
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from phyx_tpu.config import SimConfig
from phyx_tpu.step import step
from phyx_tpu.types import State
from phyx_tpu.world import SceneBuilder


def concat_envs(builders: Sequence[SceneBuilder], cfg: SimConfig,
                band_width: float = 1.0e4, y_bands: int = 1,
                band_height: float = 0.0):
    """Merge per-env SceneBuilders into one mega SceneBuilder.

    Env ``e`` is translated to a band-grid cell: x band ``e // y_bands``
    (spacing ``band_width``) and y band ``e % y_bands`` (spacing
    ``band_height``).  With bands larger than any env's extent the
    broadphase can never pair bodies across envs.

    ``y_bands > 1`` exists for LARGE env counts (config E, 4096 envs): a
    pure x-line at thousands of envs pushes |x| past 2^21 where the f32
    ulp (~0.25) exceeds the contact slop and quantizes the physics; a
    grid keeps every coordinate small.  The only cost is x-sweep density
    (bodies of y-stacked envs share x-intervals and are rejected by the
    y-test), which the dynamic-trip tiled sweep absorbs.

    Returns ``(mega_builder, env_slices, offsets)`` where
    ``env_slices[e]`` indexes env e's bodies in the mega body arrays and
    ``offsets[e]`` is its (x, y) translation (subtract to recover
    env-local positions).
    """
    if y_bands > 1 and band_height <= 0.0:
        raise ValueError("y_bands > 1 requires band_height > 0")
    mega = SceneBuilder(cfg)
    slices: List[slice] = []
    offsets = np.zeros((len(builders), 2), np.float32)
    x_count = -(-len(builders) // y_bands)
    x0 = x_count / 2.0
    for e, sb in enumerate(builders):
        dx = (e // y_bands - x0) * band_width
        dy = (e % y_bands) * band_height
        offsets[e] = (dx, dy)
        start = mega.num_bodies
        for r in sb._rows:
            mega._rows.append({**r, "pos": r["pos"] + np.array([dx, dy])})
        for j in sb._joints:
            mega._joints.append({**j, "b1": j["b1"] + start,
                                 "b2": j["b2"] + start})
        slices.append(slice(start, mega.num_bodies))
    return mega, slices, offsets


def env_positions(state: State, env_slices, offsets) -> List[np.ndarray]:
    """Per-env local positions from a mega-scene state (forces one sync)."""
    pos = np.asarray(state.bodies.pos)
    return [pos[s] - offsets[e] for e, s in enumerate(env_slices)]


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


def concat_envs_grouped(builders: Sequence[SceneBuilder], cfg: SimConfig,
                        n_groups: int, band_width: float = 1.0e4,
                        y_bands: int = 1, band_height: float = 0.0):
    """Split envs into ``n_groups`` contiguous groups, concat each group
    into its own mega-scene, and stack the group states on a leading axis
    for ``sharded_mega_step`` (VERDICT r3 #6: the multi-chip form of the
    flagship mega-scene path).

    ``cfg`` sizes ONE group (max_bodies >= bodies of len(builders) /
    n_groups envs).  Returns ``(stacked_state, env_slices, offsets)``
    where ``env_slices[g][e]`` / ``offsets[g][e]`` locate env e of group
    g inside that group's body arrays (same contract as concat_envs).
    """
    if len(builders) % n_groups:
        raise ValueError(
            f"{len(builders)} envs not divisible by {n_groups} groups")
    per = len(builders) // n_groups
    states, slices, offsets = [], [], []
    for g in range(n_groups):
        mega, sl, off = concat_envs(
            builders[g * per:(g + 1) * per], cfg, band_width=band_width,
            y_bands=y_bands, band_height=band_height)
        states.append(mega.build())
        slices.append(sl)
        offsets.append(off)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    return stacked, slices, offsets


def sharded_mega_step(cfg: SimConfig, mesh: Mesh, axis: str = "env",
                      num_steps: int = 1):
    """Multi-chip scale-out of the MEGA-SCENE path: one per-device
    mega-scene (a group of envs) advanced by the unmodified single-chip
    ``step`` under ``jax.shard_map`` (VERDICT r3 #6).

    Unlike ``sharded_env_step`` (vmap: XLA solver only) this runs the
    Pallas backends — the same way parallel/spatial.py proves Pallas
    composes with shard_map — and unlike spatial sharding it needs NO
    halo exchange: env groups are disjoint by construction (concat_envs
    band layout), so the step body contains zero collectives; stats stay
    per-group (leading axis ``n_groups``), aggregate on the host.

    Returns a jitted ``stacked_state -> stacked_state`` advancing
    ``num_steps`` frames per call (one lax.scan inside the shard).
    Build the input with ``concat_envs_grouped`` and ``device_put`` it
    with ``NamedSharding(mesh, P(axis))`` (or let jit move it).
    """
    spec = P(axis)

    def local_chunk(st: State) -> State:
        st = jax.tree.map(lambda a: a[0], st)   # drop the size-1 shard dim

        def one(s, _):
            return step(s, cfg), None

        out, _ = jax.lax.scan(one, st, None, length=num_steps)
        return jax.tree.map(lambda a: a[None], out)

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # metadata (same reason parallel/spatial.py disables it)
    shmapped = jax.shard_map(local_chunk, mesh=mesh, in_specs=spec,
                             out_specs=spec, check_vma=False)
    return jax.jit(shmapped)
