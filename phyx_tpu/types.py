"""Core state pytrees (SoA, fixed capacity).

TPU-native equivalent of the reference's ``RigidBody`` / ``Manifold`` data
model (SURVEY.md §2 C2/C5): every per-body and per-contact quantity is a
struct-of-arrays ``jnp`` array with a static capacity and an active mask, so
the entire simulation state is a pytree that flows through one jitted step
with zero host round-trips (BASELINE.json:5).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    cls.replace = lambda self, **kw: dataclasses.replace(self, **kw)
    return cls


@_pytree_dataclass
class Bodies:
    """SoA rigid-body state, capacity ``N = pos.shape[0]``.

    Rotation is a (cos, sin) basis pair per body, mirroring the reference's
    ``Coords2f`` x/y-basis representation (SURVEY.md §2 C1).  Static bodies
    have ``inv_mass == inv_inertia == 0``; free slots have ``active == False``
    (and are parked far away so the broadphase never pairs them).
    """

    pos: jax.Array          # (N, 2) f32
    rot: jax.Array          # (N, 2) f32 (cos, sin)
    vel: jax.Array          # (N, 2) f32
    angvel: jax.Array       # (N,)  f32
    # split-impulse pseudo-velocities, consumed by position integration
    dvel: jax.Array         # (N, 2) f32 displacing linear velocity
    dangvel: jax.Array      # (N,)  f32 displacing angular velocity
    inv_mass: jax.Array     # (N,)  f32
    inv_inertia: jax.Array  # (N,)  f32
    half_extent: jax.Array  # (N, 2) f32 box half sizes
    friction: jax.Array     # (N,)  f32
    restitution: jax.Array  # (N,)  f32
    active: jax.Array       # (N,)  bool

    @property
    def capacity(self) -> int:
        return self.pos.shape[-2]

    @staticmethod
    def zeros(n: int) -> "Bodies":
        f = jnp.zeros
        return Bodies(
            pos=f((n, 2), jnp.float32) + _parked(n),
            rot=jnp.tile(jnp.array([1.0, 0.0], jnp.float32), (n, 1)),
            vel=f((n, 2), jnp.float32),
            angvel=f((n,), jnp.float32),
            dvel=f((n, 2), jnp.float32),
            dangvel=f((n,), jnp.float32),
            inv_mass=f((n,), jnp.float32),
            inv_inertia=f((n,), jnp.float32),
            half_extent=jnp.ones((n, 2), jnp.float32),
            friction=f((n,), jnp.float32),
            restitution=f((n,), jnp.float32),
            active=jnp.zeros((n,), bool),
        )


def _parked(n: int):
    """Park inactive slots at distinct far-away x positions so inactive
    AABBs never overlap anything (including each other)."""
    x = np.arange(n, dtype=np.float32) * 16.0 + 1.0e7
    return jnp.stack([jnp.asarray(x), jnp.zeros(n, jnp.float32)], axis=-1)


@_pytree_dataclass
class ContactCache:
    """Persistent per-pair contact state for warm starting (SURVEY.md §2 C5).

    One entry per body pair ``(i, j)`` with ``i < j``, holding the feature
    ids and accumulated impulses of up to two manifold points.  Entries are
    kept sorted lexicographically by ``(i, j)`` with free slots at
    ``(EMPTY, EMPTY)``, so the per-frame join from the fresh pair list is a
    fixed-depth vectorized binary search entirely on device
    (BASELINE.json:5 "contact caching ... fully on TPU").

    Two int32 key columns (instead of one fused ``i*N+j`` key) keep the
    scheme correct at 100k+ bodies without 64-bit integers.
    """

    pi: jax.Array            # (P,) int32 first body index, sorted lex
    pj: jax.Array            # (P,) int32 second body index
    fid: jax.Array           # (P, 2) int32 feature id per cached point, -1 = none
    normal_impulse: jax.Array    # (P, 2) f32 accumulated normal impulses
    friction_impulse: jax.Array  # (P, 2) f32 accumulated friction impulses

    EMPTY = np.int32(2**31 - 1)

    @property
    def capacity(self) -> int:
        return self.pi.shape[-1]

    @staticmethod
    def empty(p: int) -> "ContactCache":
        return ContactCache(
            pi=jnp.full((p,), ContactCache.EMPTY, jnp.int32),
            pj=jnp.full((p,), ContactCache.EMPTY, jnp.int32),
            fid=jnp.full((p, 2), -1, jnp.int32),
            normal_impulse=jnp.zeros((p, 2), jnp.float32),
            friction_impulse=jnp.zeros((p, 2), jnp.float32),
        )


@_pytree_dataclass
class SolverStats:
    """Per-step observability counters (SURVEY.md §5.5), produced on device
    and only fetched when the caller asks — never a forced sync."""

    num_pairs: jax.Array          # () int32 candidate pairs emitted
    num_contacts: jax.Array       # () int32 live contact points
    pair_overflow: jax.Array      # () int32 aggregate: sum of ovf_* below
    max_penetration: jax.Array    # () f32
    residual: jax.Array           # () f32 final velocity-pass max impulse delta
    # () int32: bodies whose x-interval could reach a neighbor shard's
    # UNEXPORTED bodies in spatial sharding (parallel/spatial.py) — the
    # halo-budget analog of pair_overflow.  Always 0 single-device.
    halo_overflow: jax.Array
    # --- per-cause pair_overflow breakdown (round 4, VERDICT r3 #3:
    # "45k of WHAT?" — an aggregate counter cannot say which budget to
    # grow).  Each is a () int32; pair_overflow is their sum. ---
    ovf_window: jax.Array   # sweeps still x-open at the window end
    #                         (grow cfg.sap_window / tile_halo)
    ovf_slots: jax.Array    # per-body hit-slot spill in sap_grid
    #                         (grow cfg.sap_hits)
    ovf_drop: jax.Array     # pair-buffer drops: candidates past max_pairs
    #                         (grow cfg.max_pairs)
    ovf_band: jax.Array     # banded-sweep geometry: AABBs crossing a band
    #                         boundary, segsort out-of-home drifters or
    #                         active tail rows (fix the band layout)
    ovf_slab: jax.Array     # tiled-solver slab-halo clamps
    #                         (grow cfg.tile_halo)

    @staticmethod
    def zeros() -> "SolverStats":
        z32 = jnp.zeros((), jnp.int32)
        zf = jnp.zeros((), jnp.float32)
        return SolverStats(z32, z32, z32, zf, zf, z32,
                           z32, z32, z32, z32, z32)


@_pytree_dataclass
class State:
    """Full simulation state: bodies + user joints + contact cache + stats.

    This is the pytree that the jitted ``step`` maps to itself; checkpoint /
    resume is serializing this pytree (SURVEY.md §5.4).
    """

    bodies: Bodies
    joints: "Joints"
    cache: ContactCache
    stats: SolverStats

    @staticmethod
    def zeros(max_bodies: int, max_pairs: int, max_joints: int = 0
              ) -> "State":
        from phyx_tpu.joints import Joints
        return State(
            bodies=Bodies.zeros(max_bodies),
            joints=Joints.empty(max_joints),
            cache=ContactCache.empty(max_pairs),
            stats=SolverStats.zeros(),
        )
