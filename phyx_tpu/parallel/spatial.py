"""Spatial domain decomposition of ONE scene across a device mesh.

The scaling-ladder stretch goal (SURVEY.md §5.7/§5.8, VERDICT r1 aux #7):
a single huge scene is partitioned into x-bands, one band per device, and
stepped with ``jax.shard_map`` — each device runs the UNMODIFIED
single-chip ``step()`` on its local slice, and the only cross-device
traffic is a halo exchange of boundary bodies over ``jax.lax.ppermute``
(ICI neighbor links on a real TPU mesh; the ring/context-parallel analog
the survey prescribes).

Decomposition scheme
--------------------
Per-shard local body table (capacity ``L = S + H + M + H``):

    [ statics (S) | halo_L (H) | owned dynamics (M) | halo_R (H) ]

* **Statics are replicated** on every shard.  They never move (the
  engine integrates only ``inv_mass > 0`` bodies), so a scene-wide
  ground/walls need no communication and no ownership.
* **Ownership is static** for the lifetime of the sharding: dynamic
  bodies are x-sorted at ``shard_spatial`` time and dealt to shards in
  contiguous rank chunks.  A body that later drifts across a cut is
  still owned (and integrated) by its original shard — correctness does
  not depend on residency, only on the halo covering the cut (below).
  Call ``rebalance`` between rollout chunks to re-deal by current x
  (host-side, cheap, the production re-shard cadence).
* **The halo is selected dynamically every step**: each shard exports
  its H lowest-x and H highest-x owned bodies (by CURRENT position) to
  its left/right neighbor, so boundary coverage tracks the actual
  motion.  Exported rows are ordered by owner slot id, which keeps halo
  slot contents stable across steps while the edge SET is stable — so
  the local contact cache keeps warm-starting cut contacts.

Physics semantics (documented, tested to convergence-level parity):
interior contacts run the exact serial Gauss-Seidel of the single-chip
engine.  A contact that spans a cut exists on BOTH neighboring shards
(each sees the partner as a read-only halo copy) and is solved
independently by each — additive-Schwarz coupling: within-band
Gauss-Seidel, Jacobi-like relaxation across cuts, converging at the
boundary at the residual scale of the iteration count.  Momentum error
at a cut is bounded by the difference of the two shards' computed
impulses for the shared contact (same prepared rows, same warm start;
they differ only through ordering of the surrounding sweep).

User joints (v2): joint-CONNECTED COMPONENTS are dealt to shards as
indivisible units (union-find over dynamic endpoints at shard time), so
no joint ever spans a cut — every joint solves with the exact local
Gauss-Seidel semantics; only contacts use the additive-Schwarz halo.
Joints anchored to statics are free (statics are replicated).  The
per-shard slot budget gets ``largest_component - 1`` slack, which makes
the in-x-order first-fit deal always succeed while keeping the balance
within 2x; a component larger than one shard's FAIR SHARE
(``ceil(dynamics / D)``) is rejected (route such structures through the
mega-scene path).

Requirements / limits:
* interactions must not span more than one cut (halo reaches one
  neighbor); band width >> interaction diameter;
* more than ``H`` bodies interacting across one cut overflows the halo;
  a cut pair neither side exported is lost, exactly like an undersized
  ``sap_window`` drops pairs — but COUNTED (round 3): every step each
  shard checks whether any of its unexported bodies' x-intervals reach a
  neighbor's unexported bodies and psums the count into
  ``stats.halo_overflow``.  0 means no physics was lost to halo sizing;
  nonzero means grow H (``suggest_halo``) and re-shard/``rebalance``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from phyx_tpu.config import SimConfig
from phyx_tpu.step import step
from phyx_tpu.types import Bodies, ContactCache, SolverStats, State, _parked


class SpatialDims(NamedTuple):
    """Static layout of the per-shard body table (hashable jit-static)."""
    D: int   # number of shards (mesh axis size)
    S: int   # replicated static slots
    H: int   # halo capacity per side
    M: int   # owned dynamic slots per shard


@dataclasses.dataclass(frozen=True)
class SpatialMeta:
    """Host-side bookkeeping to map shard-local rows back to global ids."""
    dims: SpatialDims
    static_ids: np.ndarray   # (S,) global body ids of replicated statics
    owned_ids: np.ndarray    # (D, M) global body ids, -1 = padding
    capacity: int            # original global body capacity
    # user joints (v2): global joint index per shard-local joint slot
    owned_joint_ids: Optional[np.ndarray] = None   # (D, Jloc), -1 = pad
    joint_capacity: int = 0  # original global joint capacity


def suggest_halo(state: State, n_shards: int, margin: float = 2.0) -> int:
    """Halo sizing from scene statistics (like suggest_sap_window): the
    max number of dynamic bodies within one interaction diameter of any
    equal-count x-cut, times ``margin``, rounded up to a multiple of 8."""
    pos = np.asarray(state.bodies.pos)
    he = np.asarray(state.bodies.half_extent)
    act = np.asarray(state.bodies.active)
    dyn = act & (np.asarray(state.bodies.inv_mass) > 0.0)
    x = np.sort(pos[dyn, 0])
    if x.size == 0 or n_shards < 2:
        return 8
    diam = 4.0 * float(he[dyn].max())
    cuts = [x[min((k * x.size) // n_shards, x.size - 1)]
            for k in range(1, n_shards)]
    worst = max(int(((x > c - diam) & (x < c + diam)).sum()) for c in cuts)
    return max(8, int(-(-worst * margin // 8) * 8))


def shard_spatial(state: State, cfg: SimConfig, n_shards: int,
                  halo: int, max_pairs_per_shard: Optional[int] = None,
                  ) -> Tuple[State, SimConfig, SpatialMeta]:
    """Partition ``state`` into ``n_shards`` x-bands (host-side).

    Returns ``(sstate, local_cfg, meta)`` where every leaf of ``sstate``
    carries a leading shard axis of size D, and ``local_cfg`` is the
    per-shard SimConfig (smaller capacities) to pass to
    ``spatial_rollout``.  The contact caches start empty; warm starts
    rebuild within a frame.

    User joints: joint-connected components are dealt as indivisible
    units so every joint is shard-local (module docstring); a component
    wider than one shard's slot budget raises ``ValueError``."""
    D, H = int(n_shards), int(halo)
    b = state.bodies
    arrs = {f.name: np.asarray(getattr(b, f.name))
            for f in dataclasses.fields(b)}
    act = arrs["active"]
    static_mask = act & (arrs["inv_mass"] == 0.0) & (arrs["inv_inertia"] == 0.0)
    dyn_mask = act & ~static_mask
    static_ids = np.nonzero(static_mask)[0]
    dyn_ids = np.nonzero(dyn_mask)[0]
    dyn_ids = dyn_ids[np.argsort(arrs["pos"][dyn_ids, 0], kind="stable")]
    S = int(static_ids.size)

    # --- user joints: union-find over dynamic endpoints (host-side) ---
    jarrs = None
    live_j = np.zeros((0,), np.int64)
    if state.joints.capacity:
        jarrs = {f.name: np.asarray(getattr(state.joints, f.name))
                 for f in dataclasses.fields(state.joints)}
        live_j = np.nonzero(jarrs["kind"] != 0)[0]
    parent = np.arange(b.capacity, dtype=np.int64)

    def find(i):
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:      # path compression
            parent[i], i = root, parent[i]
        return root

    for j in live_j:
        e1, e2 = int(jarrs["b1"][j]), int(jarrs["b2"][j])
        if dyn_mask[e1] and dyn_mask[e2]:
            parent[find(e1)] = find(e2)

    # units (components + singletons) in mean-x order, dealt first-fit
    from collections import defaultdict
    groups = defaultdict(list)
    for gid in dyn_ids:               # x-sorted: members stay x-sorted
        groups[find(gid)].append(int(gid))
    units = sorted(groups.values(),
                   key=lambda ids: float(arrs["pos"][ids, 0].mean()))
    maxu = max((len(u) for u in units), default=1)
    base_m = max(8, -(-int(dyn_ids.size) // D))
    if maxu > base_m:
        raise ValueError(
            f"joint-connected component of {maxu} bodies exceeds one "
            f"shard's fair share ({base_m} slots at {D} shards); use "
            f"fewer shards or the mega-scene path")
    # first-fit in x order always succeeds with maxu-1 slack per shard
    M = base_m + (maxu - 1)
    owned = np.full((D, M), -1, np.int64)
    body_shard = {}
    d, fill = 0, 0
    for u in units:
        if fill + len(u) > M:
            d, fill = d + 1, 0
        assert d < D, "first-fit deal overflowed (cannot happen: slack)"
        owned[d, fill:fill + len(u)] = u
        for gid in u:
            body_shard[gid] = d
        fill += len(u)
    dims = SpatialDims(D=D, S=S, H=H, M=M)
    L = S + 2 * H + M
    park = np.asarray(_parked(L))

    def shard_leaf(name: str, x: np.ndarray) -> np.ndarray:
        out = np.zeros((D, L) + x.shape[1:], x.dtype)
        if name == "pos":
            out[:] = park[None]
        if name == "rot":
            out[..., 0] = 1.0
        if name == "half_extent":
            out[:] = 1.0
        for d in range(D):
            out[d, :S] = x[static_ids]
            ids = owned[d]
            ok = ids >= 0
            out[d, S + H:S + H + M][ok] = x[ids[ok]]
        return out

    bodies = Bodies(**{k: jnp.asarray(shard_leaf(k, v))
                       for k, v in arrs.items()})
    if max_pairs_per_shard is None:
        max_pairs_per_shard = max(256, -(-cfg.max_pairs // D))

    # --- per-shard joint tables: both endpoints resolve locally ---
    from phyx_tpu.joints import Joints
    owned_joints = None
    jloc = 0
    if live_j.size:
        static_local = {int(g): i for i, g in enumerate(static_ids)}
        local_slot = [dict(static_local) for _ in range(D)]
        for d in range(D):
            for s_, gid in enumerate(owned[d]):
                if gid >= 0:
                    local_slot[d][int(gid)] = S + H + s_
        per_shard = [[] for _ in range(D)]
        for j in live_j:
            e1, e2 = int(jarrs["b1"][j]), int(jarrs["b2"][j])
            d1 = body_shard.get(e1)
            d2 = body_shard.get(e2)
            if d1 is not None and d2 is not None and d1 != d2:
                raise AssertionError(
                    "joint endpoints dealt to different shards "
                    "(cannot happen: union-find)")
            per_shard[d1 if d1 is not None else
                      (d2 if d2 is not None else 0)].append(int(j))
        jloc = max(8, max(len(p) for p in per_shard))
        owned_joints = np.full((D, jloc), -1, np.int64)
        for d in range(D):
            owned_joints[d, :len(per_shard[d])] = per_shard[d]

        def shard_joint_leaf(name: str, x: np.ndarray) -> np.ndarray:
            out = np.zeros((D, jloc) + x.shape[1:], x.dtype)
            for d in range(D):
                for slot, j in enumerate(owned_joints[d]):
                    if j < 0:
                        continue
                    v = x[j]
                    if name in ("b1", "b2"):
                        v = local_slot[d][int(v)]
                    out[d, slot] = v
            return out

        joints = Joints(**{f.name: jnp.asarray(
            shard_joint_leaf(f.name, jarrs[f.name]))
            for f in dataclasses.fields(state.joints)})
    else:
        joints = jax.tree.map(lambda x: jnp.broadcast_to(x, (D,) + x.shape),
                              Joints.empty(0))

    local_cfg = dataclasses.replace(
        cfg, max_bodies=L, max_pairs=int(max_pairs_per_shard),
        max_joints=jloc)
    one = State(bodies=bodies,  # leading D axis on every leaf
                joints=joints,
                cache=jax.tree.map(
                    lambda x: jnp.broadcast_to(x, (D,) + x.shape),
                    ContactCache.empty(int(max_pairs_per_shard))),
                stats=jax.tree.map(
                    lambda x: jnp.broadcast_to(x, (D,) + x.shape),
                    SolverStats.zeros()))
    meta = SpatialMeta(dims=dims, static_ids=static_ids, owned_ids=owned,
                       capacity=b.capacity, owned_joint_ids=owned_joints,
                       joint_capacity=state.joints.capacity)
    return one, local_cfg, meta


def _exchange_halo(b: Bodies, dims: SpatialDims, axis: str) -> Bodies:
    """Refresh halo slots from both neighbors (shard-local view).

    Exports each side's H extreme-x owned bodies (slot-id-ordered for
    cache stability) over ``lax.ppermute``; missing neighbors (mesh
    edges) deliver zero rows, which are re-parked as inactive.

    Cache caveat: slot stability holds only while the exported edge SET
    is stable.  The frame the set changes, a halo slot can hold a
    DIFFERENT body while the shard-local contact cache still joins on
    (owner-slot, halo-slot) local ids — a cut contact whose feature ids
    coincide then warm-starts from the previous occupant's impulse for
    that one frame.  This is bounded (one frame, one impulse magnitude,
    clamped by the normal/friction limiters like any stale warm start
    after body motion) and self-corrects as the solve re-converges; it
    is the same class of transient as a cache hit on a body that moved
    sharply between frames."""
    D, S, H, M = dims
    own = jax.tree.map(lambda x: x[S + H:S + H + M], b)
    take = min(H, M)          # H > M: export everything + inactive pad

    def edge(ids):
        ids = jnp.sort(ids)   # owner-slot order: stable halo slots
        rows = jax.tree.map(lambda a: a[ids], own)
        if take < H:
            rows = jax.tree.map(
                lambda a: jnp.concatenate(
                    [a, jnp.zeros((H - take,) + a.shape[1:], a.dtype)]),
                rows)
        return rows

    x = jnp.where(own.active, own.pos[:, 0], jnp.inf)
    idx_l = jnp.argsort(x)[:take]
    exp_l = edge(idx_l)
    x = jnp.where(own.active, own.pos[:, 0], -jnp.inf)
    idx_r = jnp.argsort(x)[M - take:]
    exp_r = edge(idx_r)
    fwd = [(i, i + 1) for i in range(D - 1)]
    bwd = [(i + 1, i) for i in range(D - 1)]
    halo_l = jax.tree.map(lambda a: jax.lax.ppermute(a, axis, fwd), exp_r)
    halo_r = jax.tree.map(lambda a: jax.lax.ppermute(a, axis, bwd), exp_l)

    # --- halo-overflow detection (VERDICT r2 #4) ---
    # A cut pair (a on this shard, b on the neighbor) is LOST only when
    # NEITHER body was exported: b ∉ neighbor's edge set (so this shard
    # never sees b) and a ∉ this shard's edge set (so the neighbor never
    # sees a).  Detector: each shard sends the max AABB x-reach of its
    # UNEXPORTED bodies toward each neighbor; the receiver counts its own
    # unexported bodies whose AABB x-interval reaches past that bound.
    # Conservative only in y (an x-overlapping but y-separated pair
    # counts), exactly like the sap window's x-interval semantics.
    from phyx_tpu.broadphase import compute_aabbs
    lo, hi = compute_aabbs(own)
    mark_l = jnp.zeros((M,), bool).at[idx_l].set(True)
    mark_r = jnp.zeros((M,), bool).at[idx_r].set(True)
    un_l = own.active & ~mark_l
    un_r = own.active & ~mark_r
    # my unexported-right max reach -> right neighbor; min reach -> left
    reach_r = jnp.max(jnp.where(un_r, hi[:, 0], -jnp.inf))
    reach_l = jnp.min(jnp.where(un_l, lo[:, 0], jnp.inf))
    flag = jnp.float32(1.0)
    from_left = jax.lax.ppermute(
        jnp.stack([reach_r, flag]), axis, fwd)       # shard 0: zeros
    from_right = jax.lax.ppermute(
        jnp.stack([reach_l, flag]), axis, bwd)       # shard D-1: zeros
    lreach = jnp.where(from_left[1] > 0, from_left[0], -jnp.inf)
    rreach = jnp.where(from_right[1] > 0, from_right[0], jnp.inf)
    halo_ovf = ((un_l & (lo[:, 0] <= lreach)).sum(dtype=jnp.int32)
                + (un_r & (hi[:, 0] >= rreach)).sum(dtype=jnp.int32))

    merged = jax.tree.map(
        lambda stat_own, hl, hr: jnp.concatenate(
            [stat_own[:S], hl, stat_own[S + H:S + H + M], hr], axis=0),
        b, halo_l, halo_r)
    # Re-park rows that arrived inactive (zeros from mesh edges, or
    # genuinely inactive neighbor slots): distinct far-away positions and
    # unit extents so their AABBs can never overlap anything real.
    L = S + 2 * H + M
    alive = merged.active
    return merged.replace(
        pos=jnp.where(alive[:, None], merged.pos, _parked(L)),
        rot=jnp.where(alive[:, None], merged.rot,
                      jnp.array([1.0, 0.0], jnp.float32)),
        half_extent=jnp.where(alive[:, None], merged.half_extent, 1.0),
    ), halo_ovf


@functools.lru_cache(maxsize=None)
def _spatial_rollout_fn(local_cfg: SimConfig, mesh: Mesh, dims: SpatialDims,
                        num_steps: int, axis: str):
    spec = P(axis)

    def local_chunk(st: State) -> State:
        st = jax.tree.map(lambda a: a[0], st)   # drop the size-1 shard dim

        def one(s, _):
            bodies, halo_ovf = _exchange_halo(s.bodies, dims, axis)
            s = s.replace(bodies=bodies,
                          stats=s.stats.replace(halo_overflow=halo_ovf))
            out = step(s, local_cfg)
            return out, None

        out, _ = jax.lax.scan(one, st, None, length=num_steps)
        # Cross-shard stats: counts sum (cut contacts counted on both
        # sides — an upper bound), residual/penetration are maxima.
        stats = SolverStats(
            num_pairs=jax.lax.psum(out.stats.num_pairs, axis),
            num_contacts=jax.lax.psum(out.stats.num_contacts, axis),
            pair_overflow=jax.lax.psum(out.stats.pair_overflow, axis),
            max_penetration=jax.lax.pmax(out.stats.max_penetration, axis),
            residual=jax.lax.pmax(out.stats.residual, axis),
            halo_overflow=jax.lax.psum(out.stats.halo_overflow, axis),
            ovf_window=jax.lax.psum(out.stats.ovf_window, axis),
            ovf_slots=jax.lax.psum(out.stats.ovf_slots, axis),
            ovf_drop=jax.lax.psum(out.stats.ovf_drop, axis),
            ovf_band=jax.lax.psum(out.stats.ovf_band, axis),
            ovf_slab=jax.lax.psum(out.stats.ovf_slab, axis),
        )
        out = out.replace(stats=stats)
        return jax.tree.map(lambda a: a[None], out)

    shmapped = jax.shard_map(local_chunk, mesh=mesh, in_specs=spec,
                             out_specs=spec, check_vma=False)
    return jax.jit(shmapped)


def spatial_rollout(sstate: State, local_cfg: SimConfig, mesh: Mesh,
                    meta: SpatialMeta, num_steps: int,
                    axis: str = "x") -> State:
    """Advance the sharded scene ``num_steps`` frames: one jitted
    ``shard_map`` program, halo exchange + full local step per frame."""
    if mesh.shape[axis] != meta.dims.D:
        raise ValueError(
            f"mesh axis {axis!r} has {mesh.shape[axis]} devices but the "
            f"state was sharded for {meta.dims.D} (on CPU, set XLA_FLAGS="
            f"--xla_force_host_platform_device_count={meta.dims.D} before "
            f"backend init, as tests/conftest.py does)")
    fn = _spatial_rollout_fn(local_cfg, mesh, meta.dims, num_steps, axis)
    return fn(sstate)


def unshard(sstate: State, meta: SpatialMeta, template: State) -> State:
    """Gather owned rows back into a global State (host-side sync).

    ``template`` supplies the original capacity/layout (typically the
    pre-shard state); statics are restored from shard 0's replicas.

    The returned contact cache is EMPTY (like ``shard_spatial``'s
    per-shard caches): the template's cache predates the sharded rollout,
    so carrying it over would warm-start the first post-unshard frame
    from stale impulses for any moved pair whose feature ids still match.
    One frame of warm-start rebuild is the exact, cheap alternative."""
    dims = meta.dims
    D, S, H, M = dims
    out = {f.name: np.asarray(getattr(template.bodies, f.name)).copy()
           for f in dataclasses.fields(template.bodies)}
    for name in out:
        sh = np.asarray(getattr(sstate.bodies, name))
        if S:
            out[name][meta.static_ids] = sh[0, :S]
        for d in range(D):
            ids = meta.owned_ids[d]
            ok = ids >= 0
            out[name][ids[ok]] = sh[d, S + H:S + H + M][ok]
    stats = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)[0]),
                         sstate.stats)
    joints = template.joints
    if (meta.owned_joint_ids is not None and meta.joint_capacity
            and joints.capacity):
        acc = np.asarray(template.joints.accum).copy()
        sh = np.asarray(sstate.joints.accum)          # (D, Jloc, 2)
        for d in range(D):
            ids = meta.owned_joint_ids[d]
            ok = ids >= 0
            acc[ids[ok]] = sh[d][ok]
        joints = template.joints.replace(accum=jnp.asarray(acc))
    return State(bodies=Bodies(**{k: jnp.asarray(v)
                                  for k, v in out.items()}),
                 joints=joints,
                 cache=ContactCache.empty(template.cache.pi.shape[0]),
                 stats=stats)


def rebalance(sstate: State, meta: SpatialMeta, template: State,
              cfg: SimConfig, halo: Optional[int] = None,
              max_pairs_per_shard: Optional[int] = None,
              ) -> Tuple[State, SimConfig, SpatialMeta]:
    """Re-deal ownership by current x (host-side, between rollout chunks).

    Keeps the same shard count; pass a new ``halo`` to resize coverage.
    Contact caches restart empty (one frame of warm-start loss)."""
    dims = meta.dims
    global_state = unshard(sstate, meta, template)
    return shard_spatial(global_state, cfg, dims.D,
                         dims.H if halo is None else halo,
                         max_pairs_per_shard=max_pairs_per_shard)
