"""Shared slab-tiling geometry: the broadphase's slab-major finalize and
the tiled solver must agree on every routing decision (slab assignment,
embedded rows, zero-block remaps), so the logic lives here once.

Slab layout (SURVEY.md §5.8 domain decomposition, TPU-native form):
bodies sorted by (banded) x-rank are embedded into ``n_slabs`` windows
of ``tile_stride`` rows each plus a ``tile_halo`` overlap; every slab
window starts with a 128-row zero block that statics at rest are
remapped to, so a scene-wide ground never forces a giant window
(solver.py round-2 design, relocated round 5)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from phyx_tpu.config import SimConfig
from phyx_tpu.types import Bodies


def slab_dims(cfg: SimConfig, n: int) -> Tuple[int, int, int, int, int, int]:
    """(K, H, W, rps, n_slabs, npad) of the SOLVER's slab embedding:
    stride K rows per slab (128-row zero block + rps real bodies),
    window W = K + halo rows."""
    K = cfg.tile_stride
    H = cfg.tile_halo
    W = K + H
    rps = K - 128
    n_slabs = -(-n // rps)
    npad = n_slabs * K + H
    return K, H, W, rps, n_slabs, npad


def resolve_tiled(cfg: SimConfig, n_bodies: int, c_cap: int) -> bool:
    """Static mirror of step.solve_stage's backend choice: True iff this
    config runs the TILED Pallas solver.  Joint capacity does not enter:
    the streamed-vs-tiled branch hinges only on the body table, and when
    the body table exceeds the streamed budget the fused kernel (whose
    SMEM holds 2x the body table) cannot fit either."""
    from phyx_tpu import solver
    from phyx_tpu.kernels.contact_solver_streamed import BLK
    if c_cap % BLK or c_cap < 2 * BLK:
        return False
    if cfg.solver_backend == "pallas_tiled":
        return True
    return (cfg.solver_backend == "pallas"
            and solver.pallas_streamed_smem_bytes(n_bodies)
            > solver.PALLAS_SMEM_BUDGET)


def zero_safe_mask(bodies: Bodies) -> jax.Array:
    """Bodies whose embedded row literally EQUALS the zero row (zero
    velocity/angvel AND both inverse masses zero) — only these may be
    remapped to a slab's zero block.  A kinematic static (inv_mass 0,
    velocity set) contributes real motion to relative-velocity terms and
    must keep its actual row (ADVICE r1 #1)."""
    return ((bodies.inv_mass == 0.0) & (bodies.inv_inertia == 0.0)
            & jnp.all(bodies.vel == 0.0, axis=1) & (bodies.angvel == 0.0))


def pz_table(rank: jax.Array, zero_safe: jax.Array,
             cfg: SimConfig, n: int) -> jax.Array:
    """Packed per-body lookup: embedded row * 2 + zero-remap flag.  The
    two routed quantities ride ONE gather (npad*2 < 2^31)."""
    K, _, _, rps, _, _ = slab_dims(cfg, n)
    pos = (rank // rps) * K + 128 + rank % rps
    return pos * 2 + zero_safe.astype(jnp.int32)


def route_pairs(pz_tab: jax.Array, eb1: jax.Array, eb2: jax.Array,
                cfg: SimConfig, n: int):
    """Slab assignment + clamped embedded endpoint rows for body-id pair
    endpoints (any shape).  Same decision procedure as the round-4
    solver's route_endpoints: the slab is chosen by the minimum
    NON-zero-safe embedded row, zero-safe partners remap to that slab's
    zero block, and both rows are clamped into the slab window (the
    caller counts ``~in_win`` rows as ovf_slab).

    EMPTY ids must be pre-clamped by the caller (results on dead rows
    are don't-cares).  Returns (lb1, lb2, slab, in_win) with lb* as
    ABSOLUTE embedded rows."""
    K, _, W, _, n_slabs, _ = slab_dims(cfg, n)
    z1 = pz_tab[eb1]
    z2 = pz_tab[eb2]
    b1p = z1 >> 1
    b2p = z2 >> 1
    st1 = (z1 & 1) == 1
    st2 = (z2 & 1) == 1
    dyn_min = jnp.where(st1, b2p,
                        jnp.where(st2, b1p, jnp.minimum(b1p, b2p)))
    slab = jnp.clip(dyn_min // K, 0, n_slabs - 1)
    zero_row = slab * K
    lb1 = jnp.where(st1, zero_row, b1p)
    lb2 = jnp.where(st2, zero_row, b2p)
    lo, hi = slab * K, slab * K + W
    in_win = (lb1 >= lo) & (lb1 < hi) & (lb2 >= lo) & (lb2 < hi)
    lb1 = jnp.clip(lb1, lo, hi - 1)
    lb2 = jnp.clip(lb2, lo, hi - 1)
    return lb1, lb2, slab, in_win


def routing_bits_ok(n: int, n_slabs: int) -> bool:
    """Can (slab, pi) pack into one int32 sort key below the EMPTY
    sentinel?  (True for every shipping capacity: 1M bodies x 64 slabs
    = 26 bits.)"""
    bits = max(1, (n - 1).bit_length())
    sbits = max(1, (n_slabs - 1).bit_length())
    return sbits + bits <= 30
