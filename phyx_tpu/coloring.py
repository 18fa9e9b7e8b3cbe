"""On-device contact-graph coloring.

The reference packs constraints into SIMD blocks such that no body appears
twice within a block, enabling conflict-free gather/scatter and preserving
Gauss-Seidel convergence across blocks (SURVEY.md §2 C7, BASELINE.json:5
"graph-colored").  The TPU analog: assign every contact a color such that
within a color no *dynamic* body repeats; the solver sweeps colors
sequentially (Gauss-Seidel across colors) and processes each color as one
vectorized batch (the SIMD-lane analog).  Static bodies (inv_mass == 0)
never receive impulses, so they impose no conflicts — without this a ground
body touching hundreds of boxes would force hundreds of colors.

The coloring itself runs fully on device, inside the jitted step — no host
round-trips (SURVEY.md §7 hard part #6).  Each round is a deterministic
maximal-matching step: every still-uncolored contact whose index is the
minimum uncolored index on BOTH of its dynamic bodies wins the current
color (two scatter-min passes).  After ``num_colors - 1`` rounds, leftover
contacts (only when a dynamic body carries more contacts than colors) fall
into the final class, which the solver treats as a Jacobi batch via
scatter-add — deterministic and stable, slightly slower convergence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from phyx_tpu.config import SimConfig
from phyx_tpu.narrowphase import Contacts

# numpy, not jnp: a module-level jnp scalar would initialize the
# device backend at IMPORT time (hangs when the TPU worker is
# down, and defeats late jax_platforms pins — CLAUDE.md rule 7)
BIG = np.int32(2**31 - 1)


def color_rows(row_b1: jax.Array, row_b2: jax.Array, valid: jax.Array,
               body_static: jax.Array, num_colors: int) -> jax.Array:
    """Color arbitrary two-body constraint rows (contacts OR user joints):
    within colors 0..num_colors-2 no dynamic body repeats; leftovers land
    in the final class (Jacobi, scatter-add).  Returns (R,) int32 colors.

    ``body_static``: (N,) bool, True where the body cannot move.
    """
    C = valid.shape[0]
    # Priority packing below keeps idx in the low 20 bits; at C >= 2^20 idx
    # would bleed into the hash bits, priorities would lose uniqueness, and
    # two rows sharing a body could win the same color (ADVICE r1 #2).
    # C is a static capacity, so this is a trace-time check.
    assert C < 2 ** 20, (
        f"row capacity {C} >= 2^20 breaks the coloring priority packing; "
        "the XLA backend caps row capacity at 2^20 - 1 (use the Pallas "
        "backends beyond that)")
    n = body_static.shape[0]
    idx = jnp.arange(C, dtype=jnp.int32)
    s1 = body_static[row_b1]
    s2 = body_static[row_b2]
    # static endpoints scatter to a dropped dummy slot and always "win"
    b1 = jnp.where(s1, n, row_b1)
    b2 = jnp.where(s2, n, row_b2)
    last = jnp.int32(num_colors - 1)

    def round_fn(c, state):
        color, remaining = state
        # Luby-style per-round pseudo-random priority: a fixed priority
        # (plain idx) serializes along chains in the contact ordering and
        # can leave stragglers even when max degree << num_colors.  Mixing
        # the round into the high bits breaks chains; keeping idx in the
        # low bits keeps priorities unique (ties on a shared body would
        # let two contacts win at once).
        h = (idx.astype(jnp.uint32) * jnp.uint32(2654435761)
             + (c + 1).astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
        h = h ^ (h >> 15)
        pri = ((h << 20) & jnp.uint32(0x7FF00000)).astype(jnp.int32) | idx
        pri = jnp.where(remaining, pri, BIG)
        # single per-body min over BOTH endpoints (a body reached via b1 of
        # one contact and b2 of another is still one body)
        best = jnp.full((n,), BIG, jnp.int32) \
            .at[b1].min(pri, mode="drop") \
            .at[b2].min(pri, mode="drop")
        win = remaining & (s1 | (pri == best[jnp.minimum(b1, n - 1)])) \
                        & (s2 | (pri == best[jnp.minimum(b2, n - 1)]))
        color = jnp.where(win, c, color)
        remaining = remaining & ~win
        return color, remaining

    color0 = jnp.full((C,), last, jnp.int32)
    color, _ = jax.lax.fori_loop(
        0, num_colors - 1, round_fn, (color0, valid))
    return jnp.where(valid, color, last)


def color_contacts(contacts: Contacts, body_static: jax.Array,
                   cfg: SimConfig) -> Contacts:
    """Assign colors 0..num_colors-1; the last class may contain conflicts."""
    color = color_rows(contacts.b1, contacts.b2, contacts.valid,
                       body_static, cfg.num_colors)
    return contacts.replace(color=color)


def check_coloring(contacts: Contacts, body_static: jax.Array,
                   cfg: SimConfig) -> jax.Array:
    """Debug assertion pass (SURVEY.md §5.2): number of dynamic-body-slot
    conflicts in non-final color classes.  0 = conflict-free Gauss-Seidel."""
    n = body_static.shape[0]
    s1 = body_static[contacts.b1]
    s2 = body_static[contacts.b2]
    conflicts = jnp.int32(0)
    for c in range(cfg.num_colors - 1):
        m = contacts.valid & (contacts.color == c)
        cnt = jnp.zeros((n,), jnp.int32)
        cnt = cnt.at[jnp.where(m & ~s1, contacts.b1, n)].add(1, mode="drop")
        cnt = cnt.at[jnp.where(m & ~s2, contacts.b2, n)].add(1, mode="drop")
        conflicts = conflicts + (cnt > 1).sum(dtype=jnp.int32)
    return conflicts
