"""Sweep-and-prune pair emission kernel.

The reference's broadphase scans sorted x-intervals and appends overlapping
pairs to a dynamic list (SURVEY.md §3.5) — the #1 static-shape challenge on
TPU.  The pure-XLA route (fixed neighbor window + cumsum compaction +
lex sort of the w*n candidate grid) pays for a huge sort and serial
scatters; this kernel does instead exactly what the C++ loop does, as a
Mosaic scalar sweep in SMEM with a running append counter — static output
shape, dynamic trip counts, overflow *counted* not dropped.

Emission order is the sweep order (sorted by AABB min-x); the caller
lex-sorts the (pi, pj) buffer (a max_pairs-sized sort, ~25x smaller than
sorting the candidate grid) so the cache join stays a deterministic merge.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phyx_tpu.types import ContactCache

EMPTY = ContactCache.EMPTY


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("max_pairs",))
def sweep_emit(aabb_flat: jax.Array,   # (N*4,) f32 [lox, loy, hix, hiy]
               order: jax.Array,       # (N,) int32 sorted by lox
               dyn: jax.Array,         # (N,) int32 1 = dynamic
               nact: jax.Array,        # () int32 active body count
               max_pairs: int,
               ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (pi, pj, num, overflow); pi/pj EMPTY beyond num."""
    n = order.shape[0]

    def kern(nact_ref, order_ref, aabb_ref, dyn_ref,
             pi_ref, pj_ref, cnt_ref, ovf_ref):
        na = nact_ref[0]

        def fill(k, _):
            pi_ref[k] = EMPTY
            pj_ref[k] = EMPTY
            return 0
        jax.lax.fori_loop(0, max_pairs, fill, 0)

        def outer(si, carry):
            cnt, ovf = carry
            i = order_ref[si]
            hix = aabb_ref[i * 4 + 2]
            loy = aabb_ref[i * 4 + 1]
            hiy = aabb_ref[i * 4 + 3]
            di = dyn_ref[i]

            def cond(state):
                sj, cnt, ovf = state
                return jnp.logical_and(
                    sj < na, aabb_ref[order_ref[sj] * 4] <= hix)

            def body(state):
                sj, cnt, ovf = state
                j = order_ref[sj]
                ok = jnp.logical_and(
                    jnp.logical_and(aabb_ref[j * 4 + 1] <= hiy,
                                    loy <= aabb_ref[j * 4 + 3]),
                    (di + dyn_ref[j]) > 0)
                fits = jnp.logical_and(ok, cnt < max_pairs)

                @pl.when(fits)
                def _():
                    pi_ref[cnt] = jnp.minimum(i, j)
                    pj_ref[cnt] = jnp.maximum(i, j)

                cnt = cnt + jnp.where(fits, 1, 0)
                ovf = ovf + jnp.where(jnp.logical_and(ok, ~fits), 1, 0)
                return sj + 1, cnt, ovf

            _, cnt, ovf = jax.lax.while_loop(cond, body, (si + 1, cnt, ovf))
            return cnt, ovf

        cnt, ovf = jax.lax.fori_loop(0, na, outer, (jnp.int32(0),
                                                    jnp.int32(0)))
        cnt_ref[0] = cnt
        ovf_ref[0] = ovf

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    pi, pj, cnt, ovf = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((max_pairs,), jnp.int32),
            jax.ShapeDtypeStruct((max_pairs,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        in_specs=[smem] * 4,
        out_specs=(smem,) * 4,
        interpret=_use_interpret(),
    )(jnp.reshape(nact.astype(jnp.int32), (1,)), order.astype(jnp.int32),
      aabb_flat, dyn.astype(jnp.int32))
    return pi, pj, cnt[0], ovf[0]
