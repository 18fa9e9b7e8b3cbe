"""Fenced micro-bench: packed single-key sorts vs multi-key lex sorts.

Round-3 decision record for broadphase.lex_sort_pairs and cache.lex_join
key packing: the TPU sort's cost scales with the number of key columns
compared/carried, so (pi, pj) packs into ONE int32 key when
2*ceil(log2(cap)) <= 31 and the join's (a, b, tag) likewise (+1 bit).

Shapes mirror the shipped call sites:
  * pair finalization at the 10k bench shape: 139k-row grid, cap 16384
  * pair finalization at the 20k shape: 278k rows, cap 32768
  * cache join at 10k: (32k + 32k)-row 3-key sort

Timing protocol per BASELINE.md: fenced scalar fetch, chained inputs
(never repeat an identical execution), median of alternating reps.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

EMPTY = np.int32(2**31 - 1)


@jax.jit
def two_key(pi, pj):
    a, b = jax.lax.sort((pi, pj), num_keys=2)
    return a, b, a[0] + b[0]


def make_packed(bits):
    @jax.jit
    def packed(pi, pj):
        e = pi == EMPTY
        key = jnp.where(e, jnp.int32(EMPTY), (pi << bits) | pj)
        ks = jax.lax.sort(key)
        ee = ks == jnp.int32(EMPTY)
        a = jnp.where(ee, EMPTY, ks >> bits)
        b = jnp.where(ee, EMPTY, ks & jnp.int32((1 << bits) - 1))
        return a, b, a[0] + b[0]
    return packed


@jax.jit
def join_3key(a, b, tag, pay):
    a_s, b_s, tag_s, pay_s = jax.lax.sort((a, b, tag, pay), num_keys=3)
    return pay_s, a_s[0] + pay_s[0]


def make_join_packed(bits, pbits):
    @jax.jit
    def jp(a, b, tag, pay):
        pay2 = (tag << pbits) | pay
        e = a == EMPTY
        key = jnp.where(e, jnp.int32(EMPTY), (((a << bits) | b) << 1) | tag)
        ks, pay2_s = jax.lax.sort((key, pay2), num_keys=1)
        return pay2_s, ks[0] + pay2_s[0]
    return jp


def timeit(fn, args, reps=30):
    out = fn(*args)
    float(out[-1])                    # fence (scalar fetch)
    ts = []
    for r in range(reps):
        # chain: perturb input from previous output so no two executions
        # are identical (results can short-circuit on this stack)
        args = (args[0] ^ (r & 1), *args[1:])
        t0 = time.perf_counter()
        out = fn(*args)
        float(out[-1])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def pair_shape(n, cap, frac, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, cap, n).astype(np.int32)
    b = rng.integers(0, cap, n).astype(np.int32)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    v = rng.random(n) < frac
    return (jnp.array(np.where(v, lo, EMPTY)),
            jnp.array(np.where(v, hi, EMPTY)))


def main():
    for label, n, cap, frac in [("10k finalize", 139264, 16384, 0.23),
                                ("20k finalize", 278528, 32768, 0.3),
                                ("mega-slice 1M", 1 << 20, 16384, 0.3)]:
        pi, pj = pair_shape(n, cap, frac, 1)
        bits = int(cap - 1).bit_length()
        t2 = timeit(two_key, (pi, pj))
        t1 = timeit(make_packed(bits), (pi, pj))
        print(f"{label}: 2-key {t2:.3f} ms  packed {t1:.3f} ms")

    # cache join first sort at the 10k shape
    n = 32768
    ka, kb = pair_shape(n, 16384, 0.85, 2)
    qa, qb = pair_shape(n, 16384, 0.85, 3)
    a = jnp.concatenate([ka, qa])
    b = jnp.concatenate([kb, qb])
    tag = jnp.concatenate([jnp.zeros(n, jnp.int32), jnp.ones(n, jnp.int32)])
    pay = jnp.concatenate([jnp.arange(n, dtype=jnp.int32)] * 2)
    t3 = timeit(join_3key, (a, b, tag, pay))
    t1 = timeit(make_join_packed(14, 16), (a, b, tag, pay))
    print(f"join 64k rows: 3-key {t3:.3f} ms  packed {t1:.3f} ms")


if __name__ == "__main__":
    main()
