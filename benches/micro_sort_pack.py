"""Fenced micro-bench: packed single-key sorts vs multi-key lex sorts.

Round-3 decision record for broadphase.lex_sort_pairs and cache.lex_join
key packing: the TPU sort's cost scales with the number of key columns
compared/carried, so (pi, pj) packs into ONE int32 key when
2*ceil(log2(cap)) <= 31 and the join's (a, b, tag) likewise (+1 bit).

Shapes mirror the shipped call sites:
  * pair finalization at the 10k bench shape: 139k-row grid, cap 16384
  * pair finalization at the 20k shape: 278k rows, cap 32768
  * cache join at 10k: (32k + 32k)-row 3-key sort

Protocol (BASELINE.md measurement integrity): reps are CHAINED INSIDE ONE
jitted lax.scan (inputs derived per-iteration from a folded key, output
folded into the carry) so the ~20-25 ms per-dispatch tunnel overhead is
amortized across all reps instead of swamping sub-ms sorts — the first
version of this bench timed one dispatch per rep and read ~25 ms for
EVERY variant (fixed overhead, not sort cost; re-done 2026-08-18).
An input-generation-only baseline is subtracted.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

EMPTY = np.int32(2**31 - 1)


def make_pairs(key, n, cap, frac):
    ka, kb, kv = jax.random.split(key, 3)
    a = jax.random.randint(ka, (n,), 0, cap, jnp.int32)
    b = jax.random.randint(kb, (n,), 0, cap, jnp.int32)
    lo, hi = jnp.minimum(a, b), jnp.maximum(a, b)
    v = jax.random.uniform(kv, (n,)) < frac
    return jnp.where(v, lo, EMPTY), jnp.where(v, hi, EMPTY)


def two_key(pi, pj):
    a, b = jax.lax.sort((pi, pj), num_keys=2)
    return a[0] + b[0] + a[-1]


def make_packed(bits):
    def packed(pi, pj):
        e = pi == EMPTY
        key = jnp.where(e, jnp.int32(EMPTY), (pi << bits) | pj)
        ks = jax.lax.sort(key)
        ee = ks == jnp.int32(EMPTY)
        a = jnp.where(ee, EMPTY, ks >> bits)
        b = jnp.where(ee, EMPTY, ks & jnp.int32((1 << bits) - 1))
        return a[0] + b[0] + a[-1]
    return packed


def scan_bench(fn, make_args, reps):
    """One jitted program: reps iterations, per-iteration fresh inputs,
    scalar chained through the carry.  Returns ms per iteration."""
    @jax.jit
    def run(key, seed):
        def body(carry, i):
            k, s = carry
            k2 = jax.random.fold_in(k, i)
            out = fn(*make_args(k2))
            return (k, s + out.astype(jnp.float32) * 1e-20 + 1.0), None
        (k, s), _ = jax.lax.scan(
            body, (key, seed), jnp.arange(reps, dtype=jnp.int32))
        return s

    key = jax.random.PRNGKey(0)
    s = run(key, jnp.float32(0.0))
    float(s)                                    # fence (scalar fetch)
    t0 = time.perf_counter()
    s = run(key, s)                             # chained input
    float(s)
    return (time.perf_counter() - t0) / reps * 1e3


def gen_only(*args):
    return args[0][0]


def main():
    from bench import acquire_tpu_lock
    acquire_tpu_lock()
    for label, n, cap, frac, reps in [
            ("10k finalize", 139264, 16384, 0.23, 60),
            ("20k finalize", 278528, 32768, 0.3, 40),
            ("mega-slice 1M", 1 << 20, 16384, 0.3, 20)]:
        bits = int(cap - 1).bit_length()
        mk = lambda k: make_pairs(k, n, cap, frac)
        base = scan_bench(gen_only, mk, reps)
        t2 = scan_bench(two_key, mk, reps)
        t1 = scan_bench(make_packed(bits), mk, reps)
        print(f"{label}: gen {base:.3f}  2-key {t2 - base:.3f} ms  "
              f"packed {t1 - base:.3f} ms")

    # cache join first sort at the 10k shape: (32k+32k) rows, 3 keys + pay
    n = 32768

    def mk_join(k):
        ka, kq, kp = jax.random.split(k, 3)
        a1, b1 = make_pairs(ka, n, 16384, 0.85)
        a2, b2 = make_pairs(kq, n, 16384, 0.85)
        a = jnp.concatenate([a1, a2])
        b = jnp.concatenate([b1, b2])
        tag = jnp.concatenate([jnp.zeros(n, jnp.int32),
                               jnp.ones(n, jnp.int32)])
        pay = jnp.concatenate([jnp.arange(n, dtype=jnp.int32)] * 2)
        return a, b, tag, pay

    def join_3key(a, b, tag, pay):
        a_s, b_s, tag_s, pay_s = jax.lax.sort((a, b, tag, pay), num_keys=3)
        return a_s[0] + pay_s[0] + pay_s[-1]

    def make_join_packed(bits, pbits):
        def jp(a, b, tag, pay):
            pay2 = (tag << pbits) | pay
            e = a == EMPTY
            key = jnp.where(e, jnp.int32(EMPTY),
                            (((a << bits) | b) << 1) | tag)
            ks, pay2_s = jax.lax.sort((key, pay2), num_keys=1)
            return ks[0] + pay2_s[0] + pay2_s[-1]
        return jp

    reps = 60
    base = scan_bench(gen_only, mk_join, reps)
    t3 = scan_bench(join_3key, mk_join, reps)
    t1 = scan_bench(make_join_packed(14, 16), mk_join, reps)
    print(f"join 64k rows: gen {base:.3f}  3-key {t3 - base:.3f} ms  "
          f"packed {t1 - base:.3f} ms")


if __name__ == "__main__":
    main()
