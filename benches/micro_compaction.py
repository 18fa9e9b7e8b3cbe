"""Fenced cost of the solver compaction machinery at 10k-bench shapes.

RECORD (2026-08-17): the "candidate" below measured 2.16 -> 0.64 ms net
and SHIPPED as step.py's packed compaction (one (C, 16) gather + one
scatter un-permute, ids astype'd not bitcast — see CLAUDE.md rule 9a);
this bench documents the decision and re-measures both schemes.

The pre-packing step.py compacted live contacts to the front with
``order = argsort(~valid)`` then permuted EVERY Contacts field (19
arrays) with ``x[order]``, and after the solve inverted the permutation
with a second argsort + two gathers.  Row gathers are row-serialized on
this chip (~12 ns/row, BASELINE.md), so that was ~21 row-ops over
C=65536 rows before the kernel even started.

Candidate (now shipped): pack the 15 solver-needed columns (+2 int id
columns) into ONE (C, 16) matrix, gather once, and un-permute the (C, 2)
accumulator block with one scatter.

Protocol (BASELINE.md measurement integrity): scan-chained inputs (each
iteration's valid mask is derived from the previous output), live-scalar
fence, two scan lengths to cancel dispatch overhead.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

C = 65536          # contact capacity at the 10k bench (2 * 32768 pairs)
N_F32_FIELDS = 17  # Contacts: 3x (C,2) + 11x (C,) f32-ish + 2 int ids


def make_inputs(key):
    ks = jax.random.split(key, 4)
    valid = jax.random.uniform(ks[0], (C,)) < 0.6
    f2 = [jax.random.normal(ks[1], (C, 2)) for _ in range(3)]
    f1 = [jax.random.normal(ks[2], (C,)) for _ in range(11)]
    ids = [jax.random.randint(ks[3], (C,), 0, 16384, jnp.int32)
           for _ in range(2)]
    return valid, f2, f1, ids


def current_scheme(valid, f2, f1, ids):
    """argsort + per-field gathers + inverse argsort + 2 gathers back."""
    order = jnp.argsort(jnp.logical_not(valid))
    g2 = [x[order] for x in f2]
    g1 = [x[order] for x in f1]
    gi = [x[order] for x in ids]
    # stand-in for the kernel: touch everything cheaply
    acc_n = g1[0] * 0.5 + g2[0][:, 0] + gi[0].astype(jnp.float32) * 1e-9
    acc_t = g1[1] * 0.5 + g2[1][:, 1] + gi[1].astype(jnp.float32) * 1e-9
    inv = jnp.argsort(order)
    return acc_n[inv] + acc_t[inv]


def packed_scheme(valid, f2, f1, ids):
    """One packed gather + one scatter un-permute.

    Ids ride the f32 pack VALUE-converted with astype (exact below 2^24),
    matching the shipped step.py pack — NOT bitcast: TPU canonicalizes odd
    f32 bit patterns in data movement (CLAUDE.md rule 9a), and ids
    0..16384 are denormal bit patterns under a bitcast."""
    order = jnp.argsort(jnp.logical_not(valid))
    pack = jnp.concatenate(
        f2 + [x[:, None] for x in f1]
        + [x.astype(jnp.float32)[:, None] for x in ids], axis=1)  # (C, 19)
    g = pack[order]
    gi0 = g[:, 17].astype(jnp.int32)
    gi1 = g[:, 18].astype(jnp.int32)
    acc = jnp.stack([
        g[:, 6] * 0.5 + g[:, 0] + gi0.astype(jnp.float32) * 1e-9,
        g[:, 7] * 0.5 + g[:, 3] + gi1.astype(jnp.float32) * 1e-9,
    ], axis=1)                                         # (C, 2)
    back = jnp.zeros((C, 2), jnp.float32).at[order].set(acc)
    return back[:, 0] + back[:, 1]


def carry_scheme(valid, f2, f1, ids):
    """Carry-through sort variant (session-4 candidate): the 19 columns
    ride the compaction sort as payload operands (no row gather), and the
    accumulators ride a second carried sort keyed on the original index
    (no scatter).  Carried variadic sorts measured ~5x cheaper than
    argsort + row gather at broadphase shapes (micro_banded_sort);
    whether that survives 19 payload columns at (C=65536) rows is what
    this measures."""
    iota = jnp.arange(C, dtype=jnp.int32)
    ops = ((jnp.logical_not(valid)).astype(jnp.int32),
           *[x[:, 0] for x in f2], *[x[:, 1] for x in f2],
           *f1, *ids, iota)
    s = jax.lax.sort(ops, num_keys=1)
    g20 = s[1:4]; g21 = s[4:7]; g1 = s[7:18]; gi = s[18:20]; order = s[20]
    acc_n = g1[0] * 0.5 + g20[0] + gi[0].astype(jnp.float32) * 1e-9
    acc_t = g1[1] * 0.5 + g21[1] + gi[1].astype(jnp.float32) * 1e-9
    # un-permute by sorting back on the carried original index
    _, bn, bt = jax.lax.sort((order, acc_n, acc_t), num_keys=1)
    return bn + bt


def bench(fn, reps):
    @jax.jit
    def run(key, seed):
        def body(carry, _):
            k, s = carry
            k2 = jax.random.fold_in(k, s.astype(jnp.int32))
            valid, f2, f1, ids = make_inputs(k2)
            out = fn(valid, f2, f1, ids)
            return (k, s + out[0] * 1e-20 + 1.0), None

        (k, s), _ = jax.lax.scan(body, (key, seed), None, length=reps)
        return s

    key = jax.random.PRNGKey(0)
    s = run(key, jnp.float32(0.0))
    float(s)  # fence
    t0 = time.perf_counter()
    s = run(key, s)  # chained input
    float(s)
    t1 = time.perf_counter() - t0
    return t1 / reps * 1e3


def bench_baseline(reps):
    """Input generation alone, to subtract."""
    def fn(valid, f2, f1, ids):
        return f1[0] + valid.astype(jnp.float32)
    return bench(fn, reps)


if __name__ == "__main__":
    reps = 100
    base = bench_baseline(reps)
    cur = bench(current_scheme, reps)
    pak = bench(packed_scheme, reps)
    print(f"input-gen baseline: {base:.3f} ms")
    print(f"current (19 gathers + 2 sorts + 2 back): {cur:.3f} ms "
          f"-> net {cur - base:.3f} ms")
    print(f"packed  (1 gather + 1 sort + 1 scatter): {pak:.3f} ms "
          f"-> net {pak - base:.3f} ms")
    car = bench(carry_scheme, reps)
    print(f"carried (2 payload sorts, no gather/scatter): {car:.3f} ms "
          f"-> net {car - base:.3f} ms")
