"""Fenced micro-bench: flat vs per-band batched sorts at mega-scene shapes.

VERDICT r2 #9 asks for a costed segmented-sort experiment for config E
(the band-grid mega-scene, BASELINE.md row E).  Bodies there are laid
out env-contiguous and envs band-contiguous, so the body table can be
reshaped (B, N/B) and each band sorted independently in ONE batched
`jax.lax.sort` — XLA's TPU sort runs O(log^2) compare-exchange passes
over the full array, so B segments cut the pass count from log^2(N) to
log^2(N/B) at the same per-pass cost.  Bodies that drift out of their
static band would pair wrongly; integration must count them into
overflow (banded_x already counts boundary crossers).

Also measured: carrying the 4 AABB payload columns THROUGH the sort
(multi-operand lax.sort) vs the shipped argsort + (N,4) row gather —
row gathers are row-serialized on TPU (~12 ns/row, CLAUDE.md) which at
1M rows is ~13 ms, possibly more than the sort saves.

Protocol (BASELINE.md measurement integrity): reps chained inside ONE
jitted lax.scan (fresh per-iteration inputs from a folded key, scalar
carried), amortizing the ~20-25 ms per-dispatch tunnel overhead; an
input-generation baseline is subtracted.
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

BANDS = 8


def make_keys(key, n):
    """Band-disjoint keys: band b occupies [b*1e6, b*1e6 + 1e5)."""
    seg = n // BANDS
    base = jnp.repeat(jnp.arange(BANDS, dtype=jnp.float32) * 1e6, seg)
    return base + jax.random.uniform(key, (n,), jnp.float32) * 1e5


def make_keys_payload(key, n):
    kk, kp = jax.random.split(key)
    return make_keys(kk, n), jax.random.uniform(kp, (n, 4), jnp.float32)


def flat_argsort(keys):
    order = jnp.argsort(keys).astype(jnp.int32)
    return order[0] + order[-1]


def banded_argsort(keys):
    n = keys.shape[0]
    seg = n // BANDS
    o = jnp.argsort(keys.reshape(BANDS, seg), axis=-1).astype(jnp.int32)
    o = o + (jnp.arange(BANDS, dtype=jnp.int32) * seg)[:, None]
    order = o.reshape(-1)
    return order[0] + order[-1]


def argsort_gather(keys, payload):
    # the shipped sap_tiled form: argsort, then permute the packed rows
    order = jnp.argsort(keys).astype(jnp.int32)
    rows = payload[order]
    return rows[0, 0] + jnp.float32(order[-1]) + rows[-1, 3]


def sort_carry(keys, payload):
    # carry the payload columns through the sort instead of gathering
    iota = jnp.arange(keys.shape[0], dtype=jnp.int32)
    cols = tuple(payload[:, c] for c in range(payload.shape[1]))
    out = jax.lax.sort((keys, iota) + cols, num_keys=1)
    return out[2][0] + jnp.float32(out[1][-1]) + out[5][-1]


def banded_carry(keys, payload):
    n = keys.shape[0]
    seg = n // BANDS
    iota = jnp.arange(n, dtype=jnp.int32).reshape(BANDS, seg)
    k = keys.reshape(BANDS, seg)
    cols = tuple(payload[:, c].reshape(BANDS, seg)
                 for c in range(payload.shape[1]))
    out = jax.lax.sort((k, iota) + cols, num_keys=1, dimension=-1)
    return (out[2].reshape(-1)[0] + jnp.float32(out[1].reshape(-1)[-1])
            + out[5].reshape(-1)[-1])


def scan_bench(fn, make_args, reps):
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


def check_equiv(n=8192, seed=0):
    """Band-disjoint keys: banded argsort == flat argsort (band regions
    are disjoint, ties broken identically by index within a band); the
    payload variants return bit-identical rows/orders."""
    keys = make_keys(jax.random.PRNGKey(seed), n)
    payload = jax.random.uniform(jax.random.PRNGKey(seed + 1), (n, 4))
    o1 = jnp.argsort(keys).astype(jnp.int32)
    seg = n // BANDS
    o2 = (jnp.argsort(keys.reshape(BANDS, seg), axis=-1).astype(jnp.int32)
          + (jnp.arange(BANDS, dtype=jnp.int32) * seg)[:, None]).reshape(-1)
    assert np.array_equal(np.asarray(o1), np.asarray(o2)), "order mismatch"
    r1 = payload[o1]
    out = jax.lax.sort(
        (keys, jnp.arange(n, dtype=jnp.int32))
        + tuple(payload[:, c] for c in range(4)), num_keys=1)
    r2 = jnp.stack(out[2:], axis=1)
    assert np.array_equal(np.asarray(r1), np.asarray(r2)), "payload mismatch"


def argsort_gather6(keys, payload):
    # sap_grid's small-capacity form: argsort + ONE packed (N, 6) gather
    order = jnp.argsort(keys).astype(jnp.int32)
    rows = payload[order]
    return rows[0, 0] + jnp.float32(order[-1]) + rows[-1, 5]


def sort_carry6(keys, payload):
    # sap_grid's mega form: 6 payload columns + iota carried by the sort
    iota = jnp.arange(keys.shape[0], dtype=jnp.int32)
    cols = tuple(payload[:, c] for c in range(6))
    out = jax.lax.sort((keys, iota) + cols, num_keys=1)
    return out[2][0] + jnp.float32(out[1][-1]) + out[7][-1]


def make_keys_payload6(key, n):
    kk, kp = jax.random.split(key)
    return make_keys(kk, n), jax.random.uniform(kp, (n, 6), jnp.float32)


def small_shapes():
    """Fence CARRY_MIN_ROWS (broadphase.py): gather vs carry at the
    10k/20k bench capacities with sap_grid's 6 payload columns."""
    for label, n, reps in [("10k bench cap", 16384, 200),
                           ("20k bench cap", 32768, 100),
                           ("64k", 65536, 50)]:
        mkp = lambda k: make_keys_payload6(k, n)
        genp = scan_bench(lambda x, p: x[0] + p[0, 0], mkp, reps)
        t_ag = scan_bench(argsort_gather6, mkp, reps) - genp
        t_sc = scan_bench(sort_carry6, mkp, reps) - genp
        print(f"{label} (n={n}): 6-col payload   "
              f"argsort+gather {t_ag:8.3f} ms   "
              f"carry-thru-sort {t_sc:8.3f} ms")


def main():
    from bench import acquire_tpu_lock
    acquire_tpu_lock()
    check_equiv()
    print("equivalence (band-disjoint keys): OK")
    small_shapes()
    for label, n, reps in [("config E @1024 envs", 264192, 30),
                           ("config E @4096 envs", 1053696, 10)]:
        n -= n % (8 * BANDS)
        mk = lambda k: (make_keys(k, n),)
        gen = scan_bench(lambda x: x[0], mk, reps)
        t_flat = scan_bench(flat_argsort, mk, reps) - gen
        t_band = scan_bench(banded_argsort, mk, reps) - gen
        mkp = lambda k: make_keys_payload(k, n)
        genp = scan_bench(lambda x, p: x[0] + p[0, 0], mkp, reps)
        t_ag = scan_bench(argsort_gather, mkp, reps) - genp
        t_sc = scan_bench(sort_carry, mkp, reps) - genp
        t_bc = scan_bench(banded_carry, mkp, reps) - genp
        print(f"{label} (n={n}):")
        print(f"  argsort            flat {t_flat:8.3f} ms   "
              f"banded({BANDS}) {t_band:8.3f} ms")
        print(f"  +4-col payload     argsort+gather {t_ag:8.3f} ms   "
              f"carry-thru-sort {t_sc:8.3f} ms   "
              f"banded-carry {t_bc:8.3f} ms")


if __name__ == "__main__":
    main()
