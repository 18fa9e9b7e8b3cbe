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

Timing protocol per BASELINE.md: fenced scalar fetch, chained inputs
(never repeat an identical execution), median of reps.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@jax.jit
def flat_argsort(keys):
    order = jnp.argsort(keys).astype(jnp.int32)
    return order, order[0] + order[-1]


def make_banded_argsort(bands):
    @jax.jit
    def banded(keys):
        n = keys.shape[0]
        seg = n // bands
        o = jnp.argsort(keys.reshape(bands, seg), axis=-1).astype(jnp.int32)
        o = o + (jnp.arange(bands, dtype=jnp.int32) * seg)[:, None]
        order = o.reshape(-1)
        return order, order[0] + order[-1]
    return banded


@jax.jit
def argsort_gather(keys, payload):
    # the shipped sap_tiled form: argsort, then permute the packed rows
    order = jnp.argsort(keys).astype(jnp.int32)
    rows = payload[order]
    return rows, order, rows[0, 0] + jnp.float32(order[-1])


@jax.jit
def sort_carry(keys, payload):
    # carry the payload columns through the sort instead of gathering
    iota = jnp.arange(keys.shape[0], dtype=jnp.int32)
    cols = tuple(payload[:, c] for c in range(payload.shape[1]))
    out = jax.lax.sort((keys, iota) + cols, num_keys=1)
    order = out[1]
    rows = jnp.stack(out[2:], axis=1)
    return rows, order, rows[0, 0] + jnp.float32(order[-1])


def make_banded_carry(bands):
    @jax.jit
    def bc(keys, payload):
        n = keys.shape[0]
        seg = n // bands
        iota = jnp.arange(n, dtype=jnp.int32).reshape(bands, seg)
        k = keys.reshape(bands, seg)
        cols = tuple(payload[:, c].reshape(bands, seg)
                     for c in range(payload.shape[1]))
        out = jax.lax.sort((k, iota) + cols, num_keys=1, dimension=-1)
        order = out[1].reshape(-1)
        rows = jnp.stack([c.reshape(-1) for c in out[2:]], axis=1)
        return rows, order, rows[0, 0] + jnp.float32(order[-1])
    return bc


def timeit(fn, args, reps=20):
    out = fn(*args)
    float(out[-1])                    # fence (scalar fetch)
    ts = []
    for r in range(reps):
        # chain: perturb input from previous output so no two executions
        # are identical (results can short-circuit on this stack)
        args = (args[0] + jnp.float32(r & 1) * 1e-6, *args[1:])
        t0 = time.perf_counter()
        out = fn(*args)
        float(out[-1])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def check_equiv(n, bands, seed=0):
    """Band-disjoint keys: banded argsort == flat argsort (band regions
    are disjoint, ties broken identically by index within a band)."""
    rng = np.random.default_rng(seed)
    seg = n // bands
    base = np.repeat(np.arange(bands) * 1e6, seg)
    keys = (base + rng.random(n) * 1e5).astype(np.float32)
    kj = jnp.array(keys)
    a, _ = flat_argsort(kj)
    b, _ = make_banded_argsort(bands)(kj)
    assert np.array_equal(np.asarray(a), np.asarray(b)), "order mismatch"


def main():
    check_equiv(8192, 8)
    print("equivalence (band-disjoint keys): OK")
    for label, n in [("config E @1024 envs", 264192),
                     ("config E @4096 envs", 1053696 - 1053696 % 8)]:
        n -= n % 8
        rng = np.random.default_rng(1)
        seg = n // 8
        base = np.repeat(np.arange(8) * 1e6, seg)
        keys = jnp.array((base + rng.random(n) * 1e5).astype(np.float32))
        payload = jnp.array(rng.random((n, 4)).astype(np.float32))
        t_flat = timeit(flat_argsort, (keys,))
        t_band = timeit(make_banded_argsort(8), (keys,))
        t_ag = timeit(argsort_gather, (keys, payload))
        t_sc = timeit(sort_carry, (keys, payload))
        t_bc = timeit(make_banded_carry(8), (keys, payload))
        print(f"{label} (n={n}):")
        print(f"  argsort            flat {t_flat:8.3f} ms   "
              f"banded(8) {t_band:8.3f} ms")
        print(f"  +4-col payload     argsort+gather {t_ag:8.3f} ms   "
              f"carry-thru-sort {t_sc:8.3f} ms   "
              f"banded-carry {t_bc:8.3f} ms")


if __name__ == "__main__":
    main()
