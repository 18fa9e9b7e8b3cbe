"""Per-stage wall-clock profile of the step pipeline on TPU.

Each stage is timed under a jitted lax.scan of REPS applications with an
iteration-dependent input perturbation (so XLA cannot hoist the stage out
of the loop), which removes the per-dispatch tunnel overhead (~300 ms on
axon) that a naive timing loop would measure instead of the engine
(SURVEY.md §5.1).

Usage: python benches/profile_step.py [boxes] [backend]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from phyx_tpu import scenes
from phyx_tpu.broadphase import broadphase
from phyx_tpu.cache import build_cache, warm_start_from_cache
from phyx_tpu.config import SimConfig
from phyx_tpu.narrowphase import narrowphase
from phyx_tpu.step import step, rollout, integrate_velocities
from phyx_tpu.solver import prepare, solve_pallas

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

BOXES = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
BACKEND = sys.argv[2] if len(sys.argv) > 2 else "pallas"
REPS = 50

cap = 1
while cap < BOXES + 8:
    cap *= 2
cfg = SimConfig(max_bodies=cap,
                max_pairs=max(1024, (BOXES * 4 + 511) // 512 * 512),
                broadphase="sap", sap_window=96, solver_backend=BACKEND)
st = scenes.pile(cfg, BOXES, seed=0).build()
st = rollout(st, cfg, 200)    # settle: realistic contact network
jax.block_until_ready(st)


def bench(name, fn, *args):
    """Times REPS scanned applications of fn(*args) with a perturbed first
    argument per iteration; returns fn(*args)."""

    @jax.jit
    def run(args):
        def body(acc, i):
            first = jax.tree.map(
                lambda x: (x + i * 1e-12).astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, args[0])
            out = fn(first, *args[1:])
            leaf = jax.tree.leaves(out)[0]
            return acc + jnp.sum(leaf).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(REPS, dtype=jnp.float32))
        return acc

    out = run(args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:28s} {dt*1e3:9.3f} ms")
    return fn(*args)


print(f"boxes={BOXES} backend={BACKEND} cap={cap} pairs_cap={cfg.max_pairs}")
bodies = bench("integrate_velocities",
               lambda b: integrate_velocities(b, cfg), st.bodies)
pairs = bench("broadphase(sap)", lambda b: broadphase(b, cfg), bodies)
contacts = bench("narrowphase", lambda b, p: narrowphase(b, p, cfg),
                 bodies, pairs)
contacts = bench("cache_join",
                 lambda c, p, ca: warm_start_from_cache(c, p, ca),
                 contacts, pairs, st.cache)
contacts = bench("prepare", lambda b, c: prepare(b, c, cfg), bodies, contacts)
if BACKEND == "pallas":
    from phyx_tpu.solver import (pallas_smem_bytes, pallas_streamed_smem_bytes,
                                 PALLAS_SMEM_BUDGET)
    streamed = pallas_smem_bytes(
        bodies.capacity, contacts.valid.shape[0]) > PALLAS_SMEM_BUDGET
    out = bench(f"solve_pallas(streamed={streamed})",
                lambda b, c, n: solve_pallas(b, c, n, cfg, streamed=streamed),
                bodies, contacts, 2 * pairs.num)
    bench("build_cache",
          lambda c, p: build_cache(c, p, out[1], out[2]), contacts, pairs)
bench("FULL step", lambda s: step(s, cfg), st)
