"""Per-stage wall-clock profile of the step pipeline on TPU.

Each stage is jitted separately (fusion differences vs the full step are
acceptable — this finds order-of-magnitude monsters, SURVEY.md §5.1).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from phyx_tpu import scenes, solver
from phyx_tpu.broadphase import broadphase, compute_aabbs
from phyx_tpu.cache import build_cache, warm_start_from_cache
from phyx_tpu.config import SimConfig
from phyx_tpu.narrowphase import narrowphase
from phyx_tpu.step import step, integrate_velocities
from phyx_tpu.solver import prepare, solve_pallas

cfg = SimConfig(max_bodies=2048, max_pairs=4096, broadphase="sap",
                sap_window=48, solver_backend="pallas")
st = scenes.pile(cfg, 1000, seed=0).build()
for _ in range(5):
    st = step(st, cfg)
jax.block_until_ready(st)

REPS = 10


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:28s} {dt*1e3:9.2f} ms")
    return out


bodies = bench("integrate_velocities",
               lambda b: integrate_velocities(b, cfg), st.bodies)
pairs = bench("broadphase(sap)", lambda b: broadphase(b, cfg), bodies)
contacts = bench("narrowphase", lambda b, p: narrowphase(b, p, cfg),
                 bodies, pairs)
contacts = bench("cache_join",
                 lambda c, p, ca: warm_start_from_cache(c, p, ca),
                 contacts, pairs, st.cache)
contacts = bench("prepare", lambda b, c: prepare(b, c, cfg), bodies, contacts)
out = bench("solve_pallas",
            lambda b, c, n: solve_pallas(b, c, n, cfg),
            bodies, contacts, 2 * pairs.num)
bench("build_cache",
      lambda c, p: build_cache(c, p, out[1], out[2]), contacts, pairs)
bench("FULL step", lambda s: step(s, cfg), st)
