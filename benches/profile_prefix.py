"""Per-stage cost of the step pipeline via PREFIX truncation.

Measures jitted scans of progressively longer prefixes of the step
pipeline; the difference between consecutive prefixes is that stage's
cost under real fusion.  Two hard-won rules for measuring on this stack
(axon remote TPU):

  * Never time repeated IDENTICAL executions — results can short-circuit.
    Every scan iteration here genuinely perturbs body positions (1e-5
    drift, above f32 ulp at scene scale) and feeds stage outputs back
    into the carried state, so no iteration is removable or repeatable.
  * Never time per-dispatch (the tunnel costs ~300 ms per call); always
    lax.scan on device.

Usage: python benches/profile_prefix.py [boxes] [backend]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from phyx_tpu import scenes, solver
from phyx_tpu.broadphase import broadphase
from phyx_tpu.cache import build_cache, warm_start_from_cache
from phyx_tpu.config import SimConfig
from phyx_tpu.narrowphase import narrowphase
from phyx_tpu.step import step, rollout, integrate_velocities

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

BOXES = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
BACKEND = sys.argv[2] if len(sys.argv) > 2 else "pallas"
REPS = 100

cap = 1
while cap < BOXES + 8:
    cap *= 2
cfg = SimConfig(max_bodies=cap,
                max_pairs=max(1024, (BOXES * 4 + 511) // 512 * 512),
                broadphase="sap", sap_window=96, solver_backend=BACKEND)
st0 = scenes.pile(cfg, BOXES, seed=0).build()
st0 = rollout(st0, cfg, 300)    # settle: realistic contact network
jax.block_until_ready(st0)

STAGES = ["integrate", "broadphase", "narrowphase", "cache_join", "prepare",
          "solve", "build_cache"]


def prefix_step(st, k, depth):
    """First `depth` stages of step(); returns perturbed state."""
    bodies = st.bodies.replace(pos=st.bodies.pos + 1e-5 * (k % 7))
    bodies = integrate_velocities(bodies, cfg)
    fb = jnp.float32(0.0)
    if depth >= 1:
        pairs = broadphase(bodies, cfg)
        fb += (pairs.num % 3).astype(jnp.float32) * 1e-9
    if depth >= 2:
        contacts = narrowphase(bodies, pairs, cfg)
        fb += jnp.sum(contacts.penetration) * 1e-12
    if depth >= 3:
        contacts = warm_start_from_cache(contacts, pairs, st.cache)
        fb += jnp.sum(contacts.warm_n) * 1e-12
    if depth >= 4:
        contacts = solver.prepare(bodies, contacts, cfg)
        fb += jnp.sum(contacts.mass_n) * 1e-12
    if depth >= 5:
        use_streamed = solver.pallas_smem_bytes(
            bodies.capacity, contacts.valid.shape[0]
        ) > solver.PALLAS_SMEM_BUDGET
        bodies2, an, at, res, _ = solver.solve_pallas(
            bodies, contacts, 2 * pairs.num, cfg, streamed=use_streamed)
        fb += res * 1e-9
    if depth >= 6:
        cache = build_cache(contacts, pairs, an, at)
        fb += jnp.sum(cache.normal_impulse) * 1e-12
        st = st.replace(cache=cache)
    return st.replace(bodies=st.bodies.replace(
        pos=st.bodies.pos + fb + 1e-5 * (k % 7)))


def timed(depth):
    @functools.partial(jax.jit, static_argnames=("d",))
    def run(st, d):
        def body(carry, _):
            s, k = carry
            return (prefix_step(s, k, d), k + 1), None
        (out, _), _ = jax.lax.scan(body, (st, jnp.float32(0.0)), None,
                                   length=REPS)
        return out
    out = run(st0, depth)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(out, depth)     # chain: new input = previous output
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS * 1e3


print(f"boxes={BOXES} backend={BACKEND} cap={cap} pairs_cap={cfg.max_pairs}")
prev = timed(0)
print(f"{'integrate only':24s} {prev:8.3f} ms")
for d in range(1, 7):
    t = timed(d)
    print(f"+{STAGES[d]:23s} {t:8.3f} ms   (delta {t - prev:+.3f})")
    prev = t

# ground truth: the real full step under the same protocol
@functools.partial(jax.jit, static_argnames=("n",))
def real(stt, n):
    def body(s, _):
        return step(s, cfg), None
    out, _ = jax.lax.scan(body, stt, None, length=n)
    return out
out = real(st0, REPS)
jax.block_until_ready(out)
t0 = time.perf_counter()
out = real(out, REPS)
jax.block_until_ready(out)
print(f"{'REAL full step':24s} {(time.perf_counter()-t0)/REPS*1e3:8.3f} ms")
