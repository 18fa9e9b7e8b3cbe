"""Microbenchmark: gather/scatter strategies for the solver sweeps on TPU.

WARNING: this harness predates the measurement-integrity findings
(BASELINE.md): it times with block_until_ready, which can return early on
this stack.  Treat its numbers as unreliable; use fenced chained-scan
timings instead (benches/profile_prefix.py docstring).

Decides the solver backend design (SURVEY.md §7.6): the v1 masked-full-buffer
scatter-add sweeps are slow on TPU; candidates are
  a) gather (jnp.take) cost,
  b) scatter-add with duplicate indices (current v1),
  c) scatter-add with unique indices + unique_indices=True (bucketed color),
  d) inverse-map formulation: bodies GATHER their contact's impulse
     (no scatter at all inside the iteration loop).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 16384   # bodies
C = 8192    # contacts in one sweep

rng = np.random.default_rng(0)
idx_dup = jnp.asarray(rng.integers(0, N, C), jnp.int32)
perm = jnp.asarray(rng.permutation(N)[:C], jnp.int32)   # unique
vals = jnp.asarray(rng.normal(size=(C, 2)), jnp.float32)
body = jnp.asarray(rng.normal(size=(N, 2)), jnp.float32)
# inverse map: body -> contact slot (or C for none)
inv = np.full(N, C, np.int32)
inv[np.asarray(perm)] = np.arange(C)
inv = jnp.asarray(inv)

REPS = 100


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:42s} {dt*1e6:10.1f} us/op")


def loop(body_fn):
    def run(b, v):
        def it(_, b):
            return body_fn(b, v)
        return jax.lax.fori_loop(0, REPS, it, b)
    return run


bench("gather C from N (take)",
      loop(lambda b, v: b + 1e-9 * jnp.take(b, idx_dup, axis=0).sum()), body, vals)
bench("scatter-add dup idx",
      loop(lambda b, v: b.at[idx_dup].add(v)), body, vals)
bench("scatter-add unique idx (flag)",
      loop(lambda b, v: b.at[perm].add(v, unique_indices=True)), body, vals)
bench("scatter-set unique idx (flag)",
      loop(lambda b, v: b.at[perm].set(v, unique_indices=True)), body, vals)
bench("inverse-map gather update",
      loop(lambda b, v: b + jnp.where((inv < C)[:, None],
                                      jnp.take(v, jnp.minimum(inv, C - 1),
                                               axis=0), 0.0)), body, vals)
bench("gather+compute+inv-gather (full sweep shape)",
      loop(lambda b, v: b + jnp.where(
          (inv < C)[:, None],
          jnp.take(0.5 * (jnp.take(b, idx_dup, axis=0) + v),
                   jnp.minimum(inv, C - 1), axis=0), 0.0)), body, vals)
