"""Kernel-ONLY A/B: solve_contacts_streamed vs solve_contacts_tiled on
identical pre-routed inputs (round 5, VERDICT r4 #1).

Every prior fence (micro_tiled_gap, the config-E rows) times whole
steps, so the tiled-vs-streamed delta CONFLATES two different costs:

  (a) kernel-internal per-visit/per-block overhead (window indirection,
      walk bookkeeping, switch dispatch), and
  (b) the tiled path's XLA-side prep: rank sort, ranked-body payload
      sort, slab routing sort, acc un-route sort, body un-permute sort
      (solver.solve_pallas_tiled) — vs the streamed path's single
      compaction gather + scatter (step.solve_stage).

This micro isolates (a): the settled-10k solve stage is run ONCE
eagerly with a capture shim around each kernel entry point, then the
captured, fully-prepared kernel arguments are re-solved in a
lax.scan that carries ONLY the body buffer (chained input — BASELINE.md
rule 2; contact geometry is frame-constant, body state evolves).  The
(t(2n) - t(n)) / n delta is pure kernel time.  micro_tiled_gap's
whole-step delta minus this kernel-only delta = the routing-prep cost,
closing VERDICT r4 weak #1's attribution without a profiler.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

if os.environ.get("KAB_CPU"):
    # CPU smoke test (CLAUDE.md rule 7: the env-var pin is consumed by
    # the sitecustomize — config.update is the only reliable CPU force)
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def capture_kernel_args(st, cfg):
    """Run ONE solve stage eagerly with capture shims; returns the
    concrete (args, kwargs) each kernel entry point received."""
    from phyx_tpu import solver
    from phyx_tpu.broadphase import broadphase
    from phyx_tpu.cache import warm_start_from_cache
    from phyx_tpu.kernels import contact_solver as csf
    from phyx_tpu.kernels import contact_solver_streamed as css
    from phyx_tpu.kernels import contact_solver_tiled as cst
    from phyx_tpu.narrowphase import narrowphase_with_props
    from phyx_tpu.step import integrate_velocities, solve_stage

    bodies = integrate_velocities(st.bodies, cfg)
    pairs = broadphase(bodies, cfg)
    contacts, props = narrowphase_with_props(bodies, pairs, cfg)
    contacts = warm_start_from_cache(contacts, pairs, st.cache,
                                     n_cap=cfg.max_bodies)
    contacts = solver.prepare(bodies, contacts, cfg, pair_props=props)

    grabbed = {}

    def shim(name, orig):
        def wrapper(*a, **k):
            grabbed[name] = (a, k)
            return orig(*a, **k)
        return wrapper

    o_f, o_s, o_t = (csf.solve_contacts_fused, css.solve_contacts_streamed,
                     cst.solve_contacts_tiled)
    csf.solve_contacts_fused = shim("fused", o_f)
    css.solve_contacts_streamed = shim("streamed", o_s)
    cst.solve_contacts_tiled = shim("tiled", o_t)
    try:
        solve_stage(bodies, contacts, pairs, st.joints, None, None, cfg)
    finally:
        csf.solve_contacts_fused = o_f
        css.solve_contacts_streamed = o_s
        cst.solve_contacts_tiled = o_t
    assert len(grabbed) == 1, list(grabbed)
    (name, (a, k)), = grabbed.items()
    return name, jax.tree.map(
        lambda x: x if isinstance(x, (int, bool)) else jnp.asarray(x),
        a), k


def make_runner(kernel, args, kwargs, body_idx, length):
    """Scan `length` chained kernel solves, carrying the body buffer."""
    pre = args[:body_idx]
    post = args[body_idx + 1:]

    @jax.jit
    def run(body0):
        def f(bf, _):
            out = kernel(*pre, bf, *post, **kwargs)
            return out[0], out[2]
        bf, ress = jax.lax.scan(f, body0, None, length=length)
        return bf, ress
    return run


def timed(kernel, args, kwargs, body_idx, n=16):
    body0 = args[body_idx]
    r1 = make_runner(kernel, args, kwargs, body_idx, n)
    r2 = make_runner(kernel, args, kwargs, body_idx, 2 * n)
    # warm both compiles (chained: second starts from the first's output)
    bf, res = r1(body0)
    float(res[-1][0])
    bf2, res = r2(bf)
    float(res[-1][0])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        bf, res = r1(bf2)
        float(res[-1][0])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        bf2, res = r2(bf)
        float(res[-1][0])
        t2 = time.perf_counter() - t0
        d = (t2 - t1) / n
        if best is None or d < best:
            best = d
    return best * 1e3


def main():
    from bench import acquire_tpu_lock, build
    from phyx_tpu.kernels.contact_solver_streamed import \
        solve_contacts_streamed
    from phyx_tpu.kernels.contact_solver_tiled import solve_contacts_tiled
    from phyx_tpu.step import rollout

    if on_tpu():
        acquire_tpu_lock()
        boxes, settle, n = 10000, 300, 16
    else:
        # CPU/interpret smoke test: plumbing + bit-level sanity only
        boxes, settle, n = 220, 8, 2

    cfg, st = build("pile", boxes, "pallas", "sap_grid", 192, 8)
    st = rollout(st, cfg, settle)
    float(st.stats.residual)
    nvis = int(st.stats.num_contacts) * (
        cfg.velocity_iterations + 1 + cfg.position_iterations)
    print(f"contacts {int(st.stats.num_contacts)}  "
          f"visits/solve {nvis}", flush=True)

    name, a_s, k_s = capture_kernel_args(st, cfg)
    assert name == "streamed" or not on_tpu(), name
    if name == "streamed":
        ms = timed(solve_contacts_streamed, a_s, k_s, 0, n)
        print(f"streamed KERNEL-ONLY: {ms:7.2f} ms/solve  "
              f"({ms * 1e6 / nvis:5.1f} ns/visit)", flush=True)

    for stride, halo in ((16512, 128), (16384, 2048), (2048, 2048)):
        c2 = cfg.replace(solver_backend="pallas_tiled",
                         tile_stride=stride, tile_halo=halo)
        name, a_t, k_t = capture_kernel_args(st, c2)
        assert name == "tiled", name
        ms = timed(solve_contacts_tiled, a_t, k_t, 0, n)
        n_slabs = k_t.get("n_slabs") or a_t[6]
        print(f"tiled KERNEL-ONLY stride {stride:6d} "
              f"({n_slabs} slabs): {ms:7.2f} ms/solve  "
              f"({ms * 1e6 / nvis:5.1f} ns/visit)", flush=True)


if __name__ == "__main__":
    main()
