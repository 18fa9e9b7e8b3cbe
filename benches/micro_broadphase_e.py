"""Fenced intra-stage ablation of config E's broadphase (VERDICT r4 #2:
the profiled broadphase stage reads ~185 ms of the 1219 ms step at
settled 1024-env E, internally unattributed — the carried sort is fenced
at ~2.7 ms @ 1M rows, so ~180 ms hides in banded-key computation, the
serial sweep walk, exact-x accept loads, or the 3.4M-slot pair
finalization).

Prefix protocol (the same one that cracked the 10k narrowphase block in
round 3): cumulative prefixes of the SHIPPED broadphase_sap_tiled code
path —

  P1  keys + carried 9-operand body sort + slab padding
      (broadphase._sap_tiled_sort_stage — the exact shipped function)
  P2  P1 + sweep_emit_tiled (the serial Pallas walk, exact-x accept)
  P2n P1 + sweep_emit_tiled with exact_x DISABLED on the same banded
      state (isolates the 2 extra SMEM loads/visit of VERDICT r3 #2's
      exact accept)
  P3  full broadphase_sap_tiled (adds the mp-slot _finish lex sort)

Deltas attribute the stage.  Each prefix is timed with the standing
integrity rules: lax.scan chaining with a carried perturbation (never
repeated identical executions), scalar fence, (t(2n) - t(n)) / n.

Usage: python benches/micro_broadphase_e.py [--envs 1024] [--boxes 256]
         [--settle 240] [--iters 8]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from bench import acquire_tpu_lock, build_envs  # noqa: E402


def chain_timer(fn, bodies, iters):
    """Time fn(bodies) via a scan that perturbs positions per iteration
    (carried dependence) and folds fn's scalar output into the carry."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(b, n):
        def it(carry, _):
            t, acc = carry
            b2 = b.replace(pos=b.pos + t * 1e-7)
            out = fn(b2)
            return (t + 1.0 + out * 1e-30, acc + out), None

        (t, acc), _ = jax.lax.scan(
            it, (jnp.float32(0.0), jnp.float32(0.0)), None, length=n)
        return acc

    float(run(bodies, iters))          # compile + fence
    float(run(bodies, 2 * iters))
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(bodies, iters))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(bodies, 2 * iters))
        t2 = time.perf_counter() - t0
        if t2 > t1:
            break
    return (t2 - t1) / iters * 1e3     # ms per invocation


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--boxes", type=int, default=256)
    ap.add_argument("--settle", type=int, default=240)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--grid", action="store_true",
                    help="add banded sap_grid legs (scanned-window XLA) "
                         "on the same settled state: timing + pair/ovf "
                         "parity vs the shipped tiled sweep")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        acquire_tpu_lock()

    from phyx_tpu import broadphase as bp
    from phyx_tpu.kernels.sweep import sweep_emit_tiled
    from phyx_tpu.step import rollout

    cfg, st = build_envs(args.envs, args.boxes, "pallas")
    for _ in range(-(-args.settle // 2)):
        st = rollout(st, cfg, 2)
    float(st.stats.residual)
    bodies = st.bodies
    print(f"# settled: contacts {int(st.stats.num_contacts)} pairs "
          f"{int(st.stats.num_pairs)} overflow "
          f"{int(st.stats.pair_overflow)}", flush=True)

    def reduce_sort(out):
        (aabb_sorted, dyn_sorted, order_sorted, truex_sorted, nact,
         *_rest) = out
        r = aabb_sorted.sum() + dyn_sorted.sum() + order_sorted.sum() \
            + nact
        if truex_sorted is not None:
            r = r + truex_sorted.sum()
        return r.astype(jnp.float32)

    def p1(b):
        return reduce_sort(bp._sap_tiled_sort_stage(b, cfg))

    def emit(b, exact):
        (aabb_sorted, dyn_sorted, order_sorted, truex_sorted, nact,
         n_slabs, K, W, mp, n_cross, d_pi, d_pj, d_valid, _rt) = \
            bp._sap_tiled_sort_stage(b, cfg)
        if truex_sorted is not None and exact:
            ppi, ppj, num_k, ovf_d, ovf_w = sweep_emit_tiled(
                aabb_sorted, dyn_sorted, order_sorted, nact, mp,
                n_slabs, K, W, truex_sorted=truex_sorted, exact_x=True)
        else:
            ppi, ppj, num_k, ovf_d, ovf_w = sweep_emit_tiled(
                aabb_sorted, dyn_sorted, order_sorted, nact, mp,
                n_slabs, K, W)
        return (ppi.sum() + ppj.sum() + num_k + ovf_d + ovf_w
                ).astype(jnp.float32)

    def p3(b):
        pr = bp.broadphase_sap_tiled(b, cfg)
        return (pr.pi.sum() + pr.num + pr.overflow).astype(jnp.float32)

    rows = [("P1 keys+carried sort+padding", lambda b: p1(b)),
            ("P2 + sweep kernel (exact_x)", lambda b: emit(b, True)),
            ("P2n + sweep kernel (no exact_x; walk-identical)",
             lambda b: emit(b, False)),
            ("P3 full broadphase (adds _finish lex sort)", p3)]
    results = {}
    for label, fn in rows:
        ms = chain_timer(fn, bodies, args.iters)
        results[label] = ms
        print(f"{label:55s} {ms:9.2f} ms", flush=True)

    p1ms = results[rows[0][0]]
    p2ms = results[rows[1][0]]
    p2n = results[rows[2][0]]
    p3ms = results[rows[3][0]]
    print(f"# deltas: sort-stage {p1ms:.2f} | sweep-kernel "
          f"{p2ms - p1ms:.2f} (exact-x cost {p2ms - p2n:+.2f}) | "
          f"finalize {p3ms - p2ms:.2f}", flush=True)

    if not args.grid:
        return

    # --- banded sap_grid legs (round 5: can the scanned-window XLA form
    # displace the 161 ms serial walk at mega scale?).  The grid pays
    # w_max vector passes over ALL rows (the serial walk pays only actual
    # candidate visits), so the winner flips with the avg/max neighbor
    # skew — unresolvable on paper, hence this fence.  Validity: a grid
    # leg only counts if ovf_window == ovf_slots == 0 and num matches
    # the tiled result on the same state.
    import dataclasses
    import os

    legs = ((384, 8), (512, 8), (384, 12))
    env_legs = os.environ.get("PHYX_GRID_LEGS", "")
    if env_legs:
        legs = tuple(tuple(int(v) for v in leg.split(":"))
                     for leg in env_legs.split(","))

    pr_ref = jax.jit(lambda b: bp.broadphase_sap_tiled(b, cfg))(bodies)
    ref_num = int(pr_ref.num)
    for w, H in legs:
        gcfg = dataclasses.replace(cfg, broadphase="sap_grid",
                                   sap_window=w, sap_hits=H)

        def pg(b, gcfg=gcfg):
            pr = bp.broadphase_sap_grid(b, gcfg)
            return (pr.pi.sum() + pr.num + pr.overflow).astype(jnp.float32)

        pr = jax.jit(lambda b: bp.broadphase_sap_grid(b, gcfg))(bodies)
        num, ow, os_ = int(pr.num), int(pr.ovf_window), int(pr.ovf_slots)
        ob = int(pr.ovf_band)
        ok = (num == ref_num) and ow == 0 and os_ == 0
        ms = chain_timer(pg, bodies, args.iters)
        print(f"G w={w:4d} H={H:2d} full sap_grid {ms:9.2f} ms  "
              f"num {num} (ref {ref_num}) ovf_w {ow} ovf_s {os_} "
              f"ovf_band {ob}  {'PARITY-OK' if ok else 'INVALID'}",
              flush=True)


if __name__ == "__main__":
    main()
