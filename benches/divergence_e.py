"""Gated-vs-ungated trajectory divergence at settled config E.

VERDICT r4 missing #2 / next-round #3: the gated north-star row's
"quality neutral" claim rested on max_penetration at ONE settled frame.
This harness makes it trajectory-level: from ONE settled state, roll the
SAME scene ``--frames`` frames under (a) ungated fixed-iteration
semantics, (b) the velocity gate (``SimConfig.rl_preset``), and
(c) both gates, and compare at checkpoints:

  * RMS position drift of the gated trajectory vs the ungated one at
    the SAME frame index (dynamic bodies only), in box-half units;
  * total kinetic energy;
  * contact-SET churn: |pairs_gated symmetric-diff pairs_ungated| /
    |pairs_ungated| over the cache's live (pi, pj) keys;
  * max penetration and pair overflow traces.

Measurement discipline per BASELINE.md: 2-step rollout chunks at mega
scale (CLAUDE.md rule 5), every fetch is a value transfer (cannot lie),
trajectories chained (never repeated identical executions).

Output: one JSON line per (mode, checkpoint) plus a SUMMARY line with
the max-over-checkpoints drift/churn per gated mode — the numbers
BASELINE.md row E's gated entries cite.

Usage: python benches/divergence_e.py [--envs 1024] [--boxes 256]
         [--settle 300] [--frames 500] [--ckpt 50]
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from bench import acquire_tpu_lock, build_envs  # noqa: E402
from phyx_tpu.step import rollout  # noqa: E402

BOX_HALF = 0.5


def fence(st):
    return float(st.stats.residual)


def live_pairs(st) -> set:
    pi = np.asarray(st.cache.pi)
    pj = np.asarray(st.cache.pj)
    m = pi != np.int32(2**31 - 1)
    return set(zip(pi[m].tolist(), pj[m].tolist()))


def snapshot(st, dyn_mask):
    pos = np.asarray(st.bodies.pos)[dyn_mask]
    vel = np.asarray(st.bodies.vel)
    inv_m = np.asarray(st.bodies.inv_mass)
    m = np.where(inv_m > 0, 1.0 / np.maximum(inv_m, 1e-30), 0.0)
    ke = float(0.5 * (m * (vel ** 2).sum(axis=1)).sum())
    return {
        "pos": pos,
        "ke": ke,
        "pairs": live_pairs(st),
        "pen": float(st.stats.max_penetration),
        "overflow": int(st.stats.pair_overflow),
        "contacts": int(st.stats.num_contacts),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--boxes", type=int, default=256)
    ap.add_argument("--settle", type=int, default=300)
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--ckpt", type=int, default=50)
    ap.add_argument("--chunk", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        acquire_tpu_lock()

    cfg, st = build_envs(args.envs, args.boxes, "pallas")

    def perturb(s):
        # chaos-floor control: a 1e-7 nudge on one dynamic body's
        # velocity.  GS pile dynamics are chaotic, so ANY perturbation
        # diverges; the gate is trajectory-neutral iff its drift is the
        # same ORDER as this floor (pointwise-identical trajectories
        # are impossible to demand of a semantics change).
        idx = int(np.argmax(np.asarray(s.bodies.inv_mass) > 0.0))
        v = s.bodies.vel
        return s.replace(bodies=s.bodies.replace(
            vel=v.at[idx, 0].add(1e-7)))

    modes = {
        "ungated": (cfg, None),
        "perturb_control": (cfg, perturb),
        "vel_gate_1e-2": (cfg.replace(velocity_rel_tol=1e-2), None),
        "both_gates_1e-2": (cfg.replace(velocity_rel_tol=1e-2,
                                        position_rel_tol=1e-2), None),
    }

    # settle ONCE, ungated; every mode starts from this exact state
    for _ in range(-(-args.settle // args.chunk)):
        st = rollout(st, cfg, args.chunk)
    fence(st)
    dyn_mask = np.asarray(st.bodies.inv_mass) > 0
    s0 = snapshot(st, dyn_mask)
    print(json.dumps({"mode": "settled_start", "frame": 0,
                      "contacts": s0["contacts"], "pen": s0["pen"],
                      "ke": s0["ke"], "overflow": s0["overflow"]}),
          flush=True)

    n_ckpt = args.frames // args.ckpt
    traces = {}
    for name, (mcfg, xform) in modes.items():
        cur = xform(st) if xform is not None else st
        snaps = []
        for k in range(n_ckpt):
            for _ in range(args.ckpt // args.chunk):
                cur = rollout(cur, mcfg, args.chunk)
            fence(cur)
            snaps.append(snapshot(cur, dyn_mask))
        traces[name] = snaps

    base = traces["ungated"]
    summary = {}
    for name in modes:
        if name == "ungated":
            for k, s in enumerate(base):
                print(json.dumps({
                    "mode": name, "frame": (k + 1) * args.ckpt,
                    "ke": s["ke"], "pen": s["pen"],
                    "contacts": s["contacts"],
                    "overflow": s["overflow"]}), flush=True)
            continue
        drifts, churns = [], []
        for k, s in enumerate(traces[name]):
            d = s["pos"] - base[k]["pos"]
            rms = float(np.sqrt((d ** 2).sum(axis=1).mean())) / BOX_HALF
            sym = len(s["pairs"] ^ base[k]["pairs"])
            churn = sym / max(1, len(base[k]["pairs"]))
            drifts.append(rms)
            churns.append(churn)
            print(json.dumps({
                "mode": name, "frame": (k + 1) * args.ckpt,
                "rms_drift_boxhalves": round(rms, 6),
                "pair_set_churn": round(churn, 6),
                "ke": s["ke"], "ke_vs_ungated": round(
                    s["ke"] / max(base[k]["ke"], 1e-30), 6),
                "pen": s["pen"], "pen_vs_ungated": round(
                    s["pen"] / max(base[k]["pen"], 1e-30), 6),
                "contacts": s["contacts"],
                "overflow": s["overflow"]}), flush=True)
        summary[name] = {
            "max_rms_drift_boxhalves": round(max(drifts), 6),
            "final_rms_drift_boxhalves": round(drifts[-1], 6),
            "max_pair_set_churn": round(max(churns), 6),
            "final_pen_ratio": round(
                traces[name][-1]["pen"] / max(base[-1]["pen"], 1e-30), 4),
            "final_ke_ratio": round(
                traces[name][-1]["ke"] / max(base[-1]["ke"], 1e-30), 4),
        }
    print(json.dumps({"mode": "SUMMARY", "frames": args.frames,
                      "envs": args.envs, "boxes": args.boxes,
                      "summary": summary}), flush=True)


if __name__ == "__main__":
    main()
