"""Bench harness: steps/sec on the 10k-box pile (BASELINE.json primary metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured steps/sec divided by the north-star target of
1,000 steps/sec @ 10k-box pile (BASELINE.json:5) — the reference itself
published no numbers (BASELINE.md).

Measurement uses rollout() (lax.scan over the fused step): one device
dispatch for the whole run, matching how the engine is meant to be driven.
A per-step Python loop would measure the host<->device tunnel (~300 ms
per dispatch here), not the engine.

Usage: python bench.py [--boxes N] [--steps N] [--scene pile|avalanche]
                       [--backend xla|pallas]
"""

from __future__ import annotations

import argparse
import json
import time

import jax

# Persistent compilation cache: TPU compiles here are remote and slow
# (minutes); identical configs across bench runs then start instantly.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from phyx_tpu import scenes
from phyx_tpu.config import SimConfig
from phyx_tpu.step import rollout

NORTH_STAR_STEPS_PER_SEC = 1000.0


def acquire_tpu_lock(timeout_s: float = 240.0):
    """Serialize TPU access across local processes (CLAUDE.md rule 5:
    ONE TPU process at a time — concurrent minute-long device programs
    crash the remote worker).

    Blocks on an advisory flock until any peer (another bench/profile
    invocation, e.g. the measurement queue vs the driver's round-end
    bench) releases it; after ``timeout_s`` proceeds anyway so a stuck,
    killed, or long-running holder can never turn the round-end bench
    into a no-op.  ROUND-3 POSTMORTEM (VERDICT r3 weak #1): the default
    wait was 1800 s, LONGER than the driver's own bench timeout — a
    builder measurement queue holding the lock starved the official
    round-end bench into rc 124.  The wait now defaults to 240 s
    (override: PHYX_TPU_LOCK_TIMEOUT), short enough that the scoring
    bench always proceeds; measurement queues must additionally take a
    hard deadline and exit (benches/tpu_queue*.sh QUEUE_TTL).

    The holder writes its PID + argv into the lock file so a waiting
    process's operator can inspect who holds it.  The fd is held for
    process lifetime (the OS drops the lock on exit, even on SIGKILL)."""
    import fcntl
    import os
    import sys
    import time as _t
    timeout_s = float(os.environ.get("PHYX_TPU_LOCK_TIMEOUT", timeout_s))
    fd = os.open("/tmp/phyx_tpu.tpu.lock", os.O_CREAT | os.O_RDWR, 0o666)
    deadline = _t.time() + timeout_s
    waited = False
    while True:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            try:
                os.ftruncate(fd, 0)
                os.pwrite(fd, (f"{os.getpid()} "
                               f"{' '.join(sys.argv)}\n").encode(), 0)
            except OSError:
                pass
            if waited:
                print("# tpu lock: acquired", file=sys.stderr)
            return fd
        except OSError:
            if _t.time() >= deadline:
                try:
                    holder = os.pread(fd, 256, 0).decode(
                        errors="replace").strip()
                except OSError:
                    holder = "?"
                print(f"# tpu lock: wait timed out (holder: {holder}) — "
                      "proceeding unserialized", file=sys.stderr)
                return fd
            if not waited:
                print("# tpu lock: held by another TPU process, "
                      "waiting...", file=sys.stderr)
                waited = True
            _t.sleep(5.0)


def build_envs(num_envs: int, boxes_per_env: int, backend: str,
               band: bool = True, broadphase: str = "sap",
               sap_window: int = 96, sap_hits: int = 8,
               segsort: bool = False,
               velocity_rel_tol: float = 0.0,
               position_rel_tol: float = 0.0):
    """Config E (BASELINE.json:11): independent scenes as one block-diagonal
    mega-scene (parallel/envs.py).

    Envs sit on a 2D band grid (y_bands=8): a pure x-line at 4096 envs
    would put bodies at |x| ~ 2M where the f32 ulp (0.25) exceeds the
    contact slop (0.01) and quantizes the physics.  Grid coordinates stay
    under ~21k (ulp 0.002)."""
    from phyx_tpu.parallel.envs import concat_envs
    total = num_envs * (boxes_per_env + 1) + 8
    cap = max(1024, -(-total // 1024) * 1024)
    # a 256-box pile is ~23 columns (~24 units) wide: ground_half 30 and
    # band_width 80 leave cross-band gaps; piles are ~15 tall -> y 400
    y_bands = 8 if num_envs >= 64 else 1
    x_count = -(-num_envs // y_bands)
    use_segsort = (segsort and band and y_bands > 1
                   and num_envs % y_bands == 0)
    if segsort and not use_segsort:
        # ADVICE r3 #2: a --segsort row that silently measured the flat
        # sort would mislabel an accept/reject comparison
        raise SystemExit(
            "--segsort requires banding on, num_envs >= 64 and "
            f"num_envs % {y_bands} == 0 (got envs={num_envs}, "
            f"band={band}); refusing to measure the flat path under a "
            "segsort label")
    # banded sweep keys (round 3): each y-band of envs sweeps in its own
    # x region — without this the tiled sweep's forward scan walks the
    # interleaved bodies of all y_bands at every x (they fail the y test
    # but cost the visit).  span must exceed the grid's x extent.
    span = 1.0
    while span < x_count * 80.0 + 256.0:
        span *= 2.0
    cfg = SimConfig(
        max_bodies=cap,
        max_pairs=max(1024,
                      (int(num_envs * boxes_per_env * 3.2) + 511)
                      // 512 * 512),
        broadphase=broadphase,
        sap_window=sap_window,
        sap_hits=sap_hits,
        solver_backend=backend,
        sweep_band_h=400.0 if (band and y_bands > 1) else 0.0,
        sweep_band_y0=-200.0,
        sweep_band_span=span if (band and y_bands > 1) else 0.0,
        # segmented per-band sort: needs the exact static band layout
        # (rows per env block, y-bands, x-cells) — see config.py
        sweep_band_rows=(boxes_per_env + 1) if use_segsort else 0,
        sweep_band_n=y_bands if use_segsort else 0,
        sweep_band_cols=(num_envs // y_bands) if use_segsort else 0,
        velocity_rel_tol=velocity_rel_tol,
        position_rel_tol=position_rel_tol,
    )
    builders = [scenes.pile(cfg, boxes_per_env, seed=s, ground_half=30.0)
                for s in range(num_envs)]
    mega, _, _ = concat_envs(builders, cfg, band_width=80.0,
                             y_bands=y_bands, band_height=400.0)
    return cfg, mega.build()


def build(scene: str, boxes: int, backend: str, broadphase: str = "sap",
          sap_window: int = 96, sap_hits: int = 8,
          pairs_per_box: float = 0.0, velocity_tol: float = 0.0,
          velocity_rel_tol: float = 0.0, position_rel_tol: float = 0.0):
    cap = 1
    while cap < boxes + 8:
        cap *= 2
    joint_scene = scene in ("chain", "bridge", "net")
    if pairs_per_box <= 0.0:
        # Budget policy: settled piles hold ~2.8 pairs/box (measured;
        # 27,758 pairs @ 10k after 450 frames); avalanche wedges compact
        # much denser (~5.6 at frame 400, round 1).  Headroom: 3.2x for
        # piles (measured overflow 0, and the buffers scale every
        # downstream vectorized stage: 3.2x vs 4x = 15.47 vs 14.28
        # steps/s @ 10k), 8x for avalanche.  Joint scenes
        # (collide-connected pairs excluded) carry far fewer contacts;
        # their budget trades contact slots for joint slots to stay in
        # the fused kernel's SMEM envelope.
        pairs_per_box = (2 if joint_scene
                         else 8 if scene == "avalanche" else 3.2)
    cfg = SimConfig(
        max_bodies=cap,
        # Rounded to 512 so contact slots hit the streamed kernel's
        # 1024-slot DMA granularity.
        max_pairs=max(1024, (int(boxes * pairs_per_box) + 511)
                      // 512 * 512),
        max_joints=cap if joint_scene else 0,
        broadphase=broadphase,
        sap_window=sap_window,
        sap_hits=sap_hits,
        num_colors=24,
        solver_backend=backend,
        velocity_tol=velocity_tol,
        velocity_rel_tol=velocity_rel_tol,
        position_rel_tol=position_rel_tol,
    )
    kw = {} if joint_scene else {"seed": 0}
    sb = getattr(scenes, scene)(cfg, boxes, **kw)
    return cfg, sb.build()


def _suggest_window(st, cfg=None) -> int:
    from phyx_tpu.broadphase import suggest_sap_window
    try:
        return int(suggest_sap_window(st.bodies, cfg=cfg))
    except Exception:
        return -1


# --- per-config physics-quality bars (VERDICT r4 #4) ---------------------
#
# Every bench row carries a pass/fail quality verdict, not just
# pair_overflow == 0.  The bar is max_penetration / box_half (box_half =
# 0.5 in every box scene, scenes.py), chosen per scene from measured
# settled states plus headroom — a regression that doubles penetration
# fails the bar long before the scene visually breaks:
#
#   pile / envs:  settled piles measure ratio 0.32 @ 10k (deepest bench
#                 pile; load grows with stack depth) and 0.025 at config
#                 E's 256-box envs.  Bar 0.6 (pile) / 0.2 (envs).
#   avalanche:    deep-wedge penetration (measured ratio 1.72 @ 100k
#                 frame 1000) — adjudication of load-inherent vs
#                 solver-fixable is a round-5 measurement task
#                 (BASELINE.md records the verdict).  Bar 2.0 = the
#                 measured value plus regression headroom, provisional
#                 until the adjudication lands.
#   chain/bridge/net: joint scenes — penetration is not the failure
#                 mode; the bar is the joint residual (anchor drift),
#                 measured 2.4e-3 settled -> bar 1e-2.
#
# Momentum drift is NOT a bench bar: every bench scene rests on a static
# ground, whose support impulses change system momentum by m*g*dt every
# frame BY DESIGN.  Momentum conservation is asserted where it is a real
# invariant — free-space scenes in tests/test_property.py.
_PEN_BARS = {"pile": 0.6, "envs": 0.2, "avalanche": 2.0}
_RESIDUAL_BARS = {"chain": 1e-2, "bridge": 1e-2, "net": 1e-2}
_BOX_HALF = 0.5


def quality_verdict(scene: str, st) -> dict:
    """Pass/fail physics-quality verdict for one bench row."""
    overflow = int(st.stats.pair_overflow)
    out = {"overflow_zero": overflow == 0}
    if scene in _PEN_BARS:
        ratio = float(st.stats.max_penetration) / _BOX_HALF
        out["penetration_ratio"] = round(ratio, 4)
        out["bar"] = _PEN_BARS[scene]
        out["pass"] = (overflow == 0) and ratio <= _PEN_BARS[scene]
    else:
        res = float(st.stats.residual)
        out["joint_residual"] = res
        out["bar"] = _RESIDUAL_BARS.get(scene, 1e-2)
        out["pass"] = (overflow == 0) and res <= out["bar"]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--boxes", type=int, default=10000)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--settle", type=int, default=300,
                    help="pre-measurement frames so the pile reaches its "
                         "settled, contact-rich state")
    ap.add_argument("--scene", default="pile",
                    choices=["pile", "avalanche", "chain", "bridge", "net",
                             "envs"])
    ap.add_argument("--backend", default="pallas",
                    choices=["xla", "pallas"])
    # sap_grid @ window 192 measured fastest at 10k (14.28 vs 13.29
    # steps/s for the Pallas emission kernel, overflow 0, 2026-08-16).
    # Default None = per-scene choice: sap_grid for single scenes, the
    # auto "sap" dispatch for --scene envs (tiled sweep at mega capacity).
    ap.add_argument("--broadphase", default=None,
                    choices=["sap", "sap_kernel", "sap_grid", "sap_window",
                             "sap_tiled", "n2"])
    ap.add_argument("--sap-window", type=int, default=192)
    ap.add_argument("--sap-hits", type=int, default=8)
    ap.add_argument("--pairs-per-box", type=float, default=0.0,
                    help="pair budget per box (0 = per-scene policy)")
    ap.add_argument("--velocity-tol", type=float, default=0.0,
                    help="residual-gated velocity early exit (0 = off; "
                         "changes solver semantics — reported numbers use "
                         "fixed iteration counts)")
    ap.add_argument("--rel-tol", type=float, default=0.0,
                    help="scale-normalized velocity gate: skip velocity "
                         "iterations once residual < rel_tol * max warm "
                         "impulse (0 = off)")
    ap.add_argument("--pos-rel-tol", type=float, default=0.0,
                    help="scale-normalized displacement gate (0 = off)")
    ap.add_argument("--autotune", action="store_true",
                    help="settle via tune.rollout_autotuned: budgets "
                         "(window/hits/pairs) self-size on overflow — no "
                         "hand-passed --sap-window needed")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (smoke tests only; numbers "
                         "are TPU-only). Env-var pins are consumed by the "
                         "sitecustomize — this uses jax.config.update.")
    ap.add_argument("--no-band", action="store_true",
                    help="disable banded sweep keys for --scene envs "
                         "(ablation; banding is the measured default)")
    ap.add_argument("--segsort", action="store_true",
                    help="per-band segmented body sorts for --scene envs "
                         "(requires banding; measurement candidate)")
    ap.add_argument("--envs", type=int, default=64,
                    help="env count for --scene envs (boxes = per-env size)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        acquire_tpu_lock()
        # Fail LOUDLY if the TPU worker is unreachable (2026-08-17: the
        # axon PJRT init blocks forever inside make_c_api_client when the
        # pool grants no chip — a silent multi-hour hang otherwise).
        # Probe in a subprocess (the blocked C call cannot be interrupted
        # in-process); three 10-min attempts before giving up.
        import subprocess
        import sys
        for attempt in range(3):
            try:
                subprocess.run(
                    [sys.executable, "-c", "import jax; jax.devices()"],
                    timeout=600, check=True, capture_output=True)
                break
            except (subprocess.TimeoutExpired,
                    subprocess.CalledProcessError) as e:
                print(f"# backend probe {attempt + 1}/3 failed: "
                      f"{type(e).__name__}", file=sys.stderr)
        else:
            print(json.dumps({
                "metric": "steps/sec @ 10000-box pile",
                "value": 0.0, "unit": "steps/sec", "vs_baseline": 0.0,
                "error": "TPU backend unavailable: PJRT init blocked/"
                         "failed for 3x600s (worker down — see CLAUDE.md "
                         "rule 8); no measurement possible"}))
            sys.exit(2)

    if args.scene == "envs":
        cfg, st = build_envs(args.envs, args.boxes, args.backend,
                             band=not args.no_band,
                             broadphase=args.broadphase or "sap",
                             sap_window=args.sap_window,
                             sap_hits=args.sap_hits,
                             segsort=args.segsort,
                             velocity_rel_tol=args.rel_tol,
                             position_rel_tol=args.pos_rel_tol)
    else:
        cfg, st = build(args.scene, args.boxes, args.backend,
                        args.broadphase or "sap_grid", args.sap_window,
                        args.sap_hits, args.pairs_per_box,
                        args.velocity_tol, args.rel_tol, args.pos_rel_tol)

    def fence(s):
        # jax.block_until_ready can return before remote execution finishes
        # on this PJRT stack (measured); fetching a live scalar cannot.
        return float(s.stats.residual)

    retunes = []
    if args.autotune:
        # Self-sizing settle (VERDICT r2 #5): overflow -> re-derive
        # window/hits/pair budgets from the measured state, continue.
        # Chunks stay <= 10 steps at 100k scale (longer device programs
        # crash the remote worker — CLAUDE.md rule 5).
        import sys

        from phyx_tpu.tune import rollout_autotuned
        chunk = 10 if args.boxes >= 50000 else min(args.steps, 50)
        st, cfg = rollout_autotuned(
            st, cfg, args.settle, chunk=chunk,
            on_retune=lambda a, b, done: (
                retunes.append({"frame": done, "window": b.sap_window,
                                "hits": b.sap_hits, "pairs": b.max_pairs}),
                print(f"# retune@{done}: window {a.sap_window}->"
                      f"{b.sap_window} hits {a.sap_hits}->{b.sap_hits} "
                      f"pairs {a.max_pairs}->{b.max_pairs}",
                      file=sys.stderr)))
        # compile the two measurement scan lengths on the final config
        st = rollout(st, cfg, args.steps)
        fence(st)
        st = rollout(st, cfg, 2 * args.steps)
        fence(st)
    else:
        # Compile both scan lengths, then settle the pile so the measured
        # window sees the full contact network, not free fall.
        st = rollout(st, cfg, args.steps)
        fence(st)
        st = rollout(st, cfg, 2 * args.steps)
        fence(st)
        for _ in range(max(0, -(-args.settle // args.steps) - 3)):
            st = rollout(st, cfg, args.steps)
        fence(st)

    # Two scan lengths cancel the fixed per-dispatch host/tunnel overhead:
    # per-step = (t(2n) - t(n)) / n.  A noisy pair (t2 <= t1) is re-measured
    # instead of silently swapping protocols (ADVICE r1 #3); only if every
    # retry stays under the noise floor do we report the long-run upper
    # bound, flagged as noise_floor in the JSON.
    noise_floor = False
    for attempt in range(3):
        t0 = time.perf_counter()
        st = rollout(st, cfg, args.steps)
        fence(st)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        st = rollout(st, cfg, 2 * args.steps)
        fence(st)
        t2 = time.perf_counter() - t0
        if t2 > t1:
            break
    dt = max(t2 - t1, 1e-9)
    if t2 <= t1:    # persistent noise floor: long-run upper bound, flagged
        dt = t2 / 2.0
        noise_floor = True

    steps_per_sec = args.steps / dt
    # secondary metric: contact pair-impulse iterations / sec / chip
    ncontacts = int(st.stats.num_contacts)
    pair_iters = steps_per_sec * ncontacts * cfg.velocity_iterations

    if args.scene == "envs":
        metric = (f"env-steps/sec @ {args.envs} envs x {args.boxes} boxes")
        value = round(steps_per_sec * args.envs, 2)
        unit = "env-steps/sec"
    else:
        metric = f"steps/sec @ {args.boxes}-box {args.scene}"
        value = round(steps_per_sec, 2)
        unit = "steps/sec"
    suggested_window = _suggest_window(st, cfg)
    print(json.dumps({
        "metric": metric,
        "value": value,
        "unit": unit,
        "vs_baseline": round(steps_per_sec / NORTH_STAR_STEPS_PER_SEC, 4),
        "extra": {
            "contacts": ncontacts,
            "pairs": int(st.stats.num_pairs),
            "pair_overflow": int(st.stats.pair_overflow),
            # per-cause breakdown (VERDICT r3 #3): window truncation /
            # hit-slot spill / pair-buffer drop / band crossers /
            # solver slab clamps
            "ovf": {k: int(getattr(st.stats, k)) for k in
                    ("ovf_window", "ovf_slots", "ovf_drop",
                     "ovf_band", "ovf_slab")},
            "pair_impulse_iters_per_sec": round(pair_iters),
            "max_penetration": float(st.stats.max_penetration),
            "residual": float(st.stats.residual),
            # per-config physics-quality bar (VERDICT r4 #4): a row is
            # only as good as the physics it ran
            "quality": quality_verdict(args.scene, st),
            "backend": jax.default_backend(),
            "solver_backend": args.backend,
            "noise_floor": noise_floor,
            # window-sizing policy readout on the measured (settled) state:
            # compare against --sap-window; resize if overflow fires
            "suggested_sap_window": suggested_window,
            # policy-drift check (VERDICT r4 weak #6): UNDER = the
            # configured window is smaller than the policy's suggestion
            # (truncation risk; ovf_window says whether it actually
            # fired), OVER = configured > 2x suggestion (wasted sweep
            # walk), ok otherwise.  Makes a drifting suggest_sap_window
            # policy visible in every bench row instead of being an
            # unread readout.
            "window_policy": ("UNDER" if cfg.sap_window < suggested_window
                              else "OVER" if cfg.sap_window
                              > 2 * suggested_window else "ok"),
            "autotune": ({"final_window": cfg.sap_window,
                          "final_hits": cfg.sap_hits,
                          "final_pairs": cfg.max_pairs,
                          "retunes": retunes}
                         if args.autotune else None),
        },
    }))


if __name__ == "__main__":
    main()
