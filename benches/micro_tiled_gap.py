"""Fenced micro: the tiled solver's per-visit gap vs the streamed kernel
(VERDICT r3 weak #5: settled config E reads ~74 ns/visit where the
streamed kernel's measured floor is ~51 — ~320 ms/step unattributed).

Protocol: the SAME settled 10k-pile state is solved by (a) the streamed
kernel (the 10k default), (b) the tiled kernel forced via the SMEM
predicate, at two slab geometries.  Same contacts, same visit count, same
sweep math — the deltas isolate:

  * streamed vs tiled @ 2 slabs  -> the tiled kernel's intrinsic
    per-visit overhead (window indexing, acc staging);
  * tiled @ 2 slabs vs @ 8 slabs -> the per-slab fixed cost
    (window DMA in/out, slab switch) paid n_slabs x passes times.

Timing per BASELINE.md integrity rules: rollout scan chaining, scalar
fence, (t(2n) - t(n)) / n.
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")


def measure(st, cfg, steps=50):
    from phyx_tpu.step import rollout

    def fence(s):
        return float(s.stats.residual)

    st = rollout(st, cfg, steps)
    fence(st)
    st = rollout(st, cfg, 2 * steps)
    fence(st)
    for _ in range(3):
        t0 = time.perf_counter()
        st = rollout(st, cfg, steps)
        fence(st)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        st = rollout(st, cfg, 2 * steps)
        fence(st)
        t2 = time.perf_counter() - t0
        if t2 > t1:
            break
    ms = (t2 - t1) / steps * 1e3
    return ms, st


def main():
    import os

    from bench import acquire_tpu_lock, build
    acquire_tpu_lock()
    from phyx_tpu import solver
    from phyx_tpu.step import rollout

    # PHYX_MICRO_BP=sap_tiled runs BOTH legs off the tiled sweep's
    # candidate stream (identical emission; the tiled legs then finalize
    # slab-major and run the round-5 slab-segmented kernel) — the
    # default sap_grid keeps the historical legacy-kernel protocol.
    bp = os.environ.get("PHYX_MICRO_BP", "sap_grid")
    cfg, st = build("pile", 10000, "pallas", bp, 192, 8)
    st = rollout(st, cfg, 100)
    for _ in range(2):
        st = rollout(st, cfg, 100)
    float(st.stats.residual)
    nvisits = int(st.stats.num_contacts) * (
        cfg.velocity_iterations + 1 + cfg.position_iterations)

    ms_s, st_s = measure(st, cfg)
    print(f"streamed: {ms_s:7.2f} ms/step  "
          f"({ms_s * 1e6 / nvisits:5.1f} ns/visit-equivalent of the "
          f"whole step; contacts {int(st.stats.num_contacts)})")

    del solver  # round 5: the forced backend replaced the SMEM
    #             predicate monkeypatch (cfg-only delta, no cache games)
    # (16512, 128) = ONE slab spanning the whole 16384-cap body table:
    # the tiled kernel becomes the streamed shell (window loads once,
    # since round 5 windows only DMA on slab CHANGE) — any remaining
    # gap vs streamed is pure per-block orchestration / visit
    # scheduling, not slab windows (VERDICT r4 #1 experiment a).
    # (16384, 8192) inflates per-pass window traffic by +33% at the
    # same slab count/blocks: if the gap grows proportionally, the
    # synchronous window DMA (start+wait, unoverlapped) is the cost —
    # per-pass window rows = n_slabs * (K + H), which is why 2 and 9
    # slabs measured identical (36864 rows/pass both).
    for stride, halo in ((16512, 128), (16384, 2048), (16384, 8192),
                         (2048, 2048)):
        c2 = cfg.replace(solver_backend="pallas_tiled",
                         tile_stride=stride, tile_halo=halo)
        ms_t, _ = measure(st, c2)
        rps = stride - 128
        n_slabs = -(-cfg.max_bodies // rps)
        print(f"tiled stride {stride:6d} ({n_slabs} slabs): "
              f"{ms_t:7.2f} ms/step  (+{ms_t - ms_s:6.2f} vs "
              f"streamed; +{(ms_t - ms_s) * 1e6 / nvisits:5.1f} "
              f"ns/visit)")


if __name__ == "__main__":
    main()
