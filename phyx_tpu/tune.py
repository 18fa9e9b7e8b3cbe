"""Capacity/window auto-tuning from scene statistics.

SURVEY.md §7 hard part #1 asks for budget sizing policies instead of
hand-picked constants.  The primitives exist (`broadphase.suggest_sap_window`,
`parallel.spatial.suggest_halo`, the measured pairs-per-box policy in
bench.py); this module packages them into one user-facing call:

    cfg2 = tune_config(state, cfg)          # measure state, resize budgets
    if cfg2 != cfg:
        state = resize(state, cfg2)         # re-capacity the pair cache

All measurement is host-side numpy on the CURRENT state — run it on a
representative (settled / densest) state, not at t=0: neighborhoods grow
as scenes compact (measured at 100k: a wedge that fit window 192 at frame
300 needed ~818 by frame 450 — BASELINE.md config D).  Re-tune between
rollout chunks if `stats.pair_overflow` fires (or run under
`debug.checked_rollout`, which turns overflow into a loud error).

Capacity changes alter jit shapes: every distinct output config compiles
its own step program (1-4 min on this stack, then cached).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from phyx_tpu.broadphase import suggest_sap_window
from phyx_tpu.config import SimConfig
from phyx_tpu.types import State


def suggest_pair_budget(state: State, margin: float = 1.6) -> int:
    """Pair-slot budget from the CURRENT live pair count, with headroom.

    The measured policy (BASELINE.md): settled piles hold ~2.8 pairs/box
    and 3.2x/box is safe, while avalanche wedges compact to ~5.6 —
    measuring the actual scene beats guessing the scene class.  Returns
    ``live_pairs * margin`` rounded UP to a 512 multiple (so contact
    slots 2*max_pairs hit the streamed kernel's 1024-slot DMA tiles),
    with a floor keyed to the active body count (3.2/box) for states
    measured before any contacts exist."""
    live = int(np.asarray(state.stats.num_pairs))
    act = int(np.asarray(state.bodies.active).sum())
    floor = int(act * 3.2)
    want = max(int(live * margin), floor, 512)
    return -(-want // 512) * 512


def tune_config(state: State, cfg: SimConfig, margin: float = 1.5,
                pair_margin: float = 1.6) -> SimConfig:
    """Resize the data-dependent budgets of ``cfg`` for ``state``.

    Adjusts (from host-side measurement of the current state):
      * ``sap_window``  — forward x-neighbor span percentile * margin
        (`broadphase.suggest_sap_window`), multiple of 8, >= 16;
      * ``sap_hits``    — MAX true forward AABB hits + 4, in [8, 64]
        (`broadphase.suggest_sap_hits`; hit-slot spill DROPS pairs, so
        a percentile under-sizes — the round-5 fence caught settled
        config E spilling 14k hits at the p99.9-derived H=8);
      * ``max_pairs``   — `suggest_pair_budget` (never shrinks below the
        current live pair count * margin).

    Capacities that encode scene topology (max_bodies, max_joints) and
    solver semantics (iteration counts, tolerances) are never touched.
    Returns a new frozen SimConfig; == cfg when nothing needs resizing.
    """
    window = int(suggest_sap_window(state.bodies, margin=margin, cfg=cfg))
    window = max(16, -(-window // 8) * 8)

    # true forward AABB hits, sized for the MAX (slot spill drops pairs;
    # cache-derived percentiles under-size — see docstring)
    from phyx_tpu.broadphase import suggest_sap_hits
    hits = int(suggest_sap_hits(state.bodies, cfg=cfg))
    hits = int(min(64, max(8, hits)))

    return dataclasses.replace(
        cfg,
        sap_window=window,
        sap_hits=hits,
        max_pairs=suggest_pair_budget(state, pair_margin),
    )


def rollout_autotuned(state: State, cfg: SimConfig, num_steps: int,
                      chunk: int = 10, margin: float = 1.5,
                      pair_margin: float = 1.6, on_retune=None):
    """Chunked, self-sizing rollout (round 3, VERDICT r2 #5).

    Runs ``chunk`` frames per device dispatch (rule: 100k-scale programs
    must stay under ~10 steps per dispatch or the remote worker dies);
    after each chunk a single scalar fetch reads the overflow counters.
    On ANY overflow (pair budget / sweep window / hit slots — all feed
    ``stats.pair_overflow`` — or spatial ``halo_overflow``) the budgets
    are re-derived from the CURRENT state via ``tune_config`` and the
    pair cache re-capacitied via ``resize``; the rollout continues with
    the new config (a new jit shape: one compile per distinct config,
    then cached).  If overflow persists with unchanged suggestions, the
    measurement margins escalate 1.5x per consecutive stuck chunk.

    Physics during an overflowing chunk ran with dropped pairs (that is
    what the counter means) — the autotuner bounds the damage to one
    chunk and sizes the NEXT chunks correctly, which is exactly the
    reference engine's resize-on-demand behavior (SURVEY.md §7 hard
    part #1) expressed in static-shape terms.

    Returns ``(state, cfg)`` — the final config may be larger than the
    input.  ``on_retune(old_cfg, new_cfg, frames_done)`` is called on
    every applied retune (bench.py logs it)."""
    from phyx_tpu.step import rollout

    done = 0
    stuck = 0
    while done < num_steps:
        n = min(chunk, num_steps - done)
        state = rollout(state, cfg, n)
        done += n
        ovf = int(np.asarray(state.stats.pair_overflow))
        hovf = int(np.asarray(state.stats.halo_overflow))
        if ovf == 0 and hovf == 0:
            stuck = 0
            continue
        esc = 1.5 ** stuck
        cfg2 = tune_config(state, cfg, margin=margin * esc,
                           pair_margin=pair_margin * esc)
        # Cause-targeted growth (round 4 — the per-cause counters say
        # WHICH budget overflowed): budgets whose counter reads 0 keep
        # their current value instead of being re-derived, so e.g. a
        # pure pair-buffer overflow never recompiles the sweep window.
        s = state.stats
        cause = {k: int(np.asarray(getattr(s, k)))
                 for k in ("ovf_window", "ovf_slots", "ovf_drop",
                           "ovf_band", "ovf_slab")}
        if cause["ovf_window"] == 0:
            cfg2 = dataclasses.replace(cfg2, sap_window=cfg.sap_window)
        if cause["ovf_slots"] == 0:
            cfg2 = dataclasses.replace(cfg2, sap_hits=cfg.sap_hits)
        if cause["ovf_drop"] == 0:
            cfg2 = dataclasses.replace(cfg2, max_pairs=cfg.max_pairs)
        # tiled-sweep window truncation and solver slab clamps both mean
        # the slab halo is too small for the x-rank spread: double it
        # (the tiled kernel rounds to 1024 internally; stay 128-aligned)
        if cause["ovf_slab"] > 0 or (
                cause["ovf_window"] > 0 and cfg.broadphase in
                ("sap_tiled", "sap")):
            cfg2 = dataclasses.replace(
                cfg2, tile_halo=max(cfg2.tile_halo, cfg.tile_halo * 2))
        # never shrink mid-rollout: overflow means "bigger", and shrink
        # thrash would recompile every other chunk
        cfg2 = dataclasses.replace(
            cfg2,
            sap_window=max(cfg2.sap_window, cfg.sap_window),
            sap_hits=max(cfg2.sap_hits, cfg.sap_hits),
            max_pairs=max(cfg2.max_pairs, cfg.max_pairs),
        )
        if cfg2 == cfg:
            stuck += 1
            continue
        if on_retune is not None:
            on_retune(cfg, cfg2, done)
        state = resize(state, cfg2)
        cfg = cfg2
        stuck = 0
    return state, cfg


def resize(state: State, cfg: SimConfig) -> State:
    """Re-capacity ``state``'s pair cache to ``cfg.max_pairs``.

    Only the contact cache depends on the pair budget (bodies and joints
    are untouched).  The cache is lex-sorted with EMPTY slots last, so
    growing pads with EMPTY and shrinking truncates dead slots; live
    entries are only lost if the new budget is below the live pair count
    (`tune_config` never suggests that).  Warm-start impulses carry over.
    """
    import jax.numpy as jnp

    from phyx_tpu.types import ContactCache

    P = cfg.max_pairs
    c = state.cache

    def fit(x, fill):
        if x.shape[0] >= P:
            return x[:P]
        pad = jnp.full((P - x.shape[0],) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, pad])

    cache = ContactCache(
        pi=fit(c.pi, ContactCache.EMPTY),
        pj=fit(c.pj, ContactCache.EMPTY),
        fid=fit(c.fid, -1),
        normal_impulse=fit(c.normal_impulse, 0.0),
        friction_impulse=fit(c.friction_impulse, 0.0),
    )
    return state.replace(cache=cache)
