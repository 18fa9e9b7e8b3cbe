"""Structured per-step metrics (SURVEY.md §5.5).

The reference shows microprofile counters on screen; the rebuild emits the
same observables as JSONL so long headless runs are greppable and the
validation criteria (penetration, residual, momentum drift) are recorded.

Metrics come from ``State.stats`` — produced ON DEVICE by the jitted step —
so logging forces a sync only at the cadence the caller chooses, never
inside the hot loop.
"""

from __future__ import annotations

import json
import time
from typing import IO, Optional

import jax.numpy as jnp
import numpy as np

from phyx_tpu.types import State


def snapshot(state: State) -> dict:
    """Host dict of the on-device counters (one sync)."""
    s = state.stats
    b = state.bodies
    dyn = (np.asarray(b.inv_mass) > 0) & np.asarray(b.active)
    vel = np.asarray(b.vel)[dyn]
    inv_m = np.asarray(b.inv_mass)[dyn]
    momentum = (vel / inv_m[:, None]).sum(axis=0) if len(vel) else np.zeros(2)
    return {
        "num_pairs": int(s.num_pairs),
        "num_contacts": int(s.num_contacts),
        "pair_overflow": int(s.pair_overflow),
        "halo_overflow": int(s.halo_overflow),
        # per-cause breakdown of pair_overflow (VERDICT r3 #3): which
        # budget to grow — window/tile_halo, sap_hits, max_pairs, band
        # layout, tile_halo (solver slabs) respectively
        "ovf_window": int(s.ovf_window),
        "ovf_slots": int(s.ovf_slots),
        "ovf_drop": int(s.ovf_drop),
        "ovf_band": int(s.ovf_band),
        "ovf_slab": int(s.ovf_slab),
        "max_penetration": float(s.max_penetration),
        "residual": float(s.residual),
        "momentum_x": float(momentum[0]),
        "momentum_y": float(momentum[1]),
        "kinetic_energy": float(
            (0.5 * (vel ** 2).sum(axis=-1) / inv_m).sum()) if len(vel) else 0.0,
    }


class MetricsLogger:
    """Appends one JSON line per ``log`` call."""

    def __init__(self, path_or_file, run_meta: Optional[dict] = None):
        self._file: IO = (open(path_or_file, "a")
                          if isinstance(path_or_file, str) else path_or_file)
        self._t0 = time.time()
        if run_meta:
            self._emit({"event": "run_start", **run_meta})

    def _emit(self, rec: dict):
        rec.setdefault("t_wall", round(time.time() - self._t0, 3))
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()

    def log(self, step_idx: int, state: State, **extra):
        self._emit({"event": "step", "step": step_idx,
                    **snapshot(state), **extra})

    def close(self):
        self._file.close()
