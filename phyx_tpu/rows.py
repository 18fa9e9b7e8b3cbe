"""Row-gather indirection: XLA indexing on CPU, Pallas kernel on TPU.

XLA lowers `table[idx]` on TPU to a serial per-row loop (~20-40 ns/row,
measured — benches/micro_scatter.py); the Pallas scalar-loop gather runs at
~2 ns/row.  Every per-pair / per-contact body-state gather in the pipeline
goes through this helper so the backend choice is one config knob.
"""

from __future__ import annotations

import jax

from phyx_tpu.kernels.gather import gather_rows


def take_rows(table: jax.Array, idx: jax.Array, pallas: bool) -> jax.Array:
    """table (N, F), idx (K,) int32 (pre-clamped) -> (K, F)."""
    if pallas:
        return gather_rows(table, idx)
    return table[idx]
