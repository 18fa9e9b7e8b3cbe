"""Row-gather indirection.

Measured on the real chip with fenced timings (benches/profile_prefix
protocol): XLA's native gather beats the serial Pallas scalar-loop gather
(kernels/gather.py) by ~8 ms/step at 10k boxes — XLA's row gather is not
the bottleneck it appeared to be under broken (early-returning)
block_until_ready timings.  All per-pair / per-contact body-state gathers
go through this helper so the choice stays one knob.
"""

from __future__ import annotations

import jax


def take_rows(table: jax.Array, idx: jax.Array, pallas: bool) -> jax.Array:
    """table (N, F), idx (K,) int32 (pre-clamped) -> (K, F)."""
    del pallas  # XLA native gather measured faster on TPU; kept for API
    return table[idx]
