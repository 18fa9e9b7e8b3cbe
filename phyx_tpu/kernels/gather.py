"""Row-gather kernel: out[k, :] = table[idx[k], :].

STATUS: unused by the step pipeline.  Fenced measurements (see
BASELINE.md "Measurement integrity") showed XLA's native row gather is
FASTER than this Mosaic scalar loop (~11 ns/row vs ~15 ns/row at 57k
rows); earlier numbers suggesting otherwise were artifacts of
block_until_ready returning early.  Kept as a reference implementation
of dynamic-row VMEM access from a Pallas kernel (the pattern the tiled
solver's body windows rely on).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("fill",))
def gather_rows(table: jax.Array, idx: jax.Array, fill: float | None = None
                ) -> jax.Array:
    """Gather rows of ``table`` (N, F) at ``idx`` (K,) int32 -> (K, F).

    Out-of-range indices are clamped by the caller's contract (pass
    pre-clamped indices); ``fill`` is unused for now but reserved.
    """
    n, f = table.shape
    k = idx.shape[0]

    def kern(idx_ref, tab_ref, out_ref):
        def one(i, _):
            out_ref[i, :] = tab_ref[idx_ref[i], :]
            return 0
        jax.lax.fori_loop(0, k, one, 0)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((k, f), table.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        # Large-K gathers (10k+ boxes: 80k+ rows) exceed the default
        # scoped-vmem stack budget; raise the per-kernel cap.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_use_interpret(),
    )(idx.astype(jnp.int32), table)
