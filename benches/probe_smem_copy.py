"""Feasibility + bandwidth probe: SMEM->SMEM async_copy in a Mosaic
kernel (the window-overlap design for the tiled solver hands the slab
halo between buffers with SMEM-local copies — viable only if the local
DMA supports SMEM->SMEM at high bandwidth).

Also times HBM->SMEM DMA bandwidth at window-sized transfers — the
number the tiled kernel's synchronous window round trips are paying
today (fence context for micro_tiled_gap's 1-slab/inflated-halo legs).

Runs in seconds; safe to run while other queue work is idle.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

ROWS = 8192          # window-sized: 8192 rows * 8 f32 = 256 KB


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("reps", "mode"))
def bounce(x: jax.Array, reps: int, mode: str) -> jax.Array:
    """mode="smem": HBM->SMEM once, then reps SMEM->SMEM bounces A->B->A,
    then SMEM->HBM.  mode="hbm": reps HBM->SMEM + SMEM->HBM round trips.
    Output depends on every copy (the final buffer is written back)."""
    n = x.shape[0]

    def kern(x_hbm, out_hbm, a, b, sem):
        cp = pltpu.make_async_copy(x_hbm, a, sem)
        cp.start(); cp.wait()
        if mode == "smem":
            def body(i, _):
                c1 = pltpu.make_async_copy(a, b, sem)
                c1.start(); c1.wait()
                c2 = pltpu.make_async_copy(b, a, sem)
                c2.start(); c2.wait()
                return 0
            jax.lax.fori_loop(0, reps, body, 0)
        else:
            def body(i, _):
                c1 = pltpu.make_async_copy(a, out_hbm, sem)
                c1.start(); c1.wait()
                c2 = pltpu.make_async_copy(out_hbm, a, sem)
                c2.start(); c2.wait()
                return 0
            jax.lax.fori_loop(0, reps, body, 0)
        cp = pltpu.make_async_copy(a, out_hbm, sem)
        cp.start(); cp.wait()

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SMEM((n,), jnp.float32),
                        pltpu.SMEM((n,), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=_use_interpret(),
    )(x)


@functools.partial(jax.jit, static_argnames=("n",))
def ring_probe(x: jax.Array, offs: jax.Array, n: int) -> jax.Array:
    """Feasibility: DMA HBM->SMEM and SMEM->HBM at TRACED SMEM offsets
    (the ring-window design needs both; CLAUDE.md's 'scratch cannot be
    indexed by traced values' hazard is about selecting WHICH scratch
    ref — scalar loads already use traced indices — but traced pl.ds
    DMA offsets into SMEM are unproven on real TPU; interpret mode
    hides Mosaic restrictions).

    Copies x[0:1024] -> scr[o0:o0+1024] and x[1024:2048] ->
    scr[o1:o1+1024] (o0, o1 read from SMEM input, 1024-aligned), then
    scr[o0...] -> out[0:1024], scr[o1...] -> out[1024:2048]; out should
    equal x[0:2048] bit-exactly."""

    def kern(off_ref, x_hbm, out_hbm, scr, sem):
        o0 = off_ref[0]
        o1 = off_ref[1]
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, 1024)],
            scr.at[pl.ds(pl.multiple_of(o0, 1024), 1024)], sem)
        cp.start(); cp.wait()
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(1024, 1024)],
            scr.at[pl.ds(pl.multiple_of(o1, 1024), 1024)], sem)
        cp.start(); cp.wait()
        cp = pltpu.make_async_copy(
            scr.at[pl.ds(pl.multiple_of(o0, 1024), 1024)],
            out_hbm.at[pl.ds(0, 1024)], sem)
        cp.start(); cp.wait()
        cp = pltpu.make_async_copy(
            scr.at[pl.ds(pl.multiple_of(o1, 1024), 1024)],
            out_hbm.at[pl.ds(1024, 1024)], sem)
        cp.start(); cp.wait()

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2048,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SMEM((n,), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=_use_interpret(),
    )(offs, x)


def main():
    from bench import acquire_tpu_lock
    if jax.default_backend() == "tpu" or not _use_interpret():
        acquire_tpu_lock()

    # --- ring feasibility first (cheap; decides the window design) ---
    xr = jnp.arange(4096, dtype=jnp.float32)
    for o0, o1 in ((2048, 0), (1024, 3072)):
        offs = jnp.array([o0, o1], jnp.int32)
        y = ring_probe(xr, offs, 4096)
        ok = bool(jnp.array_equal(y[:2048], xr[:2048]))
        print(f"ring traced-offset DMA (o0={o0}, o1={o1}): "
              f"{'OK' if ok else 'CORRUPTED'}", flush=True)

    n = ROWS * 8
    x = jnp.arange(n, dtype=jnp.float32)
    for mode in ("smem", "hbm"):
        y = bounce(x, 1, mode)
        assert float(y[12345]) == 12345.0, "copy chain corrupted data"
        for reps in (64, 128):          # warm: compile both shapes untimed
            float(bounce(x, reps, mode)[0])
        for reps in (64, 128):
            t0 = time.perf_counter()
            y = bounce(x, reps, mode)
            f = float(y[0])
            dt = time.perf_counter() - t0
            if reps == 64:
                t64 = dt
        per = (dt - t64) / 64 / 2        # s per single copy
        bw = n * 4 / per / 1e9
        print(f"{mode}: {per * 1e6:8.2f} us per {n * 4 // 1024} KB copy "
              f"({bw:6.1f} GB/s)  [delta of 128 vs 64 reps]", flush=True)


if __name__ == "__main__":
    main()
