"""Tiled (slab-windowed) solver vs the fused kernel (100k-scale path)."""

import jax
import numpy as np

import phyx_tpu.solver as solver
import phyx_tpu.step as step_mod
from phyx_tpu import scenes
from phyx_tpu.config import SimConfig
from phyx_tpu.step import step


def test_tiled_matches_fused_loosely():
    """Slab sweep order differs from pair order, so agreement is
    convergence-level, not bitwise; routing overflow must be zero."""
    cfg = SimConfig(max_bodies=512, max_pairs=1024, broadphase="sap",
                    sap_window=48, solver_backend="pallas",
                    tile_stride=256, tile_halo=256)
    sb = scenes.pile(cfg, 300, seed=0)

    st_f = sb.build()
    for _ in range(40):
        st_f = step(st_f, cfg)

    orig_f = solver.pallas_smem_bytes
    orig_s = solver.pallas_streamed_smem_bytes
    solver.pallas_smem_bytes = lambda n, c: 10 ** 9
    solver.pallas_streamed_smem_bytes = lambda n: 10 ** 9
    jax.clear_caches()
    st_t = sb.build()
    try:
        for _ in range(40):
            st_t = step_mod.step(st_t, cfg)
    finally:
        solver.pallas_smem_bytes = orig_f
        solver.pallas_streamed_smem_bytes = orig_s
        jax.clear_caches()

    assert int(st_t.stats.pair_overflow) == 0
    assert float(st_t.stats.max_penetration) < 0.1
    d = np.abs(np.asarray(st_f.bodies.pos) - np.asarray(st_t.bodies.pos)).max()
    assert d < 0.05, f"tiled diverged from fused: {d}"
