"""Multi-env batching (BASELINE.json:11 config E).

Envs in the mega-scene live in disjoint f32 x-bands; chaotic pile dynamics
amplify the band offset's rounding, so parity with solo runs is checked on
physical invariants (block-diagonality, settledness, penetration), not on
bitwise trajectories.
"""

import numpy as np

from phyx_tpu import scenes
from phyx_tpu.config import SimConfig
from phyx_tpu.parallel.envs import concat_envs, env_positions
from phyx_tpu.step import rollout

CFG = SimConfig(max_bodies=256, max_pairs=2048, broadphase="sap",
                sap_window=32, solver_backend="pallas")


def _mega(E, boxes=20, band=300.0):
    builders = [scenes.pile(CFG, boxes, seed=s, ground_half=100.0)
                for s in range(E)]
    mega, env_slices, offsets = concat_envs(builders, CFG, band_width=band)
    return mega.build(), env_slices, offsets


def test_concat_envs_block_diagonal():
    """No cross-env interaction: every env's bodies stay inside its band
    and the pair budget sees no overflow."""
    st, env_slices, offsets = _mega(4)
    st = rollout(st, CFG, 80)
    assert int(st.stats.pair_overflow) == 0
    for e, s in enumerate(env_slices):
        xs = np.asarray(st.bodies.pos[s, 0]) - offsets[e, 0]
        assert np.abs(xs).max() < 100.0, f"env {e} escaped its band"


def test_concat_envs_each_env_settles():
    """Every env behaves like a healthy solo pile: boxes rest on the
    ground (y >= box half), penetration bounded, kinetic energy decayed."""
    st, env_slices, offsets = _mega(4)
    st = rollout(st, CFG, 200)
    assert float(st.stats.max_penetration) < 0.05
    for e, s in enumerate(env_slices):
        ys = np.asarray(st.bodies.pos[s, 1])[1:]   # skip ground
        assert ys.min() > 0.4, f"env {e}: box fell through ground"
        vs = np.asarray(st.bodies.vel[s])[1:]
        assert np.abs(vs).max() < 0.7, f"env {e}: not settling"


def test_concat_envs_local_positions_roundtrip():
    st, env_slices, offsets = _mega(3)
    locals_ = env_positions(st, env_slices, offsets)
    assert len(locals_) == 3
    for loc in locals_:
        assert np.abs(loc[:, 0]).max() < 150.0


def test_concat_envs_band_grid():
    """2D band grid (y_bands > 1): envs stay in their own cells, no
    cross-env pairing (the config-E layout at 4096 envs, where a pure
    x-line would exceed f32 precision)."""
    builders = [scenes.pile(CFG, 10, seed=s, ground_half=50.0)
                for s in range(8)]
    from phyx_tpu.parallel.envs import concat_envs
    mega, env_slices, offsets = concat_envs(
        builders, CFG, band_width=150.0, y_bands=4, band_height=300.0)
    st = mega.build()
    st = rollout(st, CFG, 80)
    assert int(st.stats.pair_overflow) == 0
    assert float(st.stats.max_penetration) < 0.05
    pos = np.asarray(st.bodies.pos)
    for e, s in enumerate(env_slices):
        local = pos[s] - offsets[e]
        assert np.abs(local[:, 0]).max() < 75.0, f"env {e} left its x band"
        assert -25.0 < local[:, 1].min() and local[:, 1].max() < 150.0, \
            f"env {e} left its y band"
