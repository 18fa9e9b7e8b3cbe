"""Multi-chip mega-scene env scale-out (round 4, VERDICT r3 #6).

``sharded_mega_step`` runs one per-device mega-scene (a group of envs)
through the UNMODIFIED single-chip ``step`` under ``jax.shard_map`` — the
Pallas-backend multi-chip story the vmap path can't provide.  Env groups
are disjoint by construction, so the sharded trajectory must be
BIT-IDENTICAL to stepping each group's mega-scene alone on one device.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from phyx_tpu import scenes
from phyx_tpu.config import SimConfig
from phyx_tpu.parallel.envs import (concat_envs, concat_envs_grouped,
                                    sharded_mega_step)
from phyx_tpu.step import rollout

GROUPS = 4
ENVS = 8
BOXES = 6


def _mesh(n):
    devs = jax.devices()
    assert len(devs) >= n
    return Mesh(np.array(devs[:n]), axis_names=("env",))


def _cfg(backend):
    return SimConfig(max_bodies=64, max_pairs=256, broadphase="sap",
                     sap_window=16, solver_backend=backend)


def _builders(cfg):
    return [scenes.pile(cfg, BOXES, seed=s, ground_half=6.0)
            for s in range(ENVS)]


def test_sharded_mega_bit_identical_to_per_group():
    """Each group's sharded trajectory == its solo single-device rollout,
    bit for bit (same program, no collectives inside)."""
    cfg = _cfg("pallas")
    mesh = _mesh(GROUPS)
    builders = _builders(cfg)
    stacked, _, _ = concat_envs_grouped(builders, cfg, GROUPS,
                                        band_width=30.0)
    fn = sharded_mega_step(cfg, mesh, num_steps=10)
    out = fn(stacked)

    per = ENVS // GROUPS
    for g in range(GROUPS):
        mega, _, _ = concat_envs(builders[g * per:(g + 1) * per], cfg,
                                 band_width=30.0)
        ref = rollout(mega.build(), cfg, 10)
        got_pos = np.asarray(out.bodies.pos)[g]
        ref_pos = np.asarray(ref.bodies.pos)
        act = np.asarray(ref.bodies.active)
        assert (got_pos[act] == ref_pos[act]).all(), f"group {g} diverged"
        assert int(np.asarray(out.stats.num_contacts)[g]) \
            == int(ref.stats.num_contacts)
        assert int(np.asarray(out.stats.pair_overflow)[g]) == 0


def test_sharded_mega_output_stays_distributed():
    cfg = _cfg("pallas")
    mesh = _mesh(GROUPS)
    stacked, _, _ = concat_envs_grouped(_builders(cfg), cfg, GROUPS,
                                        band_width=30.0)
    stacked = jax.device_put(stacked, NamedSharding(mesh, P("env")))
    fn = sharded_mega_step(cfg, mesh, num_steps=2)
    out = fn(out := fn(stacked))        # two chained calls, no regather
    assert len(out.bodies.pos.sharding.device_set) == GROUPS


def test_sharded_mega_xla_backend_too():
    """The grouped path is backend-agnostic (XLA fallback shards the same
    way)."""
    cfg = _cfg("xla")
    mesh = _mesh(GROUPS)
    builders = _builders(cfg)
    stacked, _, _ = concat_envs_grouped(builders, cfg, GROUPS,
                                        band_width=30.0)
    out = sharded_mega_step(cfg, mesh, num_steps=5)(stacked)
    per = ENVS // GROUPS
    mega, _, _ = concat_envs(builders[:per], cfg, band_width=30.0)
    ref = rollout(mega.build(), cfg, 5)
    act = np.asarray(ref.bodies.active)
    assert (np.asarray(out.bodies.pos)[0][act]
            == np.asarray(ref.bodies.pos)[act]).all()


def test_grouped_builder_rejects_ragged_split():
    cfg = _cfg("xla")
    import pytest
    with pytest.raises(ValueError):
        concat_envs_grouped(_builders(cfg)[:7], cfg, GROUPS)
