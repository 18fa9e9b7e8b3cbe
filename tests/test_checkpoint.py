"""Checkpoint/resume and metrics (SURVEY.md §5.4/5.5)."""

import json
import os

import numpy as np

from phyx_tpu import scenes
from phyx_tpu.checkpoint import load, save
from phyx_tpu.config import SimConfig
from phyx_tpu.metrics import MetricsLogger, snapshot
from phyx_tpu.step import rollout

CFG = SimConfig(max_bodies=64, max_pairs=256, max_joints=8,
                broadphase="n2", solver_backend="pallas")


def test_checkpoint_roundtrip_exact(tmp_path):
    """Resume is exact: stepping (save -> load -> step) equals stepping
    straight through — the cache and joint accumulators ride along."""
    sb = scenes.chain(CFG, 3)
    st = sb.build()
    st = rollout(st, CFG, 30)

    p = str(tmp_path / "ck.npz")
    save(p, st)
    st_resumed = load(p, sb.build())

    a = rollout(st, CFG, 20)
    b = rollout(st_resumed, CFG, 20)
    np.testing.assert_array_equal(np.asarray(a.bodies.pos),
                                  np.asarray(b.bodies.pos))
    np.testing.assert_array_equal(np.asarray(a.cache.normal_impulse),
                                  np.asarray(b.cache.normal_impulse))
    np.testing.assert_array_equal(np.asarray(a.joints.accum),
                                  np.asarray(b.joints.accum))


def test_checkpoint_capacity_mismatch_rejected(tmp_path):
    st = scenes.pile(CFG, 10).build()
    p = str(tmp_path / "ck.npz")
    save(p, st)
    other = SimConfig(max_bodies=128, max_pairs=256, broadphase="n2")
    import pytest
    from phyx_tpu.types import State
    with pytest.raises(ValueError):
        load(p, State.zeros(other.max_bodies, other.max_pairs))


def test_checkpoint_roundtrip_orbax(tmp_path):
    """Orbax directory-format path (VERDICT r2 #10): exact resume at two
    different capacities."""
    from phyx_tpu.checkpoint import load_orbax, save_orbax

    for cap, pairs in ((64, 256), (128, 512)):
        cfg = CFG.replace(max_bodies=cap, max_pairs=pairs)
        sb = scenes.chain(cfg, 3)
        st = sb.build()
        st = rollout(st, cfg, 30)
        p = str(tmp_path / f"orbax_{cap}")
        save_orbax(p, st)
        st_resumed = load_orbax(p, sb.build())
        a = rollout(st, cfg, 10)
        b = rollout(st_resumed, cfg, 10)
        np.testing.assert_array_equal(np.asarray(a.bodies.pos),
                                      np.asarray(b.bodies.pos))
        np.testing.assert_array_equal(np.asarray(a.joints.accum),
                                      np.asarray(b.joints.accum))


def test_checkpoint_spatial_cycle(tmp_path):
    """Checkpoint a sharded spatial run: unshard -> save -> load ->
    shard_spatial resumes within convergence-level tolerance of the
    uncheckpointed sharded run (cut contacts are additive-Schwarz, and
    both sides of the comparison restart their caches empty at the
    unshard/reshard point, so the trajectories agree to warm-start
    rebuild tolerance)."""
    import jax
    from jax.sharding import Mesh

    from phyx_tpu.parallel.spatial import (shard_spatial, spatial_rollout,
                                           unshard)

    cfg = SimConfig(max_bodies=128, max_pairs=1024, broadphase="n2",
                    solver_backend="pallas")
    st = scenes.pile(cfg, 60, seed=3).build()
    st = rollout(st, cfg, 20)

    D = 4
    mesh = Mesh(jax.devices("cpu")[:D], ("x",))
    sstate, lcfg, meta = shard_spatial(st, cfg, D, halo=16)
    sstate = spatial_rollout(sstate, lcfg, mesh, meta, 10)

    glob = unshard(sstate, meta, st)
    p = str(tmp_path / "spatial.npz")
    save(p, glob)
    glob2 = load(p, scenes.pile(cfg, 60, seed=3).build())

    # both arms re-shard from their (identical) global states
    sa, la, ma = shard_spatial(glob, cfg, D, halo=16)
    sb_, lb, mb = shard_spatial(glob2, cfg, D, halo=16)
    sa = spatial_rollout(sa, la, mesh, ma, 10)
    sb_ = spatial_rollout(sb_, lb, mesh, mb, 10)
    np.testing.assert_array_equal(np.asarray(sa.bodies.pos),
                                  np.asarray(sb_.bodies.pos))


def test_metrics_jsonl(tmp_path):
    st = scenes.pile(CFG, 20).build()
    st = rollout(st, CFG, 30)
    p = str(tmp_path / "m.jsonl")
    log = MetricsLogger(p, dict(scene="pile"))
    log.log(30, st)
    log.close()
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["event"] == "run_start"
    rec = lines[1]
    assert rec["num_contacts"] > 0
    assert rec["max_penetration"] < 0.1
    assert "kinetic_energy" in rec and "momentum_x" in rec
