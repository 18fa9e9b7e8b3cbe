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
