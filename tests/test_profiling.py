"""The library profiler (phyx_tpu/profiling.py) returns a sane breakdown."""

from phyx_tpu import scenes
from phyx_tpu.config import SimConfig
from phyx_tpu.profiling import STAGES, STAGES_JOINTS, profile_step
from phyx_tpu.step import step


def test_profile_step_structure():
    cfg = SimConfig(max_bodies=32, max_pairs=128, broadphase="n2",
                    solver_backend="pallas")
    st = scenes.pile(cfg, 10, seed=0).build()
    for _ in range(5):
        st = step(st, cfg)
    rows = profile_step(st, cfg, reps=3)
    assert [r["stage"] for r in rows] == STAGES + ["REAL full step"]
    assert all(isinstance(r["ms"], float) for r in rows)
    # cumulative prefix cost is reported for every stage row
    assert all("cum_ms" in r for r in rows[:-1])


def test_profile_step_joint_scene():
    """Joint scenes profile too (round 3): joint-pair exclusion rides in
    broadphase, joint_prepare is its own stage, solve is the fused
    contacts+joints step.solve_stage."""
    cfg = SimConfig(max_bodies=32, max_pairs=128, max_joints=8,
                    broadphase="n2", solver_backend="pallas")
    st = scenes.chain(cfg, 4).build()
    for _ in range(5):
        st = step(st, cfg)
    rows = profile_step(st, cfg, reps=3)
    assert [r["stage"] for r in rows] == STAGES_JOINTS + ["REAL full step"]
    assert all(isinstance(r["ms"], float) for r in rows)
