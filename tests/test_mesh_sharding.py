"""Multi-chip env sharding on the 8-device virtual CPU mesh (SURVEY.md §4.7,
§5.8; VERDICT round-1 item #1).

conftest.py forces the CPU platform with
``--xla_force_host_platform_device_count=8``, so every test here runs on a
GENUINE 8-device mesh — the same code path ``__graft_entry__.dryrun_multichip``
exercises.  Envs are independent, so the sharded step must (a) keep its
output distributed (no implicit gathers), and (b) produce per-env
trajectories identical to stepping each env unsharded.

vmap requires the XLA solver backend (the SMEM Pallas kernels don't batch);
the mega-scene path (test_envs.py) covers the Pallas backend's scale-out.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from phyx_tpu import scenes
from phyx_tpu.config import SimConfig
from phyx_tpu.parallel.envs import make_env_batch, sharded_env_step
from phyx_tpu.step import step

CFG = SimConfig(max_bodies=32, max_pairs=256, broadphase="n2",
                solver_backend="xla")


def _mesh(n):
    devs = jax.devices()
    assert len(devs) >= n, f"conftest should give 8 CPU devices, got {len(devs)}"
    return Mesh(np.array(devs[:n]), axis_names=("env",))


def _envs(n):
    return [scenes.pile(CFG, 6, seed=s).build() for s in range(n)]


def test_mesh_has_eight_devices():
    assert len(jax.devices()) == 8
    assert jax.devices()[0].platform == "cpu"


def test_batch_is_sharded_over_mesh():
    mesh = _mesh(8)
    batch = make_env_batch(_envs(8), mesh=mesh)
    sh = batch.bodies.pos.sharding
    assert isinstance(sh, NamedSharding)
    assert len(sh.device_set) == 8
    # leading (env) axis split one env per device
    shard_shapes = {s.data.shape for s in batch.bodies.pos.addressable_shards}
    assert shard_shapes == {(1,) + batch.bodies.pos.shape[1:]}


def test_sharded_step_output_stays_distributed():
    mesh = _mesh(8)
    batch = make_env_batch(_envs(8), mesh=mesh)
    vstep = sharded_env_step(CFG, mesh)
    out = vstep(batch)
    jax.block_until_ready(out)
    assert len(out.bodies.pos.sharding.device_set) == 8


@pytest.mark.parametrize("n_dev,n_env", [(8, 8), (4, 8)])
def test_sharded_trajectories_match_unsharded(n_dev, n_env):
    """Per-env trajectories through the sharded vmap step equal solo
    (unsharded, unbatched) stepping of each env."""
    mesh = _mesh(n_dev)
    envs = _envs(n_env)
    batch = make_env_batch(envs, mesh=mesh)
    vstep = sharded_env_step(CFG, mesh)
    for _ in range(20):
        batch = vstep(batch)
    got_pos = np.asarray(batch.bodies.pos)
    got_vel = np.asarray(batch.bodies.vel)

    for e, st in enumerate(envs):
        for _ in range(20):
            st = step(st, CFG)
        np.testing.assert_allclose(got_pos[e], np.asarray(st.bodies.pos),
                                   atol=1e-5, rtol=0,
                                   err_msg=f"env {e} position diverged")
        np.testing.assert_allclose(got_vel[e], np.asarray(st.bodies.vel),
                                   atol=1e-5, rtol=0,
                                   err_msg=f"env {e} velocity diverged")


def test_uneven_envs_per_device():
    """8 envs over a 2-device mesh (4 envs per shard) still matches."""
    mesh = _mesh(2)
    envs = _envs(8)
    batch = make_env_batch(envs, mesh=mesh)
    vstep = sharded_env_step(CFG, mesh)
    out = vstep(batch)
    jax.block_until_ready(out)
    assert len(out.bodies.pos.sharding.device_set) == 2
    solo = step(envs[3], CFG)
    np.testing.assert_allclose(np.asarray(out.bodies.pos[3]),
                               np.asarray(solo.bodies.pos), atol=1e-5, rtol=0)


def test_sharded_jointed_envs_match_unsharded():
    """Jointed scenes scale out over the env mesh (VERDICT r2 #3
    knock-on): sharded vmap chains equal solo stepping."""
    import jax.numpy as jnp

    cfg = SimConfig(max_bodies=32, max_pairs=256, max_joints=16,
                    broadphase="n2", solver_backend="xla")
    mesh = _mesh(4)
    envs = [scenes.chain(cfg, 4).build() for _ in range(4)]
    envs = [st.replace(bodies=st.bodies.replace(
        pos=st.bodies.pos + jnp.float32(0.01 * e)))
        for e, st in enumerate(envs)]
    batch = make_env_batch(envs, mesh=mesh)
    vstep = sharded_env_step(cfg, mesh)
    for _ in range(20):
        batch = vstep(batch)
    got = np.asarray(batch.bodies.pos)
    for e, st in enumerate(envs):
        for _ in range(20):
            st = step(st, cfg)
        np.testing.assert_allclose(got[e], np.asarray(st.bodies.pos),
                                   atol=1e-5, rtol=0,
                                   err_msg=f"jointed env {e} diverged")
