"""Multi-device scaling (SURVEY.md §5.7-5.8).

The reference is a single-process shared-memory engine; its scaling ladder
was SIMD lanes × threads.  The TPU-native ladder:

  1. one chip's VPU lanes (the SIMD analog) — free via XLA/Pallas;
  2. ``vmap`` over independent scenes, batch-sharded across a device mesh
     (the data-parallel analog; envs.py);
  3. spatial domain sharding of one huge scene with halo exchange
     (the sequence/context-parallel analog; spatial.py, stretch goal).
"""

from phyx_tpu.parallel.envs import make_env_batch, sharded_env_step

__all__ = ["make_env_batch", "sharded_env_step"]
