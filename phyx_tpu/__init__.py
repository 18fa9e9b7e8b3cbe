"""phyx_tpu — a TPU-native 2D rigid-body physics engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the C++
SoA/SIMD engine ``zeux/phyx`` (see SURVEY.md for the structural analysis of
the reference; the reference mount was empty during the survey and this build
session, so parity claims cite SURVEY.md sections and BASELINE.json lines
rather than reference file:line).

Architecture (SURVEY.md §7):
  - Body and contact state are fixed-capacity SoA ``jnp`` arrays (pytrees).
  - Broadphase: sorted sweep-and-prune re-shaped for static shapes
    (sort by min-x + fixed neighbor window), with a masked O(N^2) fallback.
  - Narrowphase: batched box-box SAT + incident-face clipping producing
    fixed two-point manifolds with stable feature ids.
  - Contact cache: feature-id join across frames carries accumulated
    impulses -> warm starting (SURVEY.md §2 C5).
  - Solver: sequential-impulse with velocity ("impulses") and position
    ("displacement") passes.  phyx's conflict-free SIMD batches become
    graph-colored Gauss-Seidel sweeps; coloring runs fully on device
    (parallel Luby-style maximal-independent-set rounds).
  - User joints (revolute/distance) ride the same kernels as extra
    constraint rows with warm starting (joints.py).
  - The whole ``Scene::Update`` equivalent is one jitted ``step`` with zero
    host round-trips; multi-env batches run as one block-diagonal
    mega-scene (parallel/envs.py).
  - The hot path is three Pallas kernels: sweep&prune pair emission,
    row gathers, and the fused serial Gauss-Seidel contact+joint solver
    (all-SMEM variant, plus an HBM-streaming variant for large scenes).
"""

from phyx_tpu.config import SimConfig
from phyx_tpu.joints import Joints
from phyx_tpu.tune import resize, tune_config
from phyx_tpu.types import Bodies, ContactCache, State, SolverStats
from phyx_tpu.world import SceneBuilder, World

# NOTE: the step/rollout FUNCTIONS live in phyx_tpu.step; exporting them
# here would shadow the submodule attribute (`import phyx_tpu.step as m`
# would bind the function).  Import them as:
#   from phyx_tpu.step import step, rollout

__version__ = "0.1.0"

__all__ = [
    "SimConfig",
    "Bodies",
    "ContactCache",
    "Joints",
    "State",
    "SolverStats",
    "SceneBuilder",
    "World",
    "tune_config",
    "resize",
]
