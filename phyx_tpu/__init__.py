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
  - The whole ``Scene::Update`` equivalent is one jitted ``step`` with zero
    host round-trips, vmappable over batched scenes.
"""

from phyx_tpu.config import SimConfig
from phyx_tpu.types import Bodies, ContactCache, State, SolverStats

__version__ = "0.1.0"

__all__ = [
    "SimConfig",
    "Bodies",
    "ContactCache",
    "State",
    "SolverStats",
]
