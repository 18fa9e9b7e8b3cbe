"""Host-side scene construction and a convenient stepping wrapper.

The reference's scene setup is C++ code in main.cpp pushing RigidBody
structs into the Scene (SURVEY.md §2 C13/C14).  Here construction happens
on host in NumPy (it's not the hot path), producing the fixed-capacity
``State`` pytree that the jitted ``step`` owns from then on.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from phyx_tpu.config import SimConfig
from phyx_tpu.step import step as _step
from phyx_tpu.types import Bodies, ContactCache, SolverStats, State


class SceneBuilder:
    """Accumulates boxes on host, then ``build()``s the device State."""

    def __init__(self, cfg: SimConfig):
        self.cfg = cfg
        self._rows = []

    def add_box(self, pos, half_extent, angle: float = 0.0,
                density: float = 1.0, friction: float = 0.3,
                restitution: float = 0.0, static: bool = False,
                velocity=(0.0, 0.0), angvel: float = 0.0) -> int:
        """Mass/inertia formulas match the oracle (oracle/engine.py add_box):
        m = rho * 4 * hx * hy, I = m * (hx^2 + hy^2) / 3."""
        h = np.asarray(half_extent, np.float64)
        if static:
            inv_m = inv_i = 0.0
        else:
            m = density * 4.0 * h[0] * h[1]
            inertia = m * (h[0] ** 2 + h[1] ** 2) / 3.0
            inv_m, inv_i = 1.0 / m, 1.0 / inertia
        self._rows.append(dict(
            pos=np.asarray(pos, np.float64), h=h, angle=float(angle),
            inv_m=inv_m, inv_i=inv_i, friction=float(friction),
            restitution=float(restitution),
            vel=np.asarray(velocity, np.float64), angvel=float(angvel)))
        return len(self._rows) - 1

    @property
    def num_bodies(self) -> int:
        return len(self._rows)

    def build(self) -> State:
        n = self.cfg.max_bodies
        k = len(self._rows)
        if k > n:
            raise ValueError(f"{k} bodies exceed max_bodies={n}")
        st = State.zeros(n, self.cfg.max_pairs)
        if k == 0:
            return st
        b = st.bodies

        def col(key, dtype=np.float32):
            return np.asarray([r[key] for r in self._rows], dtype)

        angle = col("angle")
        rot = np.stack([np.cos(angle), np.sin(angle)], -1).astype(np.float32)
        bodies = b.replace(
            pos=b.pos.at[:k].set(col("pos")),
            rot=b.rot.at[:k].set(rot),
            vel=b.vel.at[:k].set(col("vel")),
            angvel=b.angvel.at[:k].set(col("angvel")),
            inv_mass=b.inv_mass.at[:k].set(col("inv_m")),
            inv_inertia=b.inv_inertia.at[:k].set(col("inv_i")),
            half_extent=b.half_extent.at[:k].set(col("h")),
            friction=b.friction.at[:k].set(col("friction")),
            restitution=b.restitution.at[:k].set(col("restitution")),
            active=b.active.at[:k].set(True),
        )
        return st.replace(bodies=bodies)

    def to_oracle(self):
        """Build the matching NumPy-oracle world (same bodies, same cfg)."""
        from phyx_tpu.oracle.engine import OracleWorld
        w = OracleWorld(self.cfg)
        for r in self._rows:
            w.add_box(r["pos"], r["h"], angle=r["angle"],
                      friction=r["friction"], restitution=r["restitution"],
                      static=(r["inv_m"] == 0.0),
                      velocity=r["vel"], angvel=r["angvel"])
            if r["inv_m"] > 0.0:
                w.inv_mass[-1] = r["inv_m"]
                w.inv_inertia[-1] = r["inv_i"]
        return w


class World:
    """Owns a State and steps it with the jitted program."""

    def __init__(self, cfg: SimConfig, state: Optional[State] = None):
        self.cfg = cfg
        self.state = state if state is not None else State.zeros(
            cfg.max_bodies, cfg.max_pairs)

    def step(self, n: int = 1) -> "World":
        for _ in range(n):
            self.state = _step(self.state, self.cfg)
        return self

    # -- host-side views (force a sync; for tests/demos, not the hot path) --
    def positions(self, k: Optional[int] = None) -> np.ndarray:
        p = np.asarray(self.state.bodies.pos)
        return p if k is None else p[:k]

    def stats(self) -> dict:
        s = self.state.stats
        return dict(num_pairs=int(s.num_pairs),
                    num_contacts=int(s.num_contacts),
                    pair_overflow=int(s.pair_overflow),
                    max_penetration=float(s.max_penetration),
                    residual=float(s.residual))
