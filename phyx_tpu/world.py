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
        self._joints = []

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

    def add_revolute_joint(self, b1: int, b2: int, world_anchor) -> int:
        """Pin two bodies together at a world-space point (joints.py).
        Local anchors are derived from the bodies' CURRENT build poses."""
        return self._add_joint(1, b1, b2, world_anchor, world_anchor, 0.0)

    def add_distance_joint(self, b1: int, b2: int, anchor1, anchor2,
                           rest: Optional[float] = None) -> int:
        """Keep two world-space anchor points at fixed distance (defaults
        to their distance at build time)."""
        a1 = np.asarray(anchor1, np.float64)
        a2 = np.asarray(anchor2, np.float64)
        if rest is None:
            rest = float(np.linalg.norm(a2 - a1))
        return self._add_joint(2, b1, b2, a1, a2, rest)

    def _add_joint(self, kind, b1, b2, w1, w2, rest) -> int:
        if self.cfg.max_joints <= len(self._joints):
            raise ValueError(
                f"joint count exceeds max_joints={self.cfg.max_joints}")

        def local(body, w):
            r = self._rows[body]
            c, s = np.cos(r["angle"]), np.sin(r["angle"])
            d = np.asarray(w, np.float64) - r["pos"]
            return np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1]])

        self._joints.append(dict(
            kind=kind, b1=b1, b2=b2,
            a1=local(b1, w1), a2=local(b2, w2), rest=float(rest)))
        return len(self._joints) - 1

    def build(self) -> State:
        n = self.cfg.max_bodies
        k = len(self._rows)
        if k > n:
            raise ValueError(f"{k} bodies exceed max_bodies={n}")
        st = State.zeros(n, self.cfg.max_pairs, self.cfg.max_joints)
        if self._joints:
            j = st.joints
            nj = len(self._joints)

            def jcol(key, dtype=np.float32):
                return np.asarray([r[key] for r in self._joints], dtype)

            st = st.replace(joints=j.replace(
                kind=j.kind.at[:nj].set(jcol("kind", np.int32)),
                b1=j.b1.at[:nj].set(jcol("b1", np.int32)),
                b2=j.b2.at[:nj].set(jcol("b2", np.int32)),
                a1=j.a1.at[:nj].set(jcol("a1")),
                a2=j.a2.at[:nj].set(jcol("a2")),
                rest=j.rest.at[:nj].set(jcol("rest")),
            ))
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
        from phyx_tpu.oracle.engine import _UserJoint
        for j in self._joints:
            w.user_joints.append(_UserJoint(
                kind=j["kind"], b1=j["b1"], b2=j["b2"],
                a1=np.asarray(j["a1"], np.float64),
                a2=np.asarray(j["a2"], np.float64),
                rest=j["rest"], accum=np.zeros(2)))
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
                    residual=float(s.residual),
                    ovf_window=int(s.ovf_window),
                    ovf_slots=int(s.ovf_slots),
                    ovf_drop=int(s.ovf_drop),
                    ovf_band=int(s.ovf_band),
                    ovf_slab=int(s.ovf_slab))
