"""Checkpoint / resume: State pytree serialization (SURVEY.md §5.4).

The reference has no persistence (interactive demo); the rebuild needs it
for long stress runs (100k avalanche, BASELINE.json:10) and crash-resume.
The State is a pure pytree of arrays, so a checkpoint is just its leaves:

  * ``save`` / ``load``: single-file ``.npz`` — no extra deps, portable.
  * ``save_orbax`` / ``load_orbax``: orbax-checkpoint directory format for
    users already in that ecosystem (async, sharding-aware); optional.

Resuming is exact: the contact cache and joint accumulators ride along,
so warm starting continues seamlessly across the restore.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np

from phyx_tpu.types import State


def _flatten_with_paths(state: State):
    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p)))
                       for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save(path: str, state: State) -> None:
    """Write the full simulation state to one ``.npz`` file."""
    arrays, _ = _flatten_with_paths(state)
    np.savez_compressed(path, **arrays)


def load(path: str, like: State) -> State:
    """Restore a state saved by ``save``.  ``like`` supplies the pytree
    structure (build it with the same SimConfig capacities)."""
    with np.load(path) as data:
        arrays, treedef = _flatten_with_paths(like)
        leaves = []
        for key, ref in arrays.items():
            if key not in data:
                if key.startswith("stats/"):
                    # stats counters are observability, not physics:
                    # checkpoints written before a counter existed (e.g.
                    # the round-4 per-cause overflow split) restore it
                    # from ``like`` (zeros) instead of failing
                    leaves.append(jax.numpy.asarray(ref))
                    continue
                raise KeyError(f"checkpoint missing field {key!r}")
            arr = data[key]
            if arr.shape != ref.shape:
                raise ValueError(
                    f"checkpoint field {key!r} shape {arr.shape} != "
                    f"expected {ref.shape} (capacity mismatch — rebuild "
                    f"with the original SimConfig)")
            leaves.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_orbax(path: str, state: State) -> None:
    """Orbax directory checkpoint (optional dependency)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()


def load_orbax(path: str, like: State) -> State:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, like)
