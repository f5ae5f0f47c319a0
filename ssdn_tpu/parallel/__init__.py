"""Mesh + sharding helpers (SURVEY.md §2.3, §5.8).

The reference is single-GPU with no communication layer; the TPU-native
framework owns a mesh abstraction instead: a 1-D ``data`` axis for DP
training (batch sharded per chip, gradient psum inserted by XLA from the
sharding annotations — no hand-written collectives in the train path) and a
``tile`` view of the same devices for spatially-tiled inference with
explicit halo exchange (infer/tiled.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TILE_AXIS = "tile"


def make_mesh(devices: Optional[Sequence] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension over the mesh axis."""
    return NamedSharding(mesh, P(axis))


def jit_data_parallel(step_fn, mesh: Optional[Mesh], donate_state: bool = True):
    """jit a (state, batch) -> (state, metrics) step for DP execution.

    With a mesh: params/opt-state replicated, batch sharded on the data
    axis; XLA derives the gradient all-reduce over ICI from these
    annotations (SURVEY.md §5.8). Without a mesh: plain single-device jit.
    """
    donate = (0,) if donate_state else ()
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=donate)
    repl, data = replicated(mesh), batch_sharded(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=donate,
    )


def put_batch(batch, mesh: Optional[Mesh]):
    """Host batch -> device(s), sharded on the data axis when meshed."""
    if mesh is None:
        return jax.device_put(batch)
    return jax.device_put(batch, batch_sharded(mesh))
