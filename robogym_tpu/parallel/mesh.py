"""Device mesh / sharding utilities — the framework's distributed backbone.

The reference has no parallelism (SURVEY.md §2.3: one MjSim per process,
empty `synchronization_points`, simulation_interface.py:63,186-189). The TPU
build's scaling axes are:

  * `dp` — the env batch axis, sharded over chips (embarrassingly parallel
    rollouts; the analogue of running many robogym processes)
  * `tp` — tensor parallelism for the colocated learner's wide layers

Collectives ride ICI via standard GSPMD (`psum`/`pmean` inside shard_map,
NamedSharding on batch arrays); nothing NCCL-like is hand-written.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    tp: int = 1,
    axis_names: Tuple[str, str] = ("dp", "tp"),
) -> Mesh:
    """Build a (dp, tp) mesh over the first n_devices devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n % tp == 0, (n, tp)
    arr = np.asarray(devices[:n]).reshape(n // tp, tp)
    return Mesh(arr, axis_names)


def shard_env_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Place a batched env-state pytree with the batch axis sharded on dp."""
    sharding = NamedSharding(mesh, P(axis))

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sharding)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. the Model) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
