"""Parametric env wrappers (/root/reference/robogym/wrappers/parametric.py).

The reference's EnvParameterWrapper mutates `env.parameters.<name>` per reset
and relies on sim recreation to apply it. The TPU build's models are compiled
once, so parameter randomization that only affects Model arrays becomes a
per-episode Model transform (the same mechanism as the other randomization
wrappers) — here, cube size via geom_size/body_pos scaling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.wrappers.core import Transform


class RandomizedPerpendicularCubeSizeWrapper(Transform):
    """Randomize the size of the "perpendicular" (cubelet) cube
    (/root/reference/robogym/wrappers/parametric.py:24-38: per-reset
    `cube_size_multiplier` ~ U[cube_size_range]). Scales every cubelet
    geom and the cubelet body offsets by the sampled multiplier."""

    model_fields = ("geom_size", "body_pos")

    def __init__(self, env=None, cube_size_range=(0.95, 1.05),
                 object_name="cube"):
        self.cube_size_range = tuple(cube_size_range)
        gn = env.model.const.names["geom"]
        bn = env.model.const.names["body"]
        prefix = f"{object_name}:cubelet"
        self.geom_ids = np.asarray(
            sorted(i for n, i in gn.items() if n.startswith(prefix)), np.int32
        )
        self.body_ids = np.asarray(
            sorted(i for n, i in bn.items() if n.startswith(prefix)), np.int32
        )
        if not len(self.geom_ids):
            raise ValueError(f"no '{prefix}' geoms in this model")

    def model(self, tstate, m, key):
        scale = jax.random.uniform(
            key, (), m.geom_size.dtype,
            self.cube_size_range[0], self.cube_size_range[1],
        )
        m = m.replace(
            geom_size=m.geom_size.at[jnp.asarray(self.geom_ids)].mul(scale)
        )
        if len(self.body_ids):
            m = m.replace(
                body_pos=m.body_pos.at[jnp.asarray(self.body_ids)].mul(scale)
            )
        return m
