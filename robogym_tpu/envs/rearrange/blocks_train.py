"""Blocks training env (reference envs/rearrange/blocks_train.py:1-63):
the blocks world with the `train` goal generator (curriculum mixture of
rearrange / pick-up / stacking goals, goals/train_state.py) and optional
independent per-axis cuboid scale randomization (`use_cuboid`).

TPU-first: the per-reset cuboid rescale writes `geom_size`/`body_mass`/
`body_inertia` model fields instead of editing XML."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.envs.rearrange import blocks as blocks_lib


@dataclasses.dataclass(frozen=True)
class BlockTrainEnvConstants(blocks_lib.RearrangeEnvConstants):
    goal_generation: str = "train"
    use_cuboid: bool = False


@dataclasses.dataclass(frozen=True)
class BlockTrainEnvParameters(blocks_lib.RearrangeEnvParameters):
    # exp-uniform per-axis scale range (common/base.py:203-204)
    object_scale_low: float = 0.0
    object_scale_high: float = 0.0


class BlockTrainRearrangeEnv(blocks_lib.BlocksRearrangeEnv):
    def _reset_model_fields(self, key: jax.Array):
        fields, sizes, group_ids = super()._reset_model_fields(key)
        if not self.constants.use_cuboid:
            return fields, sizes, group_ids
        k = jax.random.fold_in(key, 17)
        O = self.max_num_objects
        # scale is sampled per GROUP so duplicates stay identical
        # (common/base.py:570,594,610): draw per slot, gather by group id
        group_scales = jnp.exp(jax.random.uniform(
            k, (O, 3), self.dtype,
            -self.parameters.object_scale_low,
            self.parameters.object_scale_high,
        ))
        scales = group_scales[jnp.clip(group_ids, 0, O - 1)]
        new_sizes = sizes * scales
        vol_scale = jnp.prod(scales, axis=-1)
        gids = jnp.asarray(self.idx.object_geom_ids)
        bids = jnp.asarray(self.idx.object_body_ids)
        fields = dict(fields or {})
        fields["geom_size"] = self.model.geom_size.at[gids].set(new_sizes)
        fields["body_mass"] = self.model.body_mass.at[bids].multiply(vol_scale)
        # box inertia scales with m * (a^2 + b^2) per axis
        s2 = new_sizes ** 2
        base_m = self.model.body_mass[bids] * vol_scale
        inertia = jnp.stack([
            base_m / 3.0 * (s2[:, 1] + s2[:, 2]),
            base_m / 3.0 * (s2[:, 0] + s2[:, 2]),
            base_m / 3.0 * (s2[:, 0] + s2[:, 1]),
        ], axis=-1)
        fields["body_inertia"] = self.model.body_inertia.at[bids].set(inertia)
        return fields, new_sizes, group_ids


def make_env(constants=None, parameters=None, dtype=jnp.float32):
    cst_kw = dict(constants or {})
    if isinstance(cst_kw.get("goal_args"), dict):
        cst_kw["goal_args"] = tuple(sorted(cst_kw["goal_args"].items()))
    cst = BlockTrainEnvConstants(**cst_kw)
    par_kw = dict(parameters or {})
    sp = blocks_lib.RearrangeSimParameters(
        **par_kw.pop("simulation_params", {})
    )
    from robogym_tpu.robot import composite as composite_lib

    rcp_kw = par_kw.pop("robot_control_params", None)
    rcp = (
        composite_lib.RobotControlParameters(**rcp_kw)
        if rcp_kw is not None else composite_lib.RobotControlParameters()
    )
    par = BlockTrainEnvParameters(
        simulation_params=sp, robot_control_params=rcp, **par_kw
    )
    return BlockTrainRearrangeEnv(cst, par, dtype=dtype)
