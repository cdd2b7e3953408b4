"""Attached-blocks env (reference envs/rearrange/blocks_attached.py +
goals/attached_block_state.py): 8 blocks whose goal configuration is the
tightly-attached plus-shaped pattern, randomly permuted across blocks and
randomly placed in the placement area."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.envs.rearrange import blocks as blocks_lib
from robogym_tpu.envs.rearrange import goals as goals_lib
from robogym_tpu.envs.rearrange import simulation as sim_lib
from robogym_tpu.robot import composite as composite_lib

# the attached pattern in block-size units (attached_block_state.py:36-48):
#       [ ][ ]
#    [ ][ ][ ][ ]
#       [ ][ ]
BLOCK_CONFIG = np.array([
    [1, 0], [2, 0],
    [0, 1], [1, 1], [2, 1], [3, 1],
    [1, 2], [2, 2],
], np.float64)


class AttachedBlockStateGoal(goals_lib.ObjectStateGoal):
    def next_goal(self, key, active_mask, object_size, num_objects_used, d):
        O = self.idx.max_num_objects
        k_perm, k_off = jax.random.split(key)
        lo, hi = self.idx.placement_bounds(num_objects_used,
                                           self.used_table_portion)
        _, _, table_h = self.idx.table_dimensions()
        lo = jnp.asarray(lo, self.dtype)
        hi = jnp.asarray(hi, self.dtype)
        size = jnp.max(object_size[:, 0]).astype(self.dtype)  # half-extent
        cfg = jnp.asarray(BLOCK_CONFIG[:O], self.dtype) * 2.0 * size
        # randomly permute which block takes which pattern slot
        cfg = cfg[jax.random.permutation(k_perm, O)]
        span = cfg.max(axis=0)
        origin = jax.random.uniform(
            k_off, (2,), self.dtype,
            lo[:2] + size, jnp.maximum(hi[:2] - span - size, lo[:2] + size),
        )
        xy = origin[None, :] + cfg
        z = jnp.full((O,), table_h, self.dtype) + object_size[:, 2].astype(
            self.dtype
        )
        pos = jnp.concatenate([xy, z[:, None]], axis=1)
        park = jnp.asarray(sim_lib.PARK_POSITION, self.dtype)
        pos = jnp.where(active_mask[:, None], pos, park[None, :])
        quat = jnp.tile(jnp.asarray([1.0, 0, 0, 0], self.dtype), (O, 1))
        return {
            "obj_pos": pos, "obj_rot": quat,
            "goal_valid": jnp.ones((), bool),
        }


def make_env(constants=None, parameters=None, dtype=jnp.float32):
    cst_kw = dict(constants or {})
    if isinstance(cst_kw.get("goal_args"), dict):
        cst_kw["goal_args"] = tuple(sorted(cst_kw["goal_args"].items()))
    cst = blocks_lib.RearrangeEnvConstants(**cst_kw)
    par_kw = dict(parameters or {})
    sim_kw = dict(par_kw.pop("simulation_params", {}))
    sim_kw.setdefault("num_objects", 8)
    sim_kw.setdefault("max_num_objects", 8)
    sp = blocks_lib.RearrangeSimParameters(**sim_kw)
    rcp_kw = par_kw.pop("robot_control_params", None)
    rcp = (
        composite_lib.RobotControlParameters(**rcp_kw)
        if rcp_kw is not None else composite_lib.RobotControlParameters()
    )
    par = blocks_lib.RearrangeEnvParameters(
        simulation_params=sp, robot_control_params=rcp, **par_kw
    )
    env = blocks_lib.BlocksRearrangeEnv(cst, par, dtype=dtype)
    env.goal_gen = AttachedBlockStateGoal(
        env.idx, goals_lib.GoalArgs(), dtype=dtype,
        used_table_portion=sp.used_table_portion,
    )
    return env
