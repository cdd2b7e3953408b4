"""Duplicate-blocks env (reference envs/rearrange/blocks_duplicate.py): all
blocks belong to ONE object group and share a single color."""

import jax
import jax.numpy as jnp

from robogym_tpu.envs.rearrange import blocks as blocks_lib


class DuplicateBlockRearrangeEnv(blocks_lib.BlocksRearrangeEnv):
    def _sample_object_groups(self, key):
        O = self.max_num_objects
        group_ids = jnp.zeros(O, jnp.int32)
        color = jnp.concatenate(
            [jax.random.uniform(key, (3,), self.dtype),
             jnp.ones(1, self.dtype)]
        )
        return group_ids, jnp.tile(color, (O, 1))


def make_env(constants=None, parameters=None, dtype=jnp.float32):
    cst_kw = dict(constants or {})
    if isinstance(cst_kw.get("goal_args"), dict):
        cst_kw["goal_args"] = tuple(sorted(cst_kw["goal_args"].items()))
    cst = blocks_lib.RearrangeEnvConstants(**cst_kw)
    par_kw = dict(parameters or {})
    sp = blocks_lib.RearrangeSimParameters(**par_kw.pop("simulation_params", {}))
    from robogym_tpu.robot import composite as composite_lib

    rcp_kw = par_kw.pop("robot_control_params", None)
    rcp = (
        composite_lib.RobotControlParameters(**rcp_kw)
        if rcp_kw is not None else composite_lib.RobotControlParameters()
    )
    par = blocks_lib.RearrangeEnvParameters(
        simulation_params=sp, robot_control_params=rcp, **par_kw
    )
    return DuplicateBlockRearrangeEnv(cst, par, dtype=dtype)
