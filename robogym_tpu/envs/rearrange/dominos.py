"""Dominos env (reference envs/rearrange/dominos.py:1-55 +
simulation/dominos.py): skewed (domino-proportioned) blocks; goals place
them along a circular arc (`is_holdout=True`, DominoStateGoal) or follow
the train-state curriculum with mod-180 rotation distance."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from robogym_tpu.envs.rearrange import blocks as blocks_lib
from robogym_tpu.envs.rearrange import goals as goals_lib
from robogym_tpu.robot import composite as composite_lib

# domino proportions relative to object_size (simulation/dominos.py:35-40)
DOMINO_PROPORTIONS = np.array([0.2, 1.0, 2.0])


@dataclasses.dataclass(frozen=True)
class DominosEnvConstants(blocks_lib.RearrangeEnvConstants):
    is_holdout: bool = False
    goal_args: tuple = (("rot_dist_type", "mod180"),)


class DominosRearrangeEnv(blocks_lib.BlocksRearrangeEnv):
    def _compile_world(self, sp, rcp):
        from robogym_tpu.mjcf.compiler import compile_xml
        from robogym_tpu.envs.rearrange import simulation as sim_lib

        skewed = sp.object_size * DOMINO_PROPORTIONS
        xml = sim_lib.build_blocks_world_xml(
            0, robot_control_params=rcp,
            mujoco_timestep=self.constants.mujoco_timestep,
        )
        for i in range(sp.max_num_objects):
            xml.append(sim_lib.make_block_xml(f"object{i}", skewed))
        model = compile_xml(xml, dtype=self.dtype)
        model = sim_lib.scale_contact_budgets(model, sp.max_num_objects)
        return model, sim_lib.RearrangeIndex.build(model, sp.max_num_objects)


def make_env(constants=None, parameters=None, dtype=jnp.float32):
    cst_kw = dict(constants or {})
    if isinstance(cst_kw.get("goal_args"), dict):
        cst_kw["goal_args"] = tuple(sorted(cst_kw["goal_args"].items()))
    is_holdout = cst_kw.pop("is_holdout", False)
    cst = DominosEnvConstants(is_holdout=is_holdout, **cst_kw)
    par_kw = dict(parameters or {})
    sp = blocks_lib.RearrangeSimParameters(
        **par_kw.pop("simulation_params", {})
    )
    rcp_kw = par_kw.pop("robot_control_params", None)
    rcp = (
        composite_lib.RobotControlParameters(**rcp_kw)
        if rcp_kw is not None else composite_lib.RobotControlParameters()
    )
    par = blocks_lib.RearrangeEnvParameters(
        simulation_params=sp, robot_control_params=rcp, **par_kw
    )
    env = DominosRearrangeEnv(cst, par, dtype=dtype)
    gargs = goals_lib.GoalArgs(**dict(cst.goal_args))
    if is_holdout:
        env.goal_gen = goals_lib.DominoStateGoal(
            env.idx, gargs, dtype=dtype,
            used_table_portion=sp.used_table_portion,
        )
    else:
        env.goal_gen = goals_lib.TrainStateGoal(
            env.idx, gargs, dtype=dtype,
            used_table_portion=sp.used_table_portion,
            goal_distance_ratio=sp.goal_distance_ratio,
        )
    return env
