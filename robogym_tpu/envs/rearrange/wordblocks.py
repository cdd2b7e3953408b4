"""Word-blocks env (reference envs/rearrange/wordblocks.py:1-90): six letter
blocks ("OPENAI") in a single object group — wood-colored, or rainbow with
`rainbow_mode` — with a fixed-row goal, the A and I blocks rotated slightly.

TPU note: the reference's letter decals are texture assets; the texture
pipeline is render-only and this build has no renderer attached, so blocks
carry the group colors only."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.envs.rearrange import blocks as blocks_lib
from robogym_tpu.envs.rearrange import goals as goals_lib
from robogym_tpu.robot import composite as composite_lib
from robogym_tpu.utils import rotation as rot

RAINBOW = [
    [1.0, 0.0, 0.0, 1.0], [1.0, 0.647, 0.0, 1.0], [1.0, 1.0, 0.0, 1.0],
    [0.0, 0.502, 0.0, 1.0], [0.0, 0.0, 1.0, 1.0], [0.294, 0.0, 0.51, 1.0],
]
WOOD = [[0.702, 0.522, 0.212, 1.0]] * 6


@dataclasses.dataclass(frozen=True)
class WordBlocksEnvConstants(blocks_lib.RearrangeEnvConstants):
    rainbow_mode: bool = False


class WordBlocksEnv(blocks_lib.BlocksRearrangeEnv):
    def _sample_object_groups(self, key):
        O = self.max_num_objects
        colors = RAINBOW if self.constants.rainbow_mode else WOOD
        cols = jnp.asarray((colors * O)[:O], self.dtype)
        return jnp.zeros(O, jnp.int32), cols


def make_env(constants=None, parameters=None, dtype=jnp.float32):
    cst_kw = dict(constants or {})
    if isinstance(cst_kw.get("goal_args"), dict):
        cst_kw["goal_args"] = tuple(sorted(cst_kw["goal_args"].items()))
    cst = WordBlocksEnvConstants(**cst_kw)
    par_kw = dict(parameters or {})
    sim_kw = dict(par_kw.pop("simulation_params", {}))
    sim_kw.setdefault("num_objects", 6)
    sim_kw.setdefault("max_num_objects", 6)
    sp = blocks_lib.RearrangeSimParameters(**sim_kw)
    rcp_kw = par_kw.pop("robot_control_params", None)
    rcp = (
        composite_lib.RobotControlParameters(**rcp_kw)
        if rcp_kw is not None else composite_lib.RobotControlParameters()
    )
    par = blocks_lib.RearrangeEnvParameters(
        simulation_params=sp, robot_control_params=rcp, **par_kw
    )
    env = WordBlocksEnv(cst, par, dtype=dtype)
    # fixed row goal, A & I blocks rotated by 0.38 rad (wordblocks.py:52-60)
    O = sp.max_num_objects
    rel = np.stack([
        np.linspace(0.2, 0.8, O), np.full(O, 0.5)
    ], axis=1)
    quats = np.tile(np.asarray([[1.0, 0, 0, 0]]), (O, 1))
    tilt = np.asarray(rot.quat_from_angle_and_axis(
        jnp.asarray(0.38), jnp.asarray([0.0, 0, 1.0])
    ))
    for i in (4, 5):
        if i < O:
            quats[i] = tilt
    env.goal_gen = goals_lib.ObjectFixedStateGoal(
        env.idx, goals_lib.GoalArgs(), relative_placements=rel,
        init_quats=quats, dtype=dtype,
        used_table_portion=sp.used_table_portion,
    )
    return env
