"""Chessboard env (reference envs/rearrange/chessboard.py:1-95 +
simulation/chessboard.py): chess pieces (the shipped chess meshes) with a
fixed-grid goal arranging them in board order.

TPU note: the reference paints a chessboard texture onto the table; decals
are render-only here. The piece dynamics, fixed-grid goals, and per-piece
meshes are reproduced."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from robogym_tpu.envs.rearrange import blocks as blocks_lib
from robogym_tpu.envs.rearrange import goals as goals_lib
from robogym_tpu.envs.rearrange import mesh as mesh_env_lib
from robogym_tpu.robot import composite as composite_lib

PIECES = ["rook", "knight", "bishop", "queen"]


class ChessboardRearrangeEnv(mesh_env_lib.MeshRearrangeEnv):
    MESH_ROOT_DIRNAME = "chess"


def make_env(constants=None, parameters=None, dtype=jnp.float32):
    cst_kw = dict(constants or {})
    if isinstance(cst_kw.get("goal_args"), dict):
        cst_kw["goal_args"] = tuple(sorted(cst_kw["goal_args"].items()))
    cst = mesh_env_lib.MeshRearrangeEnvConstants(
        normalize_mesh=True, normalized_mesh_size=0.03, **cst_kw
    )
    par_kw = dict(parameters or {})
    sim_kw = dict(par_kw.pop("simulation_params", {}))
    sim_kw.setdefault("num_objects", 4)
    sim_kw.setdefault("max_num_objects", 4)
    sp = blocks_lib.RearrangeSimParameters(**sim_kw)
    rcp_kw = par_kw.pop("robot_control_params", None)
    rcp = (
        composite_lib.RobotControlParameters(**rcp_kw)
        if rcp_kw is not None else composite_lib.RobotControlParameters()
    )
    par = blocks_lib.RearrangeEnvParameters(
        simulation_params=sp, robot_control_params=rcp, **par_kw
    )
    env = ChessboardRearrangeEnv(cst, par, mesh_names=PIECES, dtype=dtype)
    # back-rank grid goal: pieces side by side along one row
    O = sp.max_num_objects
    rel = np.stack([
        np.full(O, 0.35), np.linspace(0.25, 0.75, O)
    ], axis=1)
    env.goal_gen = goals_lib.ObjectFixedStateGoal(
        env.idx, goals_lib.GoalArgs(), relative_placements=rel,
        dtype=dtype, used_table_portion=sp.used_table_portion,
    )
    return env
