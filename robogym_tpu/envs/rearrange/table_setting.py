"""Table-setting env (reference envs/rearrange/table_setting.py:1-84):
5 fixed YCB tableware meshes (plate, 2 forks, knife, spoon) with fixed
colors/scales, and an ObjectFixedStateGoal placing them in the canonical
table arrangement."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.envs.rearrange import blocks as blocks_lib
from robogym_tpu.envs.rearrange import goals as goals_lib
from robogym_tpu.envs.rearrange import mesh as mesh_env_lib
from robogym_tpu.robot import composite as composite_lib
from robogym_tpu.utils import rotation as rot

MESH_NAMES = ["029_plate", "030_fork", "031_spoon", "032_knife"]
# slot -> candidate name (table_setting.py:49-54: plate, fork, fork, knife, spoon)
SLOT_MESHES = ["029_plate", "030_fork", "030_fork", "032_knife", "031_spoon"]
SLOT_SCALES = [0.6, 0.53, 0.53, 0.6, 0.63]
# (table_setting.py:45-47 colors; :58-79 placements/quats)
SLOT_COLORS = [[0.99, 0.44, 0.35, 1.0]] + [[0.506, 0.675, 0.75, 1.0]] * 4
RELATIVE_PLACEMENTS = np.array([
    [0.6, 0.5], [0.6, 0.68], [0.6, 0.75], [0.6, 0.36], [0.6, 0.28],
])


class TableSettingRearrangeEnv(mesh_env_lib.MeshRearrangeEnv):
    def _reset_model_fields(self, key: jax.Array):
        name_to_idx = {n: i for i, n in enumerate(self.bank.names)}
        cand = jnp.asarray(
            [name_to_idx[n] for n in SLOT_MESHES[: self.max_num_objects]],
            jnp.int32,
        )
        scales = jnp.asarray(
            SLOT_SCALES[: self.max_num_objects], self.dtype
        )[:, None]
        O = self.max_num_objects
        bids = jnp.asarray(self.idx.object_body_ids)
        gids = jnp.asarray(self.idx.object_geom_ids)
        mids = jnp.asarray(self._slot_mesh_ids)
        colors = jnp.asarray(SLOT_COLORS[:O], self.dtype)
        vol = (scales[:, 0] ** 3)
        fields = {
            "mesh_convex_vert": self.model.mesh_convex_vert.at[mids].set(
                self.bank.hull_vert[cand] * scales[:, None, :]
            ),
            "mesh_convex_mask": self.model.mesh_convex_mask.at[mids].set(
                self.bank.hull_mask[cand]
            ),
            "body_mass": self.model.body_mass.at[bids].set(
                self.bank.mass[cand] * vol
            ),
            "body_inertia": self.model.body_inertia.at[bids].set(
                self.bank.inertia[cand] * (scales[:, 0] ** 5)[:, None]
            ),
            "body_iquat": self.model.body_iquat.at[bids].set(
                self.bank.iquat[cand]
            ),
            "body_ipos": self.model.body_ipos.at[bids].set(
                jnp.zeros((O, 3), self.dtype)
            ),
            "geom_size": self.model.geom_size.at[gids].set(
                self.bank.bbox_half[cand] * scales
            ),
            "geom_rgba": self.model.geom_rgba.at[gids].set(colors),
        }
        return (fields, self.bank.bbox_half[cand] * scales,
                jnp.arange(self.max_num_objects))


def make_env(constants=None, parameters=None, dtype=jnp.float32):
    cst_kw = dict(constants or {})
    if isinstance(cst_kw.get("goal_args"), dict):
        cst_kw["goal_args"] = tuple(sorted(cst_kw["goal_args"].items()))
    cst = mesh_env_lib.MeshRearrangeEnvConstants(
        normalize_mesh=True, **cst_kw
    )
    par_kw = dict(parameters or {})
    sim_kw = dict(par_kw.pop("simulation_params", {}))
    sim_kw.setdefault("num_objects", 5)
    sim_kw.setdefault("max_num_objects", 5)
    sp = blocks_lib.RearrangeSimParameters(**sim_kw)
    rcp_kw = par_kw.pop("robot_control_params", None)
    rcp = (
        composite_lib.RobotControlParameters(**rcp_kw)
        if rcp_kw is not None else composite_lib.RobotControlParameters()
    )
    par = blocks_lib.RearrangeEnvParameters(
        simulation_params=sp, robot_control_params=rcp, **par_kw
    )
    env = TableSettingRearrangeEnv(
        cst, par, mesh_names=MESH_NAMES, dtype=dtype
    )
    # fixed-state goal (table_setting.py:56-80)
    O = sp.max_num_objects
    init_quats = np.tile(np.asarray([[1.0, 0, 0, 0]]), (O, 1))
    if O >= 5:
        init_quats[4] = np.asarray(
            rot.quat_from_angle_and_axis(
                jnp.asarray(0.38), jnp.asarray([0.0, 0, 1.0])
            )
        )
    env.goal_gen = goals_lib.ObjectFixedStateGoal(
        env.idx, goals_lib.GoalArgs(),
        relative_placements=RELATIVE_PLACEMENTS[:O],
        init_quats=init_quats,
        dtype=dtype, used_table_portion=sp.used_table_portion,
    )
    return env
