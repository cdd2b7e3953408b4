"""Holdout rearrange env (TPU build).

Re-implements /root/reference/robogym/envs/rearrange/holdout.py:26-130 +
simulation/holdout.py + goals/holdout_object_state.py: a task defined by a
jsonnet config (robogym_tpu.utils.jsonnet evaluates the reference's shipped
configs verbatim) with
  * `task_object_configs`: per-object XML snippets (+ color/material args)
    expanded `count` times into object slots,
  * `scene_object_configs`: static scene bodies,
  * a fixed initial state loaded from the shipped `initial_state_*.npz`,
  * fixed goal states from `goal_state_*.npz`
    (goals/holdout_object_state.py:HoldoutObjectStateGoal).

Use `robogym_tpu.utils.env_utils.load_env(<config>.jsonnet)` to build from a
config file, like the reference CLI.
"""

from __future__ import annotations

import dataclasses
import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.envs import core
from robogym_tpu.envs.rearrange import blocks as blocks_lib
from robogym_tpu.envs.rearrange import goals as goals_lib
from robogym_tpu.envs.rearrange import simulation as sim_lib
from robogym_tpu.mjcf.xml_tools import ASSETS_DIR, MjcfXML
from robogym_tpu.robot import composite as composite_lib

# (reference robogym/envs/rearrange/holdouts/__init__.py STATE_DIR)
STATE_DIR = os.path.join(
    os.path.dirname(ASSETS_DIR), "envs", "rearrange", "holdouts", "states"
)


@dataclasses.dataclass(frozen=True)
class HoldoutEnvConstants(blocks_lib.RearrangeEnvConstants):
    """(holdout.py:26-34)."""

    initial_state_path: Optional[str] = None
    randomize_target: bool = False
    # goal_args.goal_state_paths (holdout_object_state.py)
    goal_state_paths: Tuple[str, ...] = ()


def _load_object_xml(xml_path: str, name: str, tag_args: Dict,
                     material_args: Dict) -> MjcfXML:
    """Parse a holdout object XML snippet, name its body/joint/geoms, and
    apply tag_args/material_args attribute overrides
    (simulation/holdout.py task-object construction)."""
    full = os.path.join(ASSETS_DIR, "xmls", xml_path)
    tree = ET.parse(full)
    root = tree.getroot()
    worldbody = root.find("worldbody")
    bodies = list(worldbody.findall("body"))
    assert bodies, f"no body in {xml_path}"
    for b_i, body in enumerate(bodies):
        body.set("name", name if b_i == 0 else f"{name}:b{b_i}")
        for g_i, geom in enumerate(body.iter("geom")):
            geom.set("name", name if g_i == 0 else f"{name}:g{g_i}")
        for j_i, joint in enumerate(body.iter("joint")):
            joint.set("name", f"{name}:joint" if j_i == 0
                      else f"{name}:joint{j_i}")
    # attribute overrides: {tag: {attr: value}}
    for args in (material_args or {}), (tag_args or {}):
        for tag, attrs in args.items():
            for el in root.iter(tag):
                for k, v in attrs.items():
                    el.set(k, str(v))
    xml = MjcfXML.from_string(
        ET.tostring(root, encoding="unicode"),
        base_dir=os.path.dirname(full),
    )
    return xml


class HoldoutObjectStateGoal(goals_lib.ObjectStateGoal):
    """Fixed-goal generator drawing from the saved goal-state pool
    (goals/holdout_object_state.py)."""

    def __init__(self, idx, pool_pos: np.ndarray, pool_quat: np.ndarray,
                 args=None, dtype=jnp.float32, **kw):
        super().__init__(idx, args or goals_lib.GoalArgs(), dtype=dtype, **kw)
        self.pool_pos = jnp.asarray(pool_pos, dtype)    # (P, O, 3)
        self.pool_quat = jnp.asarray(pool_quat, dtype)  # (P, O, 4)

    def next_goal(self, key, active_mask, object_size, num_objects_used, d):
        i = jax.random.randint(key, (), 0, self.pool_pos.shape[0])
        return {
            "obj_pos": self.pool_pos[i],
            "obj_rot": self.pool_quat[i],
            "goal_valid": jnp.ones((), bool),
        }


class HoldoutRearrangeEnv(blocks_lib.BlocksRearrangeEnv):
    """Fixed-scene task env. Object slots come from the config; initial and
    goal object poses come from the saved .npz states."""

    def __init__(self, constants, parameters, task_object_configs,
                 scene_object_configs=(), dtype=jnp.float32):
        self._task_object_configs = list(task_object_configs)
        self._scene_object_configs = list(scene_object_configs)
        n_objects = sum(int(c.get("count", 1))
                        for c in self._task_object_configs)
        sp = dataclasses.replace(
            parameters.simulation_params,
            num_objects=n_objects, max_num_objects=n_objects,
        )
        parameters = dataclasses.replace(parameters, simulation_params=sp)

        # saved initial / goal states (holdout.py:92-104,
        # holdout_object_state.py)
        self._initial_state = None
        if constants.initial_state_path:
            f = np.load(os.path.join(STATE_DIR, constants.initial_state_path))
            self._initial_state = dict(
                obj_pos=np.asarray(f["obj_pos"])[:n_objects],
                obj_quat=np.asarray(f["obj_quat"])[:n_objects],
            )
        self._goal_states = []
        for p in constants.goal_state_paths:
            f = np.load(os.path.join(STATE_DIR, p))
            self._goal_states.append(dict(
                obj_pos=np.asarray(f["obj_pos"])[:n_objects],
                obj_quat=np.asarray(f["obj_quat"])[:n_objects],
            ))
        super().__init__(constants, parameters, dtype=dtype)
        if self._goal_states and not constants.randomize_target:
            self.goal_gen = HoldoutObjectStateGoal(
                self.idx,
                np.stack([g["obj_pos"] for g in self._goal_states]),
                np.stack([g["obj_quat"] for g in self._goal_states]),
                args=goals_lib.GoalArgs(
                    **dict(getattr(constants, "goal_args", ()) or ())
                ),
                dtype=dtype,
            )

    def _compile_world(self, sp, rcp):
        from robogym_tpu.mjcf.compiler import compile_xml

        xml = sim_lib.build_blocks_world_xml(
            0, robot_control_params=rcp,
            mujoco_timestep=self.constants.mujoco_timestep,
        )
        i = 0
        for cfg in self._task_object_configs:
            for _ in range(int(cfg.get("count", 1))):
                xml.append(_load_object_xml(
                    cfg["xml_path"], f"object{i}",
                    cfg.get("tag_args", {}), cfg.get("material_args", {}),
                ))
                i += 1
        for s_i, cfg in enumerate(self._scene_object_configs):
            for c_i in range(int(cfg.get("count", 1))):
                xml.append(_load_object_xml(
                    cfg["xml_path"], f"scene{s_i}_{c_i}",
                    cfg.get("tag_args", {}), cfg.get("material_args", {}),
                ))
        model = compile_xml(xml, dtype=self.dtype)
        # scale by scene GEOMS, not scene objects: a composed scene body
        # (bookshelf, bin) carries several contact geoms each of which can
        # hold simultaneous support contacts — counting it as 1 left the
        # bookshelf's 258-pair mesh-mesh group at the hand-world cap
        n_scene = sum(
            1 for nm in model.const.names["geom"] if nm.startswith("scene")
        )
        model = sim_lib.scale_contact_budgets(model, i, n_scene)
        return model, sim_lib.RearrangeIndex.build(model, i)

    def _reset_model_fields(self, key):
        # holdouts fix colors/materials in the config (holdout.py:86-92)
        return None, self._object_half_sizes(), jnp.arange(self.max_num_objects)

    def reset(self, key: jax.Array):
        state, obs = super().reset(key)
        if self._initial_state is not None:
            # teleport objects to the saved initial state
            # (holdout.py:92-104 _randomize_object_initial_states)
            d = sim_lib.set_object_poses(
                self.idx, state.physics,
                jnp.asarray(self._initial_state["obj_pos"], self.dtype),
                jnp.asarray(self._initial_state["obj_quat"], self.dtype),
            )
            from robogym_tpu.physics import step as physics

            d = physics.fwd_position(self.model, d)
            active = self._active_mask()
            goal = self._with_placement_info(
                self.goal_gen.next_goal(
                    jax.random.fold_in(key, 11), active,
                    self._object_half_sizes(), self.num_objects, d,
                ),
                active, jax.random.fold_in(key, 11),
                jnp.arange(self.max_num_objects),
            )
            state = state.replace(
                physics=d, goal=goal,
                prev_goal_distance=self.goal_gen.goal_distance(
                    goal, d, active
                ),
            )
            obs = self._observe(state)
        return state, obs


def make_env(constants=None, parameters=None, dtype=jnp.float32):
    cst_kw = dict(constants or {})
    goal_args = dict(cst_kw.pop("goal_args", {}) or {})
    gsp = tuple(goal_args.pop("goal_state_paths", ()) or ())
    # reference configs pass success_threshold as a dict
    thr = cst_kw.pop("success_threshold", None)
    if isinstance(thr, dict):
        if "obj_pos" in thr:
            cst_kw["success_threshold_obj_pos"] = float(thr["obj_pos"])
        if "obj_rot" in thr:
            cst_kw["success_threshold_obj_rot"] = float(thr["obj_rot"])
    cst_kw.pop("goal_generation", None)
    if goal_args:
        cst_kw["goal_args"] = tuple(sorted(goal_args.items()))
    cst = HoldoutEnvConstants(goal_state_paths=gsp, **cst_kw)

    par_kw = dict(parameters or {})
    sim_kw = dict(par_kw.pop("simulation_params", {}))
    task_objects = sim_kw.pop("task_object_configs", [])
    scene_objects = sim_kw.pop("scene_object_configs", [])
    sim_kw.pop("shared_settings", None)
    sim_kw.setdefault("num_objects", 1)
    sp = blocks_lib.RearrangeSimParameters(**sim_kw)
    rcp_kw = par_kw.pop("robot_control_params", None)
    rcp = (
        composite_lib.RobotControlParameters(**rcp_kw)
        if rcp_kw is not None else composite_lib.RobotControlParameters()
    )
    par_kw.pop("material_names", None)
    par = blocks_lib.RearrangeEnvParameters(
        simulation_params=sp, robot_control_params=rcp, **par_kw
    )
    return HoldoutRearrangeEnv(
        cst, par, task_objects, scene_objects, dtype=dtype
    )
