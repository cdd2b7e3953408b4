"""Rearrange simulation layer (TPU build).

Re-implements the reference rearrange simulation
(/root/reference/robogym/envs/rearrange/simulation/base.py:42-1070 and
robot/ur16e/mujoco/simulation/base.py:8-167) TPU-first:

- world = UR16e base XML (arm + Robotiq gripper + table) + `max_num_objects`
  block bodies compiled ONCE with fixed topology. The reference recreates the
  MjSim with `num_objects` bodies every reset (common/base.py:850-856); here
  `num_objects` is per-episode DATA (an active-object mask), unused slots are
  parked off-table, and object scale/color randomization writes Model fields.
- no target bodies: the reference adds non-colliding target clones purely for
  rendering (simulation/base.py:295-306); goals live in env state.
- placement area geometry replicates simulation/base.py:981-1010.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.mjcf.compiler import compile_xml
from robogym_tpu.mjcf.model import Data, Model
from robogym_tpu.mjcf.xml_tools import MjcfXML
from robogym_tpu.robot.composite import RobotControlParameters

# the reference parks objects via sim recreation; we park unused slots here
PARK_POSITION = np.array([2.5, 2.5, 0.05])  # on the floor, far from the table


def make_block_xml(name: str, size) -> MjcfXML:
    """(reference common/utils.py:195-216 make_block)."""
    size = np.asarray(size, np.float64)
    if size.size == 1:
        size = np.tile(size, 3)
    src = f"""
    <mujoco>
      <worldbody>
        <body name="{name}" pos="0.0 0.0 0.0">
          <geom name="{name}" type="box" rgba="0.8 0.4 0.1 1.0"
                size="{size[0]} {size[1]} {size[2]}" density="1000"/>
          <joint name="{name}:joint" type="free"/>
        </body>
      </worldbody>
    </mujoco>
    """
    return MjcfXML.from_string(src)


def build_blocks_world_xml(
    max_num_objects: int,
    block_size: float = 0.0254,
    robot_control_params: Optional[RobotControlParameters] = None,
    mujoco_timestep: float = 0.001,
) -> MjcfXML:
    """World composition (ur16e/mujoco/simulation/base.py:62-115 +
    simulation/base.py:281-306)."""
    params = robot_control_params or RobotControlParameters()
    xml = (
        MjcfXML.parse("robot/ur16e/base.xml")
        .set_objects_attr(tag="option", timestep=mujoco_timestep)
        .add_default_compiler_directive()
    )
    if params.is_joint_actuated():
        xml.remove_objects_by_name("mocap_weld")
        sub = params.arm_joint_calibration_path
        xml.append(MjcfXML.parse(
            f"robot/ur16e/jointspec/calibrations/{sub}/ur16e_ik_class.xml"))
        xml.append(MjcfXML.parse(
            f"robot/ur16e/jointspec/calibrations/{sub}/joint_actuations.xml"))
    else:
        xml.append(MjcfXML.parse("robot/ur16e/jointspec/ur16e_mocap_class.xml"))
    xml.append(MjcfXML.parse("robot/ur16e/gripper_actuators.xml"))

    for i in range(max_num_objects):
        xml.append(make_block_xml(f"object{i}", block_size))
    return xml


@dataclasses.dataclass(frozen=True)
class PlacementArea:
    """(reference common/utils.py:29-35)."""

    offset: Tuple[float, float, float]
    size: Tuple[float, float, float]


@dataclasses.dataclass(frozen=True)
class RearrangeIndex:
    """Static tables for the compiled rearrange world."""

    max_num_objects: int
    object_body_ids: np.ndarray      # (O,)
    object_geom_ids: np.ndarray      # (O,)
    object_qpos_adr: np.ndarray      # (O,) start of 7-dof free joint qpos
    object_dof_adr: np.ndarray       # (O,) start of 6-dof free joint dofs
    table_geom_id: int
    table_body_id: int
    gripper_geom_ids: np.ndarray
    left_finger_geom_ids: np.ndarray   # (simulation/base.py:548+ per-finger)
    right_finger_geom_ids: np.ndarray
    table_pos: np.ndarray            # (3,)
    table_size: np.ndarray           # (3,) half sizes

    GRIPPER_BODIES = (
        "robot0:gripper_base", "left_gripper", "left_inner_follower",
        "left_outer_driver", "right_gripper", "right_inner_follower",
        "right_outer_driver",
    )
    LEFT_FINGER_BODIES = (
        "left_gripper", "left_inner_follower", "left_outer_driver",
    )
    RIGHT_FINGER_BODIES = (
        "right_gripper", "right_inner_follower", "right_outer_driver",
    )

    @classmethod
    def build(cls, model: Model, max_num_objects: int) -> "RearrangeIndex":
        c = model.const
        bn, gn, jn = c.names["body"], c.names["geom"], c.names["joint"]
        body_ids, geom_ids, qpos_adr, dof_adr = [], [], [], []
        geom_bodyid = np.asarray(c.geom_bodyid)
        for i in range(max_num_objects):
            b = bn[f"object{i}"]
            body_ids.append(b)
            geom_ids.append(gn[f"object{i}"])
            j = jn[f"object{i}:joint"]
            qpos_adr.append(int(c.jnt_qposadr[j]))
            dof_adr.append(int(c.jnt_dofadr[j]))
        def geoms_of(bodies):
            out = []
            for gb in bodies:
                if gb in bn:
                    bid = bn[gb]
                    out.extend(
                        int(g) for g in np.nonzero(geom_bodyid == bid)[0]
                    )
            return sorted(out)

        grip_geoms = geoms_of(cls.GRIPPER_BODIES)
        left_geoms = geoms_of(cls.LEFT_FINGER_BODIES)
        right_geoms = geoms_of(cls.RIGHT_FINGER_BODIES)
        tgid = gn["table"]
        tbid = bn["table"]
        return cls(
            max_num_objects=max_num_objects,
            object_body_ids=np.asarray(body_ids, np.int32),
            object_geom_ids=np.asarray(geom_ids, np.int32),
            object_qpos_adr=np.asarray(qpos_adr, np.int32),
            object_dof_adr=np.asarray(dof_adr, np.int32),
            table_geom_id=int(tgid),
            table_body_id=int(tbid),
            gripper_geom_ids=np.asarray(grip_geoms, np.int32),
            left_finger_geom_ids=np.asarray(left_geoms, np.int32),
            right_finger_geom_ids=np.asarray(right_geoms, np.int32),
            table_pos=np.asarray(model.body_pos)[tbid].copy(),
            table_size=np.asarray(model.geom_size)[tgid].copy(),
        )

    # -- geometry ---------------------------------------------------------
    def table_dimensions(self):
        """(simulation/base.py:905-930): (pos, half-size, height)."""
        table_height = self.table_size[-1] + self.table_pos[-1]
        return self.table_pos, self.table_size, table_height

    def placement_area(
        self, num_objects: int, used_table_portion: float = 1.0
    ) -> PlacementArea:
        """(simulation/base.py:981-1010)."""
        table_pos, table_size, _ = self.table_dimensions()
        table_size_x, table_size_y = table_size[:2] * 2
        minimum_table_portion = num_objects * 0.1
        used = float(np.clip(used_table_portion, minimum_table_portion, 1.0))
        place_size_x = 0.5 * table_size_x * used
        place_size_y = 0.38 * table_size_y * used
        place_size_z = 0.26
        offset_x = 0.5 * table_size_x - place_size_x / 2.0
        offset_y = 0.44 * table_size_y - place_size_y / 2.0
        offset_z = 2 * table_size[2]
        return PlacementArea(
            offset=(offset_x, offset_y, offset_z),
            size=(place_size_x, place_size_y, place_size_z),
        )

    def placement_bounds(self, num_objects: int, used_table_portion: float = 1.0):
        """World-frame (min_xyz, max_xyz) of the placement area
        (simulation/base.py:834-845 extract_placement_area_boundary)."""
        table_pos, table_size, _ = self.table_dimensions()
        area = self.placement_area(num_objects, used_table_portion)
        size = np.asarray(area.size) / 2
        pos = np.asarray(area.offset) + table_pos - table_size + size
        return pos - size, pos + size


# -- batched object state access (all jittable) -----------------------------

def object_positions(idx: RearrangeIndex, d: Data) -> jax.Array:
    """(O, 3) free-joint positions (simulation/base.py get_object_pos)."""
    adr = jnp.asarray(idx.object_qpos_adr)
    return jax.vmap(lambda a: jax.lax.dynamic_slice(d.qpos, (a,), (3,)))(adr)


def object_quats(idx: RearrangeIndex, d: Data) -> jax.Array:
    adr = jnp.asarray(idx.object_qpos_adr) + 3
    return jax.vmap(lambda a: jax.lax.dynamic_slice(d.qpos, (a,), (4,)))(adr)


def object_velocities(idx: RearrangeIndex, d: Data) -> jax.Array:
    adr = jnp.asarray(idx.object_dof_adr)
    return jax.vmap(lambda a: jax.lax.dynamic_slice(d.qvel, (a,), (6,)))(adr)


def set_object_poses(
    idx: RearrangeIndex, d: Data, pos: jax.Array, quat: jax.Array
) -> Data:
    """Write (O, 3) positions + (O, 4) quats into qpos; zero object dofs."""
    qpos = d.qpos
    for i in range(idx.max_num_objects):
        a = int(idx.object_qpos_adr[i])
        qpos = jax.lax.dynamic_update_slice(qpos, pos[i].astype(qpos.dtype), (a,))
        qpos = jax.lax.dynamic_update_slice(
            qpos, quat[i].astype(qpos.dtype), (a + 3,)
        )
    qvel = d.qvel
    for i in range(idx.max_num_objects):
        a = int(idx.object_dof_adr[i])
        qvel = jax.lax.dynamic_update_slice(
            qvel, jnp.zeros(6, qvel.dtype), (a,)
        )
    return d.replace(qpos=qpos, qvel=qvel)


def check_objects_off_table(
    idx: RearrangeIndex, pos: jax.Array, margin: float = 0.1,
    active_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """(simulation/base.py check_objects_off_table): outside the table's
    xy-extent (with margin) or below the table top."""
    table_pos, table_size, table_height = idx.table_dimensions()
    min_xy = jnp.asarray(table_pos[:2] - table_size[:2] + margin, pos.dtype)
    max_xy = jnp.asarray(table_pos[:2] + table_size[:2] - margin, pos.dtype)
    off = (
        (pos[:, 0] < min_xy[0]) | (pos[:, 0] > max_xy[0])
        | (pos[:, 1] < min_xy[1]) | (pos[:, 1] > max_xy[1])
        | (pos[:, 2] < table_height - 0.1)
    )
    if active_mask is not None:
        off = off & active_mask
    return off


def in_placement_area(
    idx: RearrangeIndex, pos: jax.Array, num_objects: int,
    used_table_portion: float = 1.0, margin: float = 0.02,
    soft: bool = False, key: Optional[jax.Array] = None,
    active_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-object bool: within the placement area, jittable analogue of
    check_objects_in_placement_area (simulation/base.py:847-902). `margin`
    is the per-dimension tolerance outside the boundary; `soft` labels
    objects inside the margin band stochastically with one shared uniform
    draw, exactly the reference's scalar np.random.random() broadcast.
    Inactive (padding) slots report True (base.py:894-897)."""
    lo, hi = idx.placement_bounds(num_objects, used_table_portion)
    lo = jnp.asarray(lo, pos.dtype)
    hi = jnp.asarray(hi, pos.dtype)
    dist = jnp.maximum(jnp.maximum(pos - hi, lo - pos), 0.0)
    max_dist = jnp.max(dist, axis=-1)                       # (O,)
    if soft:
        assert key is not None, "soft placement mask needs a PRNG key"
        u = jax.random.uniform(key, (), pos.dtype)
        inside = u > jnp.clip(max_dist / margin, 0.0, 1.0)
    else:
        inside = max_dist < margin
    if active_mask is not None:
        inside = inside | ~active_mask
    return inside


def gripper_table_contact(idx: RearrangeIndex, m: Model, d: Data) -> jax.Array:
    """Any gripper-geom <-> table contact with force
    (ur16e/mujoco/simulation/base.py:142-167)."""
    con = d.contact
    g1, g2 = con.geom1, con.geom2
    grip = jnp.asarray(idx.gripper_geom_ids)
    is_grip1 = jnp.isin(g1, grip)
    is_grip2 = jnp.isin(g2, grip)
    is_table = (g1 == idx.table_geom_id) | (g2 == idx.table_geom_id)
    touching = con.active & is_table & (is_grip1 | is_grip2)
    return jnp.any(touching)


def geom_bbox_half(m: Model, gids: np.ndarray) -> jax.Array:
    """Axis-aligned bounding half-extents per geom, by type — the
    placement/goal code needs true bboxes, not raw `geom_size` (cylinder
    size is (r, halfheight, 0), sphere is (r, 0, 0); reference bboxes come
    from simulation/base.py:get_object_bounding_boxes)."""
    from robogym_tpu.mjcf.model import GeomType

    c = m.const
    t = np.asarray(c.geom_type)[np.asarray(gids)]
    s = m.geom_size[jnp.asarray(gids)]
    r = s[:, :1]
    hh = s[:, 1:2]
    box = s
    sphere = jnp.concatenate([r, r, r], axis=1)
    cyl = jnp.concatenate([r, r, hh], axis=1)
    cap = jnp.concatenate([r, r, hh + r], axis=1)
    t = t[:, None]
    out = jnp.where(
        t == GeomType.SPHERE, sphere,
        jnp.where(
            t == GeomType.CYLINDER, cyl,
            jnp.where(t == GeomType.CAPSULE, cap, box),
        ),
    )
    return out


def contact_wrench_on_geoms(
    geom_ids: jax.Array, ref_point: jax.Array, m: Model, d: Data
) -> Tuple[jax.Array, jax.Array]:
    """Aggregate contact wrench (force, torque about `ref_point`) acting on a
    geom set, from the constraint solution's per-contact normal forces.

    TPU analogue of the wrist F/T sensor readout the reference observes
    (/root/reference/robogym/robot/ur16e/mujoco/joint_controlled_arm.py:79-85
    `tcp_force`/`tcp_torque`; threshold use arm_interface.py:43-46).
    Approximation: `efc_force_contact` sums a contact's pyramidal facet
    forces, whose tangential components cancel pairwise — the aggregate is
    the contact-normal load, which is what the safety stop thresholds.
    Contact normals point from geom1 into geom2 (MuJoCo convention), so the
    force ON the set flips sign when the set's geom is geom1.
    """
    con = d.contact
    ids = jnp.asarray(geom_ids)
    in1 = jnp.isin(con.geom1, ids)
    in2 = jnp.isin(con.geom2, ids)
    sign = jnp.where(in2, 1.0, 0.0) - jnp.where(in1, 1.0, 0.0)
    f = d.efc_force_contact * sign * con.active
    Fvec = f[:, None] * con.normal                          # (ncon, 3)
    F = Fvec.sum(axis=0)
    T = jnp.cross(con.pos - ref_point[None, :], Fvec).sum(axis=0)
    return F, T


def object_gripper_contact(idx: RearrangeIndex, d: Data) -> jax.Array:
    """(O, 2) contact flags object<->{left,right} finger
    (simulation/base.py:548-635 get_object_gripper_contact)."""
    con = d.contact
    obj = jnp.asarray(idx.object_geom_ids)                  # (O,)
    left = jnp.asarray(idx.left_finger_geom_ids)
    right = jnp.asarray(idx.right_finger_geom_ids)
    is_obj1 = con.geom1[None, :] == obj[:, None]            # (O, ncon)
    is_obj2 = con.geom2[None, :] == obj[:, None]
    out = []
    for fingers in (left, right):
        is_f1 = jnp.isin(con.geom1, fingers)[None, :]
        is_f2 = jnp.isin(con.geom2, fingers)[None, :]
        touch = con.active[None, :] & (
            (is_obj1 & is_f2) | (is_obj2 & is_f1)
        )
        out.append(jnp.any(touch, axis=1))
    return jnp.stack(out, axis=1)                           # (O, 2)


def goal_qpos(
    idx: RearrangeIndex, d: Data, goal_pos: jax.Array, goal_quat: jax.Array
) -> jax.Array:
    """qpos with object free joints teleported to the goal poses — the
    reference's `qpos_goal` observation (common/base.py:399-404, built from
    the goal-state sim snapshot)."""
    qpos = d.qpos
    for i in range(idx.max_num_objects):
        a = int(idx.object_qpos_adr[i])
        qpos = jax.lax.dynamic_update_slice(
            qpos, goal_pos[i].astype(qpos.dtype), (a,)
        )
        qpos = jax.lax.dynamic_update_slice(
            qpos, goal_quat[i].astype(qpos.dtype), (a + 3,)
        )
    return qpos


def compile_blocks_world(
    max_num_objects: int,
    block_size: float = 0.0254,
    robot_control_params: Optional[RobotControlParameters] = None,
    mujoco_timestep: float = 0.001,
    dtype=jnp.float32,
) -> Tuple[Model, RearrangeIndex]:
    xml = build_blocks_world_xml(
        max_num_objects, block_size, robot_control_params, mujoco_timestep
    )
    model = compile_xml(xml, dtype=dtype)
    return model, RearrangeIndex.build(model, max_num_objects)


def compile_solver_world(
    robot_control_params: RobotControlParameters,
    mujoco_timestep: float = 0.001,
    dtype=jnp.float32,
) -> Model:
    """The mocap_ik SOLVER simulation: the same arm+gripper+table world in
    MOCAP mode, with no task objects — the second MjSim of the reference's
    dual-sim TCP control (build_solver_sim,
    /root/reference/robogym/robot/composite/ur_gripper_arm.py:146-160; the
    solver sim shares the main sim's timestep and substeps)."""
    import dataclasses as _dc

    solver_params = _dc.replace(
        robot_control_params, tcp_solver_mode="mocap"
    )
    xml = build_blocks_world_xml(
        0, robot_control_params=solver_params, mujoco_timestep=mujoco_timestep
    )
    return compile_xml(xml, dtype=dtype)


def scale_contact_budgets(model: Model, n_objects: int,
                          n_extra_bodies: int = 0) -> Model:
    """Raise the static contact budgets for dense multi-object scenes.

    The Option defaults (ncon_active=32, group_cap=48) are tuned for the
    dactyl hand worlds. A rearrange scene with O resting objects needs
    ~4 rows per object-table manifold plus object-object stacks — a
    20-domino holdout starves at 32 rows and visibly drifts. This is the
    static-shape analogue of the reference's per-env nconmax sizing
    (cube_env.py:229-243). No-op (returns `model` unchanged) when the
    defaults already suffice, so small worlds keep the tuned fast path."""
    n = n_objects + n_extra_bodies
    # ~4 deep rows per resting manifold + headroom for stacks/gripper
    ncon = ((16 + 5 * n + 7) // 8) * 8
    cap = ((32 + 4 * n + 7) // 8) * 8
    ncon = max(model.opt.ncon_active, ncon)
    cap = max(model.opt.group_cap, cap)
    if (ncon, cap) == (model.opt.ncon_active, model.opt.group_cap):
        return model
    return model.replace(
        opt=model.opt.replace(ncon_active=ncon, group_cap=cap)
    )


def build_settle_world_xml(world_xml_string: str) -> MjcfXML:
    """Objects-only copy of a composed rearrange world for goal
    stabilization: strips the robot (every `robot0:`-prefixed body, the
    mocap target, actuators/tendons/equalities/sensors) and keeps the
    floor/table/object geometry.

    The reference stabilizes goals by stepping the FULL sim on the host
    only when a goal is (re)sampled (goals/object_state.py:292-330 +
    common/utils.py:76-92). Under vmap the resample `lax.cond` lowers to a
    select that pays the settle EVERY step, so the TPU build instead makes
    the settle world small: objects falling onto the table involve no arm
    dofs, no arm collision pairs and no actuation, which is exactly what
    this reduced model contains.
    """
    import xml.etree.ElementTree as et

    root = et.fromstring(world_xml_string)

    def is_robot_body(el) -> bool:
        name = el.get("name", "")
        return (
            name.startswith("robot0:") or name == "backdrop"
            or el.get("mocap", "false") == "true"
        )

    def scrub(parent):
        for child in list(parent):
            if child.tag in ("actuator", "tendon", "equality", "sensor",
                             "contact"):
                parent.remove(child)
            elif child.tag == "body" and is_robot_body(child):
                parent.remove(child)
            else:
                scrub(child)

    scrub(root)
    return MjcfXML.from_string(et.tostring(root, encoding="unicode"))
