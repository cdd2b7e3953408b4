"""Rearrange goal generators (TPU build).

Functional re-implementations of the reference generators
(/root/reference/robogym/envs/rearrange/goals/): object_state.py
(free-placement position+rotation goals), object_reach_goal.py,
object_stack_goal.py, pickandplace.py. A goal is a dict pytree produced by a
pure `next_goal(key, ...)`; distances are pure functions of (goal, Data).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.envs.rearrange import simulation as sim_lib
from robogym_tpu.mjcf.model import Data
from robogym_tpu.utils import rotation as rot


@dataclasses.dataclass(frozen=True)
class GoalArgs:
    """(goals/object_state.py:122-170 subset relevant on the TPU path)."""

    randomize_goal_rot: bool = False
    rot_randomize_type: str = "z_axis"   # z_axis | block | full
    stabilize_goal: bool = False
    rot_dist_type: str = "full"          # full | mod90 | mod180 | icp
    icp_max_num_vertices: int = 500      # (object_state.py:142)
    # placement-area observation masking (object_state.py:159-161)
    mask_margin: float = 0.02
    soft_mask: bool = False
    # train-state curriculum mixture (object_state.py:165-169)
    height_range: Tuple[float, float] = (0.05, 0.25)
    pickup_proba: float = 0.0
    stacking_proba: float = 0.0


def sample_goal_positions(
    key: jax.Array,
    idx: sim_lib.RearrangeIndex,
    active_mask: jax.Array,
    object_size: jax.Array,
    num_objects_used: int,
    used_table_portion: float = 1.0,
    n_candidates: int = 20,
    dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Rejection-sampled non-overlapping placements inside the placement
    area — the jittable analogue of place_objects_with_no_constraint
    (common/utils.py:832-883). Returns ((O, 3) positions, valid flag).

    For each object sequentially, draw `n_candidates` uniform positions and
    pick the first whose bounding box does not overlap previously placed
    active objects.
    """
    O = idx.max_num_objects
    lo, hi = idx.placement_bounds(num_objects_used, used_table_portion)
    _, _, table_height = idx.table_dimensions()
    lo = jnp.asarray(lo, dtype)
    hi = jnp.asarray(hi, dtype)

    def place_one(carry, inp):
        placed, n_placed = carry
        k, size, active = inp
        cand = jax.random.uniform(
            k, (n_candidates, 2), dtype,
            lo[None, :2] + size[:2], hi[None, :2] - size[:2],
        )
        # overlap test vs already-placed (xy boxes, sizes are half-extents)
        delta = jnp.abs(cand[:, None, :] - placed[None, :, :2])  # (C, O, 2)
        sizes_sum = size[:2][None, None, :] + object_size[None, :, :2]
        slot_mask = (jnp.arange(O) < n_placed)[None, :]
        overlap = jnp.all(delta < sizes_sum, axis=-1) & slot_mask
        ok = ~jnp.any(overlap, axis=-1)                          # (C,)
        pick = jnp.argmax(ok)                                    # first valid
        valid = ok[pick] | ~active
        z = jnp.asarray(table_height, dtype) + size[2]
        pos = jnp.concatenate([cand[pick], z[None]])
        park = jnp.asarray(sim_lib.PARK_POSITION, dtype)
        pos = jnp.where(active, pos, park + jnp.asarray(
            [0.3, 0.0, 0.0], dtype) * n_placed)
        placed = placed.at[n_placed].set(pos)
        return (placed, n_placed + 1), valid

    keys = jax.random.split(key, O)
    (placed, _), valids = jax.lax.scan(
        place_one,
        (jnp.zeros((O, 3), dtype), jnp.zeros((), jnp.int32)),
        (keys, object_size.astype(dtype), active_mask),
    )
    return placed, jnp.all(valids)


def sample_goal_rotations(
    key: jax.Array, O: int, args: GoalArgs, dtype=jnp.float32
) -> jax.Array:
    """(goals/object_state.py rot randomization: z_axis/block/full)."""
    if not args.randomize_goal_rot:
        return jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (O, 1))
    keys = jax.random.split(key, O)
    if args.rot_randomize_type == "z_axis":
        return jax.vmap(lambda k: rot.uniform_z_quat(k).astype(dtype))(keys)
    if args.rot_randomize_type == "full":
        return jax.vmap(lambda k: rot.uniform_quat(k).astype(dtype))(keys)
    # block: z-axis rotation times a random 90-degree cube rotation
    from robogym_tpu.envs.dactyl.cube_env import PARALLEL_QUATS

    def block_quat(k):
        k1, k2 = jax.random.split(k)
        zq = rot.uniform_z_quat(k1).astype(dtype)
        pq = jnp.asarray(PARALLEL_QUATS, dtype)[
            jax.random.randint(k2, (), 0, len(PARALLEL_QUATS))
        ]
        return rot.quat_mul(zq, pq)

    return jax.vmap(block_quat)(keys)


def rot_distance(
    q1: jax.Array, q2: jax.Array, dist_type: str = "full",
    verts: Optional[jax.Array] = None,
) -> jax.Array:
    """Rotational distance per object (goals/object_state.py:142-170 and
    utils/rotation.py): full quat distance, mod-90/mod-180 symmetry
    reduction for box-shaped objects, or ICP residual rotation for meshes
    (goals/object_state.py:258-295 `_icp_euler_angle_difference`; `verts`
    is the (O, V, 3) local-frame vertex cloud per object)."""
    if dist_type == "full":
        return rot.quat_magnitude(
            rot.quat_normalize(rot.quat_difference(q1, q2))
        )
    if dist_type == "icp":
        assert verts is not None, "icp rot_dist_type needs object vertices"
        from robogym_tpu.utils.icp import icp_rotation_distance

        return jax.vmap(icp_rotation_distance)(verts, q1, q2)
    # symmetry-reduced: try all symmetry quats, take the min distance
    from robogym_tpu.envs.dactyl.cube_env import PARALLEL_QUATS

    if dist_type == "mod180":
        sym = jnp.asarray(rot.get_parallel_rotations_180(), q1.dtype)
    else:  # mod90
        sym = jnp.asarray(PARALLEL_QUATS, q1.dtype)

    def per_obj(a, b):
        cands = jax.vmap(lambda s: rot.quat_magnitude(
            rot.quat_normalize(rot.quat_difference(rot.quat_mul(a, s), b))
        ))(sym)
        return cands.min()

    return jax.vmap(per_obj)(q1, q2)


def greedy_group_match(
    obj_pos: jax.Array, goal_pos: jax.Array, group_ids: jax.Array,
    active_mask: jax.Array,
) -> jax.Array:
    """Greedy object<->goal assignment within duplicate-object groups
    (goals/object_state.py:520-560): repeatedly take the globally closest
    (object, goal) pair with matching group id, then retire its row and
    column. Objects in singleton groups match themselves. Returns (O,)
    goal indices (identity for inactive slots)."""
    O = obj_pos.shape[0]
    cost = jnp.linalg.norm(
        obj_pos[:, None, :] - goal_pos[None, :, :], axis=-1
    )
    valid = (
        (group_ids[:, None] == group_ids[None, :])
        & active_mask[:, None] & active_mask[None, :]
    )
    inf = jnp.asarray(jnp.inf, cost.dtype)
    cost = jnp.where(valid, cost, inf)
    iota = jnp.arange(O)

    def body(carry, _):
        cost, match = carry
        flat = jnp.argmin(cost.reshape(-1))
        i, j = flat // O, flat % O
        ok = jnp.isfinite(cost.reshape(-1)[flat])
        match = jnp.where(ok & (iota == i), j, match)
        retire = (iota == i)[:, None] | (iota == j)[None, :]
        cost = jnp.where(ok & retire, inf, cost)
        return (cost, match), None

    (_, match), _ = jax.lax.scan(body, (cost, iota), None, length=O)
    return match


def relative_rot_euler(
    q_goal: jax.Array, q_cur: jax.Array, dist_type: str = "full"
) -> jax.Array:
    """(O, 3) per-object relative rotation as euler angles — the
    `rel_goal_obj_rot` observation (goals/object_state.py:196-201
    rot_dist_funcs feeding relative_goal:492-499). mod90/mod180 reduce by
    the object's symmetry group first (euler_angle_difference with mod);
    icp reports the full euler difference (the reference's ICP euler path
    also falls back to it when ICP cannot improve the match)."""
    if dist_type in ("full", "icp"):
        diff = rot.quat_normalize(rot.quat_difference(q_goal, q_cur))
        return jax.vmap(rot.quat2euler)(diff)
    from robogym_tpu.envs.dactyl.cube_env import PARALLEL_QUATS

    if dist_type == "mod180":
        sym = jnp.asarray(rot.get_parallel_rotations_180(), q_goal.dtype)
    else:  # mod90
        sym = jnp.asarray(PARALLEL_QUATS, q_goal.dtype)

    def per_obj(a, b):
        diffs = jax.vmap(lambda s: rot.quat_normalize(
            rot.quat_difference(rot.quat_mul(a, s), b)
        ))(sym)
        mags = jax.vmap(rot.quat_magnitude)(diffs)
        return rot.quat2euler(diffs[jnp.argmin(mags)])

    return jax.vmap(per_obj)(q_goal, q_cur)


class ObjectStateGoal:
    """Free-placement position(+rotation) goal
    (goals/object_state.py:173-599). Satisfies the
    robogym_tpu.goal.goal_generator.GoalGenerator protocol (checked in
    tests/test_blocks_env.py)."""

    def __init__(self, idx: sim_lib.RearrangeIndex, args: GoalArgs = GoalArgs(),
                 used_table_portion: float = 1.0, dtype=jnp.float32,
                 icp_verts: Optional[np.ndarray] = None):
        self.idx = idx
        self.args = args
        self.used_table_portion = used_table_portion
        self.dtype = dtype
        # (O, V, 3) local-frame vertex clouds for the icp rot-dist mode
        # (object_state.py:408-415 builds per-goal ICP over goal vertices)
        self.icp_verts = (
            None if icp_verts is None else jnp.asarray(icp_verts, dtype)
        )

    def next_goal(
        self, key: jax.Array, active_mask: jax.Array, object_size: jax.Array,
        num_objects_used: int, d: Data,
    ) -> Dict[str, jax.Array]:
        k_pos, k_rot = jax.random.split(key)
        pos, valid = sample_goal_positions(
            k_pos, self.idx, active_mask, object_size, num_objects_used,
            self.used_table_portion, dtype=self.dtype,
        )
        quat = sample_goal_rotations(
            k_rot, self.idx.max_num_objects, self.args, self.dtype
        )
        return {
            "obj_pos": pos, "obj_rot": quat,
            "goal_valid": valid,
        }

    def _match(
        self, goal: Dict[str, jax.Array], cur_pos: jax.Array,
        active_mask: jax.Array,
    ) -> jax.Array:
        """Goal index per object: greedy within-group assignment when the
        episode has duplicate-object groups, identity otherwise."""
        if "group_ids" in goal:
            return greedy_group_match(
                cur_pos, goal["obj_pos"], goal["group_ids"], active_mask
            )
        return jnp.arange(cur_pos.shape[0])

    def relative_goal(
        self, goal: Dict[str, jax.Array], d: Data, active_mask: jax.Array
    ) -> Dict[str, jax.Array]:
        """rel_goal_obj_pos / rel_goal_obj_rot after duplicate matching
        (goals/object_state.py:492-584 relative_goal)."""
        cur_pos = sim_lib.object_positions(self.idx, d)
        cur_quat = sim_lib.object_quats(self.idx, d)
        match = self._match(goal, cur_pos, active_mask)
        mask = active_mask.astype(cur_pos.dtype)[:, None]
        rel_rot = relative_rot_euler(
            goal["obj_rot"][match], cur_quat, self.args.rot_dist_type
        )
        return {
            "obj_pos": (goal["obj_pos"][match] - cur_pos) * mask,
            "obj_rot": rot.normalize_angles(rel_rot) * mask,
        }

    def goal_distance(
        self, goal: Dict[str, jax.Array], d: Data, active_mask: jax.Array
    ) -> Dict[str, jax.Array]:
        cur_pos = sim_lib.object_positions(self.idx, d)
        cur_quat = sim_lib.object_quats(self.idx, d)
        match = self._match(goal, cur_pos, active_mask)
        pos_dist = jnp.linalg.norm(goal["obj_pos"][match] - cur_pos, axis=-1)
        rdist = rot_distance(
            goal["obj_rot"][match], cur_quat, self.args.rot_dist_type,
            verts=self.icp_verts,
        )
        mask = active_mask.astype(pos_dist.dtype)
        out = {"obj_pos": pos_dist * mask}
        if self.args.randomize_goal_rot:
            out["obj_rot"] = rdist * mask
        else:
            out["obj_rot"] = jnp.zeros_like(rdist)
        return out


class TrainStateGoal(ObjectStateGoal):
    """Training goal with ADR-facing curriculum knobs
    (goals/train_state.py): goal distance scaled by `goal_distance_ratio`,
    and with probability `pickup_proba` one object is lifted into the air /
    `stacking_proba` a random tower is requested."""

    def __init__(self, *args, goal_distance_ratio: float = 1.0, **kw):
        super().__init__(*args, **kw)
        self.goal_distance_ratio = goal_distance_ratio

    def next_goal(self, key, active_mask, object_size, num_objects_used, d):
        k_base, k_p, k_lift, k_tower, k_order = jax.random.split(key, 5)
        goal = super().next_goal(
            k_base, active_mask, object_size, num_objects_used, d
        )
        cur = sim_lib.object_positions(self.idx, d)
        ratio = jnp.asarray(self.goal_distance_ratio, self.dtype)
        # place_targets_with_goal_distance_ratio: target moves only `ratio`
        # of the way from the current position (common/utils.py:922)
        pos = cur + (goal["obj_pos"] - cur) * ratio
        pos = jnp.where(active_mask[:, None], pos, goal["obj_pos"])

        O = self.idx.max_num_objects
        p = jax.random.uniform(k_p, (), self.dtype)
        args = self.args
        # pickup branch (train_state.py:44-55)
        height = jax.random.uniform(
            k_lift, (), self.dtype, args.height_range[0], args.height_range[1]
        )
        target_i = jax.random.randint(k_lift, (), 0, num_objects_used)
        lifted = pos.at[target_i, 2].add(height * ratio)
        # stacking branch (train_state.py:57-77): tower over a random base
        # in a random object order
        order = jax.random.permutation(k_order, O)
        tower_size = jax.random.randint(
            k_tower, (), 2, max(num_objects_used, 2) + 1
        )
        base = pos[order[0]]
        rank = jnp.argsort(order)                     # rank of each object
        in_tower = (rank < tower_size) & active_mask
        stacked_z = base[2] + rank.astype(self.dtype) * 2.0 * object_size[
            :, 2
        ].astype(self.dtype)
        stacked = jnp.where(
            in_tower[:, None],
            jnp.concatenate(
                [jnp.tile(base[:2], (O, 1)), stacked_z[:, None]], axis=1
            ),
            pos,
        )
        pos = jnp.where(
            p < args.pickup_proba,
            lifted,
            jnp.where(p < args.pickup_proba + args.stacking_proba, stacked, pos),
        )
        return dict(goal, obj_pos=pos)


class ObjectReachGoal(ObjectStateGoal):
    """Reach the (single) object's goal position with the gripper
    (goals/object_reach_goal.py:11-40): distance measured from the TCP."""

    def __init__(self, idx, arm_idx, args: GoalArgs = GoalArgs(), **kw):
        super().__init__(idx, args, **kw)
        self.arm_idx = arm_idx

    def goal_distance(self, goal, d, active_mask):
        from robogym_tpu.robot import ur16e as arm_lib

        tcp = arm_lib.tcp_xyz(self.arm_idx, d)
        dist = jnp.linalg.norm(goal["obj_pos"][0] - tcp)
        O = self.idx.max_num_objects
        out = jnp.zeros(O, dist.dtype).at[0].set(dist)
        return {"obj_pos": out, "obj_rot": jnp.zeros(O, dist.dtype)}


class ObjectStackGoal(ObjectStateGoal):
    """Stack objects into a tower over a random base position
    (goals/object_stack_goal.py:12-60). `fixed_order=False` stacks in a
    random object order (object_stack_goal.py:42-52)."""

    def __init__(self, *args, fixed_order: bool = True, **kw):
        super().__init__(*args, **kw)
        self.fixed_order = fixed_order

    def next_goal(self, key, active_mask, object_size, num_objects_used, d):
        k_base, k_order = jax.random.split(key)
        goal = super().next_goal(
            k_base, active_mask, object_size, num_objects_used, d
        )
        base = goal["obj_pos"][0]
        O = self.idx.max_num_objects
        if self.fixed_order:
            rank = jnp.arange(O)
        else:
            rank = jnp.argsort(jax.random.permutation(k_order, O))
        heights = 2.0 * object_size[:, 2].astype(self.dtype)
        # object with stack rank r sits at base + sum of heights below it —
        # approximated with uniform block heights (reference uses the scalar
        # object_size, object_stack_goal.py:41-52)
        stacked_z = base[2] + rank.astype(self.dtype) * heights
        stacked = jnp.concatenate(
            [jnp.tile(base[:2], (O, 1)), stacked_z[:, None]], axis=1
        )
        pos = jnp.where(active_mask[:, None], stacked, goal["obj_pos"])
        return dict(goal, obj_pos=pos)


class ObjectFixedStateGoal(ObjectStateGoal):
    """Goals at FIXED relative placements inside the placement area with
    fixed orientations (goals/object_state_fixed.py, used by table_setting
    and wordblocks). `relative_placements` are (O, 2) fractions of the
    placement area (x, y)."""

    def __init__(self, idx, args=None, relative_placements=None,
                 init_quats=None, dtype=jnp.float32, **kw):
        super().__init__(idx, args or GoalArgs(), dtype=dtype, **kw)
        O = idx.max_num_objects
        if relative_placements is None:
            relative_placements = np.tile(
                np.asarray([[0.5, 0.5]]), (O, 1)
            )
        if init_quats is None:
            init_quats = np.tile(np.asarray([[1.0, 0, 0, 0]]), (O, 1))
        self.relative_placements = jnp.asarray(relative_placements, dtype)
        self.init_quats = jnp.asarray(init_quats, dtype)

    def next_goal(self, key, active_mask, object_size, num_objects_used, d):
        lo, hi = self.idx.placement_bounds(num_objects_used,
                                           self.used_table_portion)
        _, _, table_h = self.idx.table_dimensions()
        lo = jnp.asarray(lo, self.dtype)
        hi = jnp.asarray(hi, self.dtype)
        frac = self.relative_placements
        xy = lo[None, :2] + frac * (hi[None, :2] - lo[None, :2])
        z = jnp.asarray(table_h, self.dtype) + object_size[:, 2].astype(
            self.dtype
        )
        pos = jnp.concatenate([xy, z[:, None]], axis=1)
        park = jnp.asarray(sim_lib.PARK_POSITION, self.dtype)
        pos = jnp.where(active_mask[:, None], pos, park[None, :])
        return {
            "obj_pos": pos,
            "obj_rot": self.init_quats,
            "goal_valid": jnp.ones((), bool),
        }


class DominoStateGoal(ObjectStateGoal):
    """Dominos-in-an-arc goal (goals/dominos.py DominoStateGoal): the
    dominos stand along a circular arc with tangential orientation; the arc
    is randomly placed/oriented inside the placement area (the reference's
    fit-and-retry becomes a conservative arc radius that always fits)."""

    def next_goal(self, key, active_mask, object_size, num_objects_used, d):
        O = self.idx.max_num_objects
        k_ang, k_off = jax.random.split(key)
        lo, hi = self.idx.placement_bounds(num_objects_used,
                                           self.used_table_portion)
        _, _, table_h = self.idx.table_dimensions()
        lo = jnp.asarray(lo, self.dtype)
        hi = jnp.asarray(hi, self.dtype)
        center = (lo[:2] + hi[:2]) / 2.0
        span = jnp.minimum(hi[0] - lo[0], hi[1] - lo[1])
        radius = span * 0.35
        base = jax.random.uniform(k_ang, (), self.dtype, 0.0, 2 * jnp.pi)
        # spacing: domino width * distance proportion along the arc
        # (simulation/dominos.py:20-24)
        spacing = 2.5 * jnp.max(object_size[:, 0]).astype(self.dtype)
        dtheta = spacing / radius
        thetas = base + jnp.arange(O, dtype=self.dtype) * dtheta
        xy = center[None, :] + radius * jnp.stack(
            [jnp.cos(thetas), jnp.sin(thetas)], axis=1
        )
        jitter = jax.random.uniform(k_off, (2,), self.dtype, -0.02, 0.02)
        xy = xy + jitter[None, :]
        z = jnp.asarray(table_h, self.dtype) + object_size[:, 2].astype(
            self.dtype
        )
        pos = jnp.concatenate([xy, z[:, None]], axis=1)
        park = jnp.asarray(sim_lib.PARK_POSITION, self.dtype)
        pos = jnp.where(active_mask[:, None], pos, park[None, :])
        # tangential orientation: rotate each domino to face along the arc
        quats = jax.vmap(
            lambda t: rot.quat_from_angle_and_axis(
                t + jnp.pi / 2, jnp.asarray([0.0, 0.0, 1.0], self.dtype)
            )
        )(thetas)
        return {
            "obj_pos": pos, "obj_rot": quats.astype(self.dtype),
            "goal_valid": jnp.ones((), bool),
        }


class DeterministicReachGoal(ObjectReachGoal):
    """Reach goal with a fixed pool of target positions
    (goals/object_reach_goal.py:56-81). The reference alternates an internal
    index; functionally the pool index is drawn from the reset key here
    (stateless generator contract)."""

    ALL_POSITIONS = np.array([
        [1.50253879, 0.36960144, 0.5170952],
        [1.32253879, 0.53960144, 0.5170952],
    ])

    def next_goal(self, key, active_mask, object_size, num_objects_used, d):
        goal = super().next_goal(
            key, active_mask, object_size, num_objects_used, d
        )
        i = jax.random.randint(key, (), 0, len(self.ALL_POSITIONS))
        p = jnp.asarray(self.ALL_POSITIONS, self.dtype)[i]
        pos = goal["obj_pos"].at[0].set(p)
        return dict(goal, obj_pos=pos)


class PickAndPlaceGoal(ObjectStateGoal):
    """Pick-and-place: first object in the air, rest on the table
    (goals/pickandplace.py:10-30)."""

    def __init__(self, idx, args: GoalArgs = GoalArgs(),
                 height_range=(0.05, 0.25), **kw):
        super().__init__(idx, args, **kw)
        self.height_range = height_range

    def next_goal(self, key, active_mask, object_size, num_objects_used, d):
        k1, k2 = jax.random.split(key)
        goal = super().next_goal(
            k1, active_mask, object_size, num_objects_used, d
        )
        lift = jax.random.uniform(
            k2, (), self.dtype, self.height_range[0], self.height_range[1]
        )
        pos = goal["obj_pos"].at[0, 2].add(lift)
        return dict(goal, obj_pos=pos)
