"""Solver-driven Rubik goal generation (TPU build).

Re-implements the reference kociemba-driven goal generators
(/root/reference/robogym/envs/dactyl/goals/rubik_cube_solver.py:196,
unconstrained_cube_solver.py, face_cube_solver.py:199): after the reset
scramble, the native two-phase solver computes the full solution sequence;
goals then walk that sequence one face turn at a time (alternating with
reorientation goals so the face to rotate points up, exactly like the
reference's solver goals).

TPU-first: the solve happens ONCE per reset through `jax.pure_callback`
into the C++ solver (episodic host work, like the reference's kociemba
call); the resulting padded (MAX_SOLUTION_LEN, 3) rotation plan is carried
in the env state as data, and per-step goal advancement is pure device
logic — no host round-trips during rollout.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.envs.dactyl import cube_manipulator as manip
from robogym_tpu.utils import rotation as rot
from robogym_tpu.utils import rubik_utils

MAX_SOLUTION_LEN = 26  # two-phase bound (<=24) + slack


def _solve_host(mats: np.ndarray, coords: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host callback: cubelet rotation matrices -> padded rotation plan.

    Returns (plan (MAX_SOLUTION_LEN, 3) float32 [axis, side, angle],
             length () int32)."""
    mats = np.asarray(mats)
    plan = np.zeros((MAX_SOLUTION_LEN, 3), np.float32)
    try:
        facelets = rubik_utils.cubelets_to_facelets(coords, mats)
        sol = rubik_utils.solve_fast(facelets)
    except Exception:
        sol = None
    if sol is None:
        return plan, np.int32(0)
    steps = rubik_utils.moves_to_face_rotations(sol)[:MAX_SOLUTION_LEN]
    for i, (axis, side, angle) in enumerate(steps):
        plan[i] = (axis, side, angle)
    return plan, np.int32(len(steps))


def empty_plan(dtype=jnp.float32):
    return (
        jnp.zeros((MAX_SOLUTION_LEN, 3), dtype),
        jnp.zeros((), jnp.int32),
    )


def solve_plan_host(idx: manip.CubeletIndex, qpos: np.ndarray):
    """Host-side solve for one env's qpos (numpy). Returns (plan, length).

    Runs OUTSIDE jit: the episodic host round-trip matches the reference's
    kociemba call between goals (utils/rubik_utils.py:5-31); the remote-TPU
    backend here does not support jax host callbacks, so the solve is a
    plain device->host->device hop once per reset."""
    from robogym_tpu.utils import rotation as rot

    # soft-align first (mid-episode cubelets can be far from straight;
    # reference to_pycuber does the same, cube_manipulator.py:296-300)
    qpos = np.asarray(manip.soft_align_faces(idx, jnp.asarray(qpos)))
    eulers = qpos[idx.euler_qpos]
    # decode with the SAME euler convention the manipulator encodes with
    # (rot.euler2mat/mat2euler); the numpy helper _np_euler2mat uses a
    # different composition order and silently produced illegal cube states
    mats = np.asarray(jax.vmap(rot.euler2mat)(jnp.asarray(eulers)))
    mats = np.round(mats)  # snap to signed permutations
    return _solve_host(mats, idx.coords)


def solve_and_attach(env, state):
    """Compute solution plans for a (possibly batched) solver-mode env state
    and return the state with goal_aux/goal refreshed. Host-side, un-jitted."""
    qpos = np.asarray(state.physics.qpos)
    batched = qpos.ndim == 2
    qs = qpos if batched else qpos[None]
    plans, lengths = [], []
    for q in qs:
        plan, length = solve_plan_host(env.cubelets, q)
        plans.append(plan)
        lengths.append(length)
    plan = jnp.asarray(np.stack(plans) if batched else plans[0])
    length = jnp.asarray(np.stack(lengths) if batched else lengths[0])
    step = jnp.zeros(length.shape, jnp.int32)
    aux = (plan, length, step)
    if batched:
        goal = jax.vmap(env._solver_goal)(state.physics, aux)
        dist = jax.vmap(env._goal_distance)(goal, state.physics)
    else:
        goal = env._solver_goal(state.physics, aux)
        dist = env._goal_distance(goal, state.physics)
    return state.replace(goal_aux=aux, goal=goal, prev_goal_distance=dist)


def goal_face_angles_after(
    idx: manip.CubeletIndex, qpos: jax.Array, plan: jax.Array, step: jax.Array
) -> jax.Array:
    """Face-angle goal for solution step `step`: the current (rounded) face
    angles with the planned rotation applied (unconstrained_cube_solver.py
    semantics: goals only constrain face angles + a quat that puts the
    target face up)."""
    angles = rot.round_to_straight_angles(manip.driver_angles(idx, qpos))
    entry = plan[jnp.clip(step, 0, plan.shape[0] - 1)]
    axis = entry[0].astype(jnp.int32)
    side = entry[1].astype(jnp.int32)
    angle = entry[2].astype(angles.dtype)
    didx = axis * 2 + side
    return rot.normalize_angles(angles.at[didx].add(angle))
