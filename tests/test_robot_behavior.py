"""Composite-robot action semantics parity.

Mirrors the value tables of /root/reference/robogym/envs/rearrange/tests/
test_rearrange_robots.py (denormalization, action dims, actuator layout)
and test_robot_polymorphism.py (control-mode construction matrix).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robogym_tpu.robot import composite as composite_lib
from robogym_tpu.robot import gripper as gripper_lib
from robogym_tpu.robot import tcp_solver
from robogym_tpu.robot import ur16e as arm_lib

ControlMode = composite_lib.ControlMode
TcpSolverMode = composite_lib.TcpSolverMode

# (free_dof_tcp_arm.py:13-17)
ANGLE_SCALER = np.array([np.deg2rad(200), np.deg2rad(600)])


@pytest.fixture(scope="module")
def world():
    from robogym_tpu.envs.rearrange.blocks import make_env

    env = make_env(
        dict(stabilize_objects=False),
        dict(simulation_params=dict(num_objects=1, max_num_objects=1)),
    )
    state, _ = jax.jit(env.reset)(jax.random.key(0))
    return env, state


@pytest.mark.parametrize("mpc", [1.0, 0.05])
@pytest.mark.parametrize("sign", [1.0, -1.0])
def test_tcp_arm_denormalization_ur16(world, mpc, sign):
    """(test_rearrange_robots.py:44-80): a TCP_ROLL_YAW action of +/-1
    advances the mocap position by exactly +/-max_position_change per axis
    and commands ROLL/PITCH rotations scaled by DOF_DIM_SPEED_SCALE."""
    env, state = world
    d = state.physics
    tcp_body = env.robot.arm.tcp_body_id
    action = sign * jnp.ones(5)

    d2 = tcp_solver.tcp_set_position_control(
        env.model, d, tcp_body, action, ControlMode.TCP_ROLL_YAW, mpc
    )
    pos_delta = np.asarray(d2.mocap_pos[0] - d.xpos[tcp_body])
    np.testing.assert_allclose(pos_delta, sign * mpc * np.ones(3), atol=1e-6)

    # the commanded quat delta realizes rotations of |ANGLE_SCALER * mpc|
    # about the controlled axes (before axis alignment, checked per-axis)
    for i, expected in enumerate(ANGLE_SCALER * mpc):
        one = jnp.zeros(5).at[3 + i].set(sign)
        delta = tcp_solver.get_tcp_quat_delta(
            d, tcp_body, one[3:] * jnp.asarray(ANGLE_SCALER * mpc,
                                               jnp.float32),
            tcp_solver.TCP_ROLL_YAW_DOFS, alignment_axis=None,
        )
        from robogym_tpu.utils import rotation as rot

        target = np.asarray(d.xquat[tcp_body] + delta)
        target = target / np.linalg.norm(target)
        diff = rot.quat_difference(jnp.asarray(target), d.xquat[tcp_body])
        angle = float(rot.quat_magnitude(rot.quat_normalize(diff)))
        np.testing.assert_allclose(angle, expected % (2 * np.pi)
                                   if expected <= np.pi else
                                   2 * np.pi - expected % (2 * np.pi),
                                   atol=2e-3)


def test_gripper_denormalization(world):
    """(test_rearrange_robots.py:61): gripper action -1 from the neutral
    state commands ctrl -0.022365 — half the ctrlrange span, a property of
    the shipped robotiq XML consumed verbatim."""
    env, state = world
    d = state.physics
    gi = env.robot.gripper
    d = d.replace(qpos=d.qpos.at[gi.joint_qpos_id].set(0.0))
    ctrl = gripper_lib.denormalize_position_control(
        gi, env.model, d, jnp.asarray([-1.0])
    )[gi.actuator_id]
    cr = np.asarray(env.model.actuator_ctrlrange[gi.actuator_id])
    expected = max(-(cr[1] - cr[0]) / 2.0, cr[0])
    np.testing.assert_allclose(float(ctrl), expected, atol=1e-6)
    np.testing.assert_allclose(expected, -0.022365, atol=1e-4)


@pytest.mark.parametrize(
    "mode,dims",
    [(ControlMode.JOINT, 7), (ControlMode.TCP_WRIST, 5),
     (ControlMode.TCP_ROLL_YAW, 6)],
)
def test_action_space_dims(mode, dims):
    p = composite_lib.RobotControlParameters(control_mode=mode)
    assert p.action_dims() == dims


@pytest.mark.parametrize(
    "mode,solver,needs_solver_sim",
    [
        (ControlMode.JOINT, TcpSolverMode.MOCAP, False),
        (ControlMode.TCP_WRIST, TcpSolverMode.MOCAP, False),
        (ControlMode.TCP_ROLL_YAW, TcpSolverMode.MOCAP, False),
        (ControlMode.TCP_WRIST, TcpSolverMode.MOCAP_IK, True),
        (ControlMode.TCP_ROLL_YAW, TcpSolverMode.MOCAP_IK, True),
    ],
)
def test_control_mode_matrix(mode, solver, needs_solver_sim):
    """(test_rearrange_robots.py:108-139 + test_robot_polymorphism.py):
    mocap_ik TCP modes are joint-actuated and need the dual solver sim;
    plain mocap TCP modes drive the free wrist directly."""
    p = composite_lib.RobotControlParameters(
        control_mode=mode, tcp_solver_mode=solver
    )
    assert p.requires_solver_sim() == needs_solver_sim
    if mode == ControlMode.JOINT:
        assert p.is_joint_actuated() and not p.is_tcp_controlled()
    else:
        assert p.is_tcp_controlled()


def test_joint_zero_action_holds_pose(world):
    """Relative zero action commands ctrl = current joint pos
    (test_rearrange_robots.py joint-mode semantics)."""
    env, state = world
    d = state.physics
    p = composite_lib.RobotControlParameters(control_mode=ControlMode.JOINT)
    robot = dataclasses.replace(env.robot, params=p)
    ctrl = composite_lib.set_position_control_joint(
        robot, env.model, d, jnp.zeros(7)
    )
    arm_ctrl = np.asarray(ctrl[jnp.asarray(robot.arm.actuator_ids)])
    arm_qpos = np.asarray(d.qpos[jnp.asarray(robot.arm.joint_qpos_ids)])
    np.testing.assert_allclose(arm_ctrl, arm_qpos, atol=1e-6)


def test_default_max_position_change_values():
    """(robot_interface.py:102-128 defaults by mode)."""
    P = composite_lib.RobotControlParameters
    joint = P(control_mode=ControlMode.JOINT)
    tcp_mocap = P(control_mode=ControlMode.TCP_ROLL_YAW,
                  tcp_solver_mode=TcpSolverMode.MOCAP)
    assert joint.default_max_position_change() == \
        P.JOINT_CONTROL_DEFAULT_MAX_POSITION_CHANGE
    assert tcp_mocap.default_max_position_change() == \
        P.MOCAP_DEFAULT_MAX_POSITION_CHANGE
    override = P(control_mode=ControlMode.JOINT, max_position_change=0.3)
    assert override.default_max_position_change() == 0.3
