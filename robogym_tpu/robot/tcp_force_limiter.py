"""Force-based TCP control limiter (TPU build).

Pure-JAX re-implementation of
/root/reference/robogym/robot/control/tcp/force_based_tcp_control_limiter.py:1-120
and robot/utils/logistic_functions.py: when measured TCP force/torque exceeds
TRIGGER_FORCE_TORQUE_THRESHOLD, per-axis control is scaled down along a
normalized logistic sigmoid, reaching MINIMUM_SCALING_FACTOR at
MAXIMUM_TCP_FORCE_TORQUE; above the maximum the control reverses by
OVER_MAX_REVERSE_SCALE (backs the arm out of the contact).

Note: the reference declares `use_force_limiter=True` on
RobotControlParameters (robot_interface.py:69) and exercises the limiter in
its unit tests; its mujoco arms do not call it (it guards the physical
robot). Here it is applied on the simulated TCP path when the flag is set —
the thresholds make it a no-op until contact forces are large.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

LOGISTIC_ALPHA_PARAMETER = 0.81
MAXIMUM_TCP_FORCE_TORQUE = 40.0   # Newtons
TRIGGER_FORCE_TORQUE_THRESHOLD = MAXIMUM_TCP_FORCE_TORQUE * 0.50
MINIMUM_SCALING_FACTOR = 0.0
OVER_MAX_REVERSE_SCALE = -0.1


def logistic_sigmoid(x: jax.Array, a: float) -> jax.Array:
    """(logistic_functions.py:13-40) normalized sigmoid, slope param a."""
    eps = 1e-4
    a = jnp.clip(a, eps, 1.0 - eps)
    a = 1.0 / (1.0 - a) - 1.0
    A = 1.0 / (1.0 + jnp.exp(-((x - 0.5) * a * 2.0)))
    B = 1.0 / (1.0 + jnp.exp(a))
    C = 1.0 / (1.0 + jnp.exp(-a))
    return (A - B) / (C - B)


def clipped_logistic_sigmoid(x: jax.Array, a: float) -> jax.Array:
    """(logistic_functions.py:44-75): input clipped to [0, 1]."""
    return logistic_sigmoid(jnp.clip(x, 0.0, 1.0), a)


def get_element_wise_tcp_control_limits(
    tcp_force_and_torque: jax.Array, reverse_over_max: bool = True
) -> Tuple[jax.Array, jax.Array]:
    """(force_based_tcp_control_limiter.py:30-86). Input: (6,) measured
    |force|,|torque| per axis (x, y, z, roll, pitch, yaw). Returns
    (scales (6,), triggered bool)."""
    f = tcp_force_and_torque
    over = f > TRIGGER_FORCE_TORQUE_THRESHOLD
    x = jnp.maximum(MAXIMUM_TCP_FORCE_TORQUE - f, 0.0) / (
        MAXIMUM_TCP_FORCE_TORQUE - TRIGGER_FORCE_TORQUE_THRESHOLD
    )
    scaled = (
        clipped_logistic_sigmoid(x, LOGISTIC_ALPHA_PARAMETER)
        * (1.0 - MINIMUM_SCALING_FACTOR)
        + MINIMUM_SCALING_FACTOR
    )
    scales = jnp.where(over, scaled, jnp.ones_like(f))
    if reverse_over_max:
        scales = jnp.where(
            f > MAXIMUM_TCP_FORCE_TORQUE, OVER_MAX_REVERSE_SCALE, scales
        )
    return scales, jnp.any(over)
