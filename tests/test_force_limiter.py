"""Force-based TCP control limiter behavior, mirroring the reference's
robot/control/tcp/test/test_force_based_tcp_control_limiter.py value table
(same thresholds, same logistic curve => same expected scales)."""

import jax.numpy as jnp
import numpy as np
import pytest

from robogym_tpu.robot.tcp_force_limiter import (
    MAXIMUM_TCP_FORCE_TORQUE,
    MINIMUM_SCALING_FACTOR,
    OVER_MAX_REVERSE_SCALE,
    TRIGGER_FORCE_TORQUE_THRESHOLD,
    get_element_wise_tcp_control_limits,
)


@pytest.mark.parametrize(
    "force_torque, expected_scales, expected_trigger",
    [
        (np.ones(6) * (TRIGGER_FORCE_TORQUE_THRESHOLD - 1.0), np.ones(6), False),
        (np.ones(6) * TRIGGER_FORCE_TORQUE_THRESHOLD, np.ones(6), False),
        (np.ones(6) * (TRIGGER_FORCE_TORQUE_THRESHOLD + 1.0),
         np.ones(6) * 0.9925695, True),
        (np.ones(6) * (MAXIMUM_TCP_FORCE_TORQUE - 1.0),
         np.ones(6) * 0.00743045, True),
        (np.ones(6) * MAXIMUM_TCP_FORCE_TORQUE,
         np.ones(6) * MINIMUM_SCALING_FACTOR, True),
        (np.ones(6) * (MAXIMUM_TCP_FORCE_TORQUE + 1.0),
         np.ones(6) * OVER_MAX_REVERSE_SCALE, True),
        (np.ones(6) * MAXIMUM_TCP_FORCE_TORQUE * 2.0,
         np.ones(6) * OVER_MAX_REVERSE_SCALE, True),
        (np.array([0.0, 0.0, 0.0, MAXIMUM_TCP_FORCE_TORQUE, 0.0, 0.0]),
         np.array([1.0, 1.0, 1.0, MINIMUM_SCALING_FACTOR, 1.0, 1.0]), True),
    ],
)
def test_element_wise_limits(force_torque, expected_scales, expected_trigger):
    scales, triggered = get_element_wise_tcp_control_limits(
        jnp.asarray(force_torque, jnp.float64)
    )
    assert np.allclose(np.asarray(scales), expected_scales, atol=1e-6)
    assert bool(triggered) == expected_trigger
