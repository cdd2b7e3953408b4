"""Gripper regrasp (anti-backdrive) state machine tests
(reference regrasp_helper.py:82-255 semantics)."""

import jax.numpy as jnp
import numpy as np

from robogym_tpu.robot import gripper as gripper_lib


def _step(s, pc, default, pos):
    out, s = gripper_lib.compute_regrasp_control(
        s, jnp.asarray(pc), jnp.asarray(default), jnp.asarray(pos)
    )
    return float(out), s


def test_regrasp_triggers_on_backdrive_and_reissues_prior_close():
    s = gripper_lib.init_regrasp(jnp.asarray(0.10), jnp.asarray(0.10))

    # two close commands, gripper follows: no regrasp, default passes through
    out1, s = _step(s, +0.5, 0.30, 0.10)
    assert out1 == 0.30 and not bool(s.regrasp_active)
    out2, s = _step(s, +0.5, 0.32, 0.12)
    assert out2 == 0.32 and not bool(s.regrasp_active)

    # keep command while the gripper opens (backdrive): trigger. The
    # reissued command is the SECOND-to-last returned control (0.30), which
    # beats the keep default (current pos 0.115).
    out3, s = _step(s, 0.0, 0.115, 0.115)
    assert bool(s.regrasp_active)
    assert out3 == 0.30

    # keep while active: bypass path re-issues the same command and does
    # NOT update caches (reference early-return before step 5)
    prev_obs = float(s.prev_obs_position)
    out4, s = _step(s, 0.0, 0.113, 0.113)
    assert out4 == 0.30
    assert float(s.prev_obs_position) == prev_obs

    # user closes harder than the regrasp command: user wins and regrasp
    # adopts the stronger command (regrasp_helper.py:206-214)
    out5, s = _step(s, +1.0, 0.40, 0.113)
    assert out5 == 0.40
    assert float(s.regrasp_cmd) == 0.40

    # user opens: regrasp cleared, default control returned
    out6, s = _step(s, -0.5, 0.05, 0.12)
    assert out6 == 0.05 and not bool(s.regrasp_active)


def test_regrasp_does_not_trigger_after_open_command():
    """Backdrive right after the user opened must NOT regrasp (the gripper
    is expected to open; reference note on condition (2))."""
    s = gripper_lib.init_regrasp(jnp.asarray(0.20), jnp.asarray(0.20))
    _, s = _step(s, -0.5, 0.10, 0.20)   # open command
    out, s = _step(s, 0.0, 0.15, 0.15)  # gripper opening afterwards
    assert not bool(s.regrasp_active)
    assert out == 0.15


def test_regrasp_ignores_tiny_position_noise():
    """Sub-1e-5 position moves count as 'still', not opening."""
    s = gripper_lib.init_regrasp(jnp.asarray(0.10), jnp.asarray(0.10))
    _, s = _step(s, +0.5, 0.30, 0.10)
    _, s = _step(s, +0.5, 0.32, 0.12)
    out, s = _step(s, 0.0, 0.1199999, 0.12 - 5e-6)  # noise, not backdrive
    assert not bool(s.regrasp_active)


def test_regrasp_zero_command_resets_cmd_direction():
    """Reference quirk (regrasp_helper.py:219-226): a ~zero command resets
    the last nonzero command direction, so close->keep->backdrive-on-next
    does not trigger (the close is two commands back)."""
    s = gripper_lib.init_regrasp(jnp.asarray(0.10), jnp.asarray(0.10))
    _, s = _step(s, +0.5, 0.30, 0.10)
    _, s = _step(s, 0.0, 0.12, 0.12)    # keep (not active): resets cmd dir
    out, s = _step(s, 0.0, 0.115, 0.115)  # backdrive now -> no trigger
    assert not bool(s.regrasp_active)
    assert out == 0.115
