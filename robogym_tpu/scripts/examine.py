"""Examine CLI (TPU build).

Re-implements /root/reference/robogym/scripts/examine.py:15-60: load an env
by name fragment / .py path / .json config, run it, and print per-step
summaries. With no interactive GLFW viewer on a TPU host, the default mode
is a textual trace; `--record` dumps the qpos trajectory to .npz for offline
rendering/inspection (the viewer analogue; reference viewer/env_viewer.py).

Usage:
    python -m robogym_tpu.scripts.examine dactyl/locked.py num_steps=20
    python -m robogym_tpu.scripts.examine rearrange/blocks.py \
        constants='@{"mujoco_substeps": 10}' record=traj.npz
"""

from __future__ import annotations

import sys

import numpy as np

from robogym_tpu.utils.env_utils import load_env
from robogym_tpu.utils.parse_arguments import parse_arguments


def main(argv=None):
    import jax
    import jax.numpy as jnp

    argv = argv if argv is not None else sys.argv[1:]
    names, kwargs = parse_arguments(argv)
    assert names, "usage: examine.py <env pattern> [key=value ...]"
    pattern = names[0]

    num_steps = int(kwargs.pop("num_steps", 20))
    seed = int(kwargs.pop("seed", 0))
    record = kwargs.pop("record", None)
    teleop = bool(kwargs.pop("teleop", False))
    interactive = bool(kwargs.pop("interactive", False))

    env = load_env(pattern, **kwargs)
    print(f"Loaded env {type(env).__name__} (action_size={env.action_size})")

    if interactive:
        # curses live loop (the EnvViewer / RobotControlViewer analogue)
        from robogym_tpu.viewer.interactive import InteractiveViewer

        return InteractiveViewer(env, seed=seed, teleop=teleop).run()
    if teleop:
        return _teleop_loop(env, seed, record)

    reset = jax.jit(env.reset)
    step = jax.jit(env.step)
    state, obs = reset(jax.random.key(seed))
    print("observation keys:", sorted(obs.keys()))

    key = jax.random.key(seed + 1)
    traj = [np.asarray(state.physics.qpos)]
    for t in range(num_steps):
        key, k = jax.random.split(key)
        action = jax.random.uniform(
            k, (env.action_size,), minval=-1.0, maxval=1.0
        )
        state, obs, reward, done, info = step(state, action)
        traj.append(np.asarray(state.physics.qpos))
        r = np.asarray(reward)
        print(
            f"t={t:4d} reward={np.array2string(r, precision=3)} "
            f"done={bool(done)} "
            f"successes={int(np.asarray(info.get('successes_so_far', 0)))}"
        )
        if bool(done):
            print("episode done; resetting")
            key, k = jax.random.split(key)
            state, obs = reset(k)

    if record:
        np.savez(record, qpos=np.stack(traj))
        print(f"saved {len(traj)}-frame qpos trajectory to {record}")


def _teleop_loop(env, seed: int, record):
    """Interactive stdin teleop (the RobotControlViewer analogue,
    /root/reference/robogym/viewer/robot_control_viewer.py:44-107, driven by
    typed commands instead of GLFW keys). Commands: up/down/left/right,
    z+/z-, wrist+/wrist-, grip+/grip-, +/- (speed), q (quit)."""
    import jax
    import jax.numpy as jnp

    from robogym_tpu.robot.teleop import URGripperArmController

    ctl = URGripperArmController(env)
    reset = jax.jit(env.reset)
    step = jax.jit(env.step)
    state, obs = reset(jax.random.key(seed))
    traj = [np.asarray(state.physics.qpos)]
    print("teleop: " + " ".join(sorted(ctl.KEYMAP)) + " | +/- speed | q quit")
    while True:
        try:
            cmd = input("> ").strip()
        except EOFError:
            break
        if cmd == "q":
            break
        try:
            action = ctl.action_for(cmd) if cmd else ctl.zero_control()
        except KeyError:
            print(f"unknown command {cmd!r}")
            continue
        state, obs, reward, done, info = step(state, jnp.asarray(action))
        traj.append(np.asarray(state.physics.qpos))
        print(f"reward={np.array2string(np.asarray(reward), precision=3)} "
              f"done={bool(done)}")
    if record:
        np.savez(record, qpos=np.stack(traj))
        print(f"saved {len(traj)}-frame qpos trajectory to {record}")


if __name__ == "__main__":
    main()
