"""Holdout authoring CLI (TPU build).

Re-implements /root/reference/robogym/scripts/create_holdout.py +
viewer/holdout_creation_viewer.py:13-100 (save keys): load a holdout
jsonnet/env, optionally settle or drive it, and save the current object
poses as `initial_state_<ts>.npz` / `goal_state_<ts>.npz` in the reference's
state format (obj_pos, obj_quat) — consumable by the holdout env's
`initial_state_path` / `goal_state_paths`.

Usage:
    python -m robogym_tpu.scripts.create_holdout <config.jsonnet> \
        out_dir=/tmp/my_holdout [kind=initial|goal] [settle_steps=20] [seed=0]
"""

from __future__ import annotations

import datetime
import os
import sys

import numpy as np

from robogym_tpu.utils.env_utils import load_env
from robogym_tpu.utils.parse_arguments import parse_arguments


def save_state(env, state, out_dir: str, kind: str = "initial") -> str:
    """Save the env state's object poses in the reference npz format
    (holdout_creation_viewer.py:55-71)."""
    from robogym_tpu.envs.rearrange import simulation as sim_lib

    os.makedirs(out_dir, exist_ok=True)
    ts = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    path = os.path.join(out_dir, f"{kind}_state_{ts}.npz")
    np.savez(
        path,
        obj_pos=np.asarray(sim_lib.object_positions(env.idx, state.physics)),
        obj_quat=np.asarray(sim_lib.object_quats(env.idx, state.physics)),
    )
    return path


def main(argv=None):
    import jax
    import jax.numpy as jnp

    argv = argv if argv is not None else sys.argv[1:]
    names, kwargs = parse_arguments(argv)
    assert names, "usage: create_holdout.py <env pattern> out_dir=..."
    pattern = names[0]
    out_dir = kwargs.pop("out_dir", ".")
    kind = kwargs.pop("kind", "initial")
    settle_steps = int(kwargs.pop("settle_steps", 20))
    seed = int(kwargs.pop("seed", 0))

    env = load_env(pattern, **kwargs)
    state, obs = jax.jit(env.reset)(jax.random.key(seed))
    step = jax.jit(env.step)
    for _ in range(settle_steps):
        state, obs, reward, done, info = step(
            state, jnp.zeros(env.action_size)
        )
    path = save_state(env, state, out_dir, kind)
    print(f"saved {kind} state to {path}")


if __name__ == "__main__":
    main()
