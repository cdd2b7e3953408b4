"""Blocks pick-and-place env (reference envs/rearrange/blocks_pickandplace.py):
blocks world with the PickAndPlaceGoal (first object lifted into the air)."""

import jax.numpy as jnp

from robogym_tpu.envs.rearrange import blocks as blocks_lib


def make_env(constants=None, parameters=None, dtype=jnp.float32):
    cst = dict(constants or {})
    cst.setdefault("goal_generation", "pickandplace")
    return blocks_lib.make_env(cst, parameters, dtype=dtype)
