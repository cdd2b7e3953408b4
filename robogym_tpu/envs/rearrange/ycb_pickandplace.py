"""YCB pick-and-place (reference envs/rearrange/ycb_pickandplace.py): mesh
objects with the PickAndPlaceGoal."""

import jax.numpy as jnp

from robogym_tpu.envs.rearrange import mesh as mesh_lib


def make_env(constants=None, parameters=None, mesh_names=None,
             dtype=jnp.float32):
    cst = dict(constants or {})
    cst.setdefault("goal_generation", "pickandplace")
    return mesh_lib.make_env(cst, parameters, mesh_names=mesh_names,
                             dtype=dtype)
