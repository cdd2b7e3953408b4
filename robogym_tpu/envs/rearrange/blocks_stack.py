"""Block stacking env (reference envs/rearrange/blocks_stack.py:1-45):
blocks world with the ObjectStackGoal (tower over a random base; random
stack order unless `stack_fixed_order`). Default num_objects=2 like the
reference BlockStackEnvParameters."""

import jax.numpy as jnp

from robogym_tpu.envs.rearrange import blocks as blocks_lib


def make_env(constants=None, parameters=None, dtype=jnp.float32):
    cst = dict(constants or {})
    cst.setdefault("goal_generation", "stack")
    par = dict(parameters or {})
    sim = dict(par.get("simulation_params", {}))
    sim.setdefault("num_objects", 2)
    par["simulation_params"] = sim
    return blocks_lib.make_env(cst, par, dtype=dtype)
