"""Blocks reach env (reference envs/rearrange/blocks_reach.py:1-39): the TCP
must reach the (single) object's sampled goal position. `det-state` uses the
deterministic goal-position pool (goals/object_reach_goal.py:56-81)."""

import jax.numpy as jnp

from robogym_tpu.envs.rearrange import blocks as blocks_lib


def make_env(constants=None, parameters=None, dtype=jnp.float32):
    cst = dict(constants or {})
    gen = cst.pop("goal_generation", "state")
    cst["goal_generation"] = "det-reach" if gen == "det-state" else "reach"
    par = dict(parameters or {})
    sim = dict(par.get("simulation_params", {}))
    sim.setdefault("num_objects", 1)
    par["simulation_params"] = sim
    return blocks_lib.make_env(cst, par, dtype=dtype)
