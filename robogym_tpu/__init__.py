"""robogym_tpu — a TPU-native (JAX/XLA/Pallas) robotics RL environment framework.

Re-implements the capabilities of openai/robogym (reference at
/root/reference) as a batched, functionally-pure, `jit`/`vmap`/`pjit`-first
stack:

  * `robogym_tpu.mjcf`    — MJCF(XML) -> `Model` compiler (host-side, episodic)
  * `robogym_tpu.physics` — batched articulated-body dynamics + soft-constraint
                            contact solver (the `mj_step`/`mj_forward` analogue)
  * `robogym_tpu.robot`   — robot abstractions (shadow hand, UR16e arm, gripper)
  * `robogym_tpu.envs`    — dactyl / rearrange environment families
  * `robogym_tpu.parallel`— device mesh / sharding / collectives
"""

__version__ = "0.1.0"
