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

import jax as _jax

# This jaxlib lowers f32 dots at DEFAULT precision to one-pass bf16 — on
# every backend, including CPU (measured: 64x64 f32 matmul max error 0.07
# vs 2.6e-6 at 'highest'). The engine leans on f32 matmuls for exact
# one-hot row selection, CRB mass-matrix assembly, and broadphase
# contractions; bf16 rounding there silently costs ~3 digits of
# trajectory accuracy. Pin f32 matmuls to true f32 (TPU: the 3-pass
# bf16 emulation) for every consumer of the package — but only when the
# process is still at the JAX default, so a precision the user (or a
# co-resident library) chose explicitly before import is respected.
if _jax.config.jax_default_matmul_precision is None:
    _jax.config.update("jax_default_matmul_precision", "float32")
