"""Wrapper layer — composable pure transforms inside one jitted step.

The reference wraps envs in ~20 nested gym wrappers
(/root/reference/robogym/envs/dactyl/common/dactyl_cube_wrappers.py:8-131,
/root/reference/robogym/wrappers/*). Here a wrapper is a `Transform`: a host
object holding static config plus pure functions over an explicit per-episode
state pytree. `WrappedEnv` composes a transform list around a functional env
without leaving jit:

  action path  (outermost transform first, like gym nesting):
      for t in reversed(transforms): action = t.action(...)
  observation/reward path (innermost first):
      for t in transforms: obs = t.observation(...)

Per-episode model randomization (`t.model`) runs at reset and its touched
Model fields are stored in `EnvState.model_fields`, applied by the env's
step — the TPU analogue of mutating MjModel per reset.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from robogym_tpu.envs import core


class Transform:
    """Base transform: identity everywhere. Subclasses override what they
    need. All methods must be pure/traceable."""

    #: Model field names this transform randomizes per episode
    #: (Model attribute names; "opt:<name>" for Option fields).
    model_fields: Sequence[str] = ()

    def init(self, key: jax.Array, env) -> Any:
        """Per-episode transform state (sampled noise params, buffers)."""
        return jnp.zeros((), jnp.int32)

    def model(self, tstate, model, key: jax.Array):
        """Per-episode Model randomization (applied at reset)."""
        return model

    def action(self, tstate, action: jax.Array, key: jax.Array, env, env_state):
        """Inward action transform. Returns (tstate', action')."""
        return tstate, action

    #: set True if the transform implements `physics` (per-step Data mutation)
    has_physics_hook: bool = False

    def physics(self, tstate, physics, key: jax.Array, env):
        """Per-STEP physics-state mutation before env.step (e.g. wind
        impulses on xfrc_applied, wrappers/cube.py RandomizedWindWrapper).
        Returns (tstate', physics')."""
        return tstate, physics

    def model_step(self, tstate, model_fields, key: jax.Array, env):
        """Per-STEP model-field mutation (e.g. the timestep flip-noise
        process, randomizations.py:194-305). Returns (tstate',
        model_fields'). Only called if `model_fields` on this transform is
        non-empty."""
        return tstate, model_fields

    def observation(self, tstate, obs: Dict, key: jax.Array, env, env_state):
        """Outward observation transform. Returns (tstate', obs')."""
        return tstate, obs

    def reward(self, tstate, reward: jax.Array):
        """Outward reward transform (reward is the [env, goal, success]
        triple). Returns (tstate', reward')."""
        return tstate, reward

    def done(self, tstate, done: jax.Array, env, env_state):
        return tstate, done

    @property
    def name(self) -> str:
        return type(self).__name__


class WrappedEnv:
    """Functional env + transform stack; same reset/step API as the base env
    so it vmaps/pjits identically."""

    def __init__(self, env, transforms: Sequence[Transform]):
        self.env = env
        self.transforms = list(transforms)
        self.dtype = env.dtype
        self.constants = env.constants
        self.action_size = env.action_size
        # collect the union of randomized model fields (static)
        self._model_field_names: List[str] = []
        for t in self.transforms:
            for f in t.model_fields:
                if f not in self._model_field_names:
                    self._model_field_names.append(f)

    # -- helpers ------------------------------------------------------------
    def _split(self, key, n):
        return jax.random.split(key, n)

    def _init_transforms(self, key: jax.Array):
        keys = jax.random.split(key, max(len(self.transforms), 1))
        return tuple(
            t.init(k, self.env) for t, k in zip(self.transforms, keys)
        )

    def _randomize_model(self, tstates, key: jax.Array):
        """Run model transforms; return the dict of overridden fields."""
        if not self._model_field_names:
            return None
        m = self.env.model
        keys = jax.random.split(key, max(len(self.transforms), 1))
        for t, ts, k in zip(self.transforms, tstates, keys):
            m = t.model(ts, m, k)
        out = {}
        for f in self._model_field_names:
            if f.startswith("opt:"):
                out[f] = getattr(m.opt, f[4:])
            else:
                out[f] = getattr(m, f)
        return out

    # -- env API --------------------------------------------------------------
    def reset(self, key: jax.Array):
        k_env, k_init, k_model, k_obs = jax.random.split(key, 4)
        state, obs = self.env.reset(k_env)
        tstates = self._init_transforms(k_init)
        model_fields = self._randomize_model(tstates, k_model)
        if model_fields is not None:
            # merge over env-set per-episode fields (e.g. mesh selection)
            merged = dict(state.model_fields or {})
            merged.update(model_fields)
            state = state.replace(model_fields=merged)

        new_tstates = []
        keys = jax.random.split(k_obs, max(len(self.transforms), 1))
        for t, ts, k in zip(self.transforms, tstates, keys):
            ts, obs = t.observation(ts, obs, k, self.env, state)
            new_tstates.append(ts)
        state = state.replace(goal_aux=(state.goal_aux, tuple(new_tstates)))
        return state, obs

    def step(self, state, action: jax.Array):
        inner_aux, tstates = state.goal_aux
        tstates = list(tstates)
        key = state.key
        key, k_act, k_obs = jax.random.split(key, 3)

        # action path: outermost wrapper first
        akeys = jax.random.split(k_act, max(len(self.transforms), 1))
        for i in reversed(range(len(self.transforms))):
            tstates[i], action = self.transforms[i].action(
                tstates[i], action, akeys[i], self.env, state
            )

        # per-step model-field mutation (timestep noise, ...)
        model_fields = state.model_fields
        if self._model_field_names:
            mkeys = jax.random.split(jax.random.fold_in(key, 1),
                                     max(len(self.transforms), 1))
            for i, t in enumerate(self.transforms):
                if t.model_fields:
                    tstates[i], model_fields = t.model_step(
                        tstates[i], model_fields, mkeys[i], self.env
                    )

        # per-step physics mutation (wind impulses, ...)
        physics = state.physics
        if any(t.has_physics_hook for t in self.transforms):
            pkeys = jax.random.split(jax.random.fold_in(key, 2),
                                     max(len(self.transforms), 1))
            for i, t in enumerate(self.transforms):
                if t.has_physics_hook:
                    tstates[i], physics = t.physics(
                        tstates[i], physics, pkeys[i], self.env
                    )

        inner_state = state.replace(
            goal_aux=inner_aux, key=key, model_fields=model_fields,
            physics=physics,
        )
        inner_state, obs, reward, done, info = self.env.step(inner_state, action)

        okeys = jax.random.split(k_obs, max(len(self.transforms), 1))
        for i in range(len(self.transforms)):
            tstates[i], reward = self.transforms[i].reward(tstates[i], reward)
            tstates[i], obs = self.transforms[i].observation(
                tstates[i], obs, okeys[i], self.env, inner_state
            )
            tstates[i], done = self.transforms[i].done(
                tstates[i], done, self.env, inner_state
            )

        out_state = inner_state.replace(
            goal_aux=(inner_state.goal_aux, tuple(tstates))
        )
        return out_state, obs, reward, done, info

    def _observe(self, state):
        inner_aux, _ = state.goal_aux
        return self.env._observe(state.replace(goal_aux=inner_aux))


def apply_named_wrappers(env, wrappers: Sequence) -> WrappedEnv:
    """Wrapper list application (reference named_wrappers.py:15-24): each
    entry is [TransformClassOrFactory, kwargs?]. Classes are resolved against
    robogym_tpu.wrappers registry."""
    from robogym_tpu import wrappers as W

    transforms = []
    for entry in wrappers:
        name = entry[0]
        kwargs = entry[1] if len(entry) > 1 else {}
        cls = getattr(W, name) if isinstance(name, str) else name
        transforms.append(cls(env=env, **kwargs))
    return WrappedEnv(env, transforms)


def edit_wrappers(
    wrappers: List,
    insert_above=(),
    insert_below=(),
    replace=(),
    delete=(),
) -> List:
    """List surgery by wrapper name (reference named_wrappers.py:27-76)."""
    wrappers = [list(w) for w in wrappers]

    def find(name: str) -> int:
        for i, w in enumerate(wrappers):
            wname = w[0] if isinstance(w[0], str) else w[0].__name__
            if wname == name:
                return i
        raise ValueError(f"Wrapper {name} not found")

    for name, new in insert_above:
        wrappers.insert(find(name), list(new))
    for name, new in insert_below:
        wrappers.insert(find(name) + 1, list(new))
    for name, new in replace:
        wrappers[find(name)] = list(new)
    for name in delete:
        del wrappers[find(name)]
    return wrappers
