"""Per-reset parameter -> Model mutators (modifier registry).

Reference: /root/reference/robogym/mujoco/modifiers/base.py:1-12 (Modifier),
modifiers/timestep.py:4-8 (TimestepModifier), registered per parameter name
via RobotEnv.register_modifier (robot_env.py:508-511) and applied each reset
by _setup_simulation_from_parameters (robot_env.py:512-520) as
`modifier(getattr(self.parameters, param_name))`.

TPU-native shape: a Modifier is a PURE function `(Model, value) -> Model`
instead of an in-place MjModel mutation. Envs run `apply_modifiers` inside
the jitted reset, so a modifier's output fields can ride
`EnvState.model_fields` per-episode under vmap (envs/core.py:60-95) — the
same mechanism the sim randomizers use — or rebuild a broadcast Model when
the value is shared across the batch.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from robogym_tpu.mjcf.model import Model


class Modifier:
    """Base parameter modifier: maps a parameter value onto a new Model."""

    def __call__(self, model: Model, value) -> Model:
        raise NotImplementedError


class TimestepModifier(Modifier):
    """Set `opt.timestep` (modifiers/timestep.py:4-8)."""

    def __call__(self, model: Model, timestep) -> Model:
        ts = jnp.asarray(timestep, model.opt.timestep.dtype)
        return model.replace(opt=model.opt.replace(timestep=ts))


class FieldRowsModifier(Modifier):
    """Scale or set rows of one runtime Model field for named elements.

    The general analogue of the reference's ad-hoc modifiers (e.g. the
    cube-size modifiers in envs/dactyl/common/mujoco_modifiers.py): resolve
    element names to ids once at construction (host-side), then apply a
    value inside jit.

    mode: "set" writes the value into the selected rows, "scale" multiplies
    them by it.
    """

    def __init__(self, field: str, kind: str, names: Sequence[str],
                 mode: str = "scale"):
        assert mode in ("set", "scale")
        self.field = field
        self.kind = kind
        self.element_names = tuple(names)
        self.mode = mode
        self._ids: np.ndarray | None = None

    def _resolve(self, model: Model) -> np.ndarray:
        if self._ids is None:
            table = model.const.names[self.kind]
            self._ids = np.asarray(
                [table[n] for n in self.element_names], np.int32
            )
        return self._ids

    def __call__(self, model: Model, value) -> Model:
        ids = jnp.asarray(self._resolve(model))
        arr = getattr(model, self.field)
        v = jnp.asarray(value, arr.dtype)
        rows = arr.at[ids]
        new = rows.set(v) if self.mode == "set" else rows.mul(v)
        return model.replace(**{self.field: new})


def apply_modifiers(
    model: Model,
    modifiers: List[Tuple[str, Modifier]],
    parameters: Dict[str, Any],
) -> Model:
    """Run every registered (parameter_name, modifier) pair against the
    current parameter values (robot_env.py:512-520 semantics). Parameters
    whose name is missing from `parameters` are skipped."""
    for name, mod in modifiers:
        if name in parameters:
            model = mod(model, parameters[name])
    return model
