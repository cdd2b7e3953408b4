"""Randomizer graph: host-side registry, device-side pure transforms.

Re-implements the reference randomizer framework
(/root/reference/robogym/randomization/common.py:96-243 and env.py:45-262)
TPU-first: a `Randomizer` is a host object carrying ADR-addressable
parameters plus a pure `apply(target, key, values)` device function. The
chained application runs inside the jitted reset/step; parameter values are
passed in as a traced vector so ADR `set_value` never recompiles.

Path addressing matches the reference ADR interface
(env.py:196-249; docs/env_param_interface.md): `"<randomizer>:<param>"`,
nested groups joined with `:`.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable, Dict, Generic, List, Optional, Sequence, TypeVar

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.randomization.parameters import (
    FloatRandomizerParameter,
    RandomizerParameter,
)

TType = TypeVar("TType")


class Randomizer(Generic[TType]):
    """Base randomizer (common.py:96-170). Subclasses implement `_apply`
    as a pure function of (target, key, values)."""

    def __init__(self, name: str, enabled: bool = True):
        self.name = name
        self._parameters: "OrderedDict[str, RandomizerParameter]" = OrderedDict()
        self._enabled = enabled

    # ---- host API --------------------------------------------------------
    def register_parameter(self, parameter: RandomizerParameter):
        assert parameter.name not in self._parameters, (
            f"Parameter with name {parameter.name} already exists."
        )
        self._parameters[parameter.name] = parameter
        return parameter

    def get_parameters(self) -> List[RandomizerParameter]:
        return list(self._parameters.values())

    def get_parameter(self, name: str) -> RandomizerParameter:
        assert name in self._parameters, (
            f"Parameter {name} does not exist in randomizer {self.name}."
        )
        return self._parameters[name]

    def _register_sim_parameter(
        self, name="value", initial_value=0.0, value_min=-4.0, value_max=4.0,
        delta=None,
    ):
        """(sim.py:66-92)."""
        if delta is None:
            delta = (value_max - value_min) / 10
        return self.register_parameter(
            FloatRandomizerParameter(
                name, initial_value=initial_value,
                value_range=(value_min, value_max), delta=delta,
            )
        )

    def enable(self):
        self._enabled = True

    def disable(self):
        self._enabled = False

    @property
    def enabled(self) -> bool:
        return self._enabled

    def param_values(self) -> np.ndarray:
        """Current parameter vector to feed the jitted apply."""
        return np.asarray(
            [p.get_value() for p in self._parameters.values()], np.float64
        )

    # ---- device API ------------------------------------------------------
    def apply(self, target: TType, key: jax.Array, values: jax.Array) -> TType:
        """Pure device transform. `values` is this randomizer's parameter
        vector (traced). Enabled/disabled is a host-side (static) switch."""
        if not self._enabled:
            return target
        return self._apply(target, key, values)

    def _apply(self, target: TType, key: jax.Array, values: jax.Array) -> TType:
        raise NotImplementedError


class ChainedRandomizer(Randomizer[TType]):
    """Apply a list of randomizers in order (common.py:173-243).

    `get_parameters` flattens child parameters with `<child>:<param>` paths.
    """

    def __init__(self, name: str, randomizers: Sequence[Randomizer]):
        super().__init__(name, enabled=True)
        self._randomizers: "OrderedDict[str, Randomizer]" = OrderedDict()
        for r in randomizers:
            self.register_randomizer(r)

    def register_randomizer(self, randomizer: Randomizer) -> Randomizer:
        assert randomizer.name not in self._randomizers, (
            f"Randomizer with name {randomizer.name} already exists."
        )
        self._randomizers[randomizer.name] = randomizer
        return randomizer

    def get_randomizers(self) -> List[Randomizer]:
        return list(self._randomizers.values())

    def get_randomizer(self, name: str) -> Randomizer:
        assert name in self._randomizers, f"Randomizer {name} does not exist."
        return self._randomizers[name]

    def get_parameters(self) -> List[RandomizerParameter]:
        out: List[RandomizerParameter] = []
        for name, r in self._randomizers.items():
            for p in r.get_parameters():
                out.append(p)
        return out

    def param_values(self) -> Dict[str, np.ndarray]:
        return {name: r.param_values() for name, r in self._randomizers.items()}

    def apply(self, target, key: jax.Array, values: Dict[str, jax.Array]):
        for name, r in self._randomizers.items():
            key, k = jax.random.split(key)
            target = r.apply(target, k, values[name])
        return target


class EnvRandomization:
    """ADR-facing registry over all env randomizers (env.py:151-262).

    get_parameter/update_parameter use `:`-joined paths, e.g.
    `"sim:gravity:value"` or `"parameters:num_objects"`.
    """

    def __init__(self, randomizers: Sequence[Randomizer]):
        self._randomizers: "OrderedDict[str, Randomizer]" = OrderedDict(
            (r.name, r) for r in randomizers
        )

    def get_randomizer(self, name: str) -> Randomizer:
        return self._randomizers[name]

    def enumerate_randomizers(self) -> List[Randomizer]:
        return list(self._randomizers.values())

    def _walk(self, path: str) -> RandomizerParameter:
        parts = path.split(":")
        node: Randomizer = self._randomizers[parts[0]]
        for part in parts[1:-1]:
            node = node.get_randomizer(part)  # type: ignore[attr-defined]
        return node.get_parameter(parts[-1])

    def get_parameter(self, path: str) -> RandomizerParameter:
        """(env.py:196-226)."""
        return self._walk(path)

    def update_parameter(self, path: str, value):
        """(env.py:228-249)."""
        self._walk(path).set_value(value)

    def get_parameters(self) -> List[RandomizerParameter]:
        out = []
        for r in self._randomizers.values():
            out.extend(r.get_parameters())
        return out

    def reset(self):
        pass
