"""Simulation (Model-field) randomizers as pure device transforms.

Re-implements the reference sim randomizers
(/root/reference/robogym/randomization/sim.py:28-589) TPU-first: instead of
mutating MjModel C arrays per reset, each randomizer is a pure function
`(Model, key, param_values) -> Model` applied on-device inside the jitted
reset, so per-env randomized physics is just data in the batched Model
pytree (vmap over envs gives every env its own draw).

Includes: GravityRandomizer, PidRandomizer, JointMarginRandomizer,
GeomSolimpRandomizer, GeomSolrefRandomizer, and GenericSimRandomizer with
all 13 apply modes (sim.py:520-589) + name-prefix field selection
(sim.py:446-498).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.mjcf.model import Model
from robogym_tpu.randomization.core import Randomizer
from robogym_tpu.utils import rotation as rot

# PID user-gain parameter order (reference robogym/mujoco/constants.py:34-53)
PID_GAIN_PARAMS = [
    "pid_kp", "pid_ti", "pid_imax_clamp", "pid_td", "pid_dsmooth",
    "pid_error_deadband",
]

# fields living on model.opt rather than model (constants.py OPT_FIELDS)
OPT_FIELDS = {"gravity", "wind", "density", "viscosity", "impratio", "timestep"}


def _get_field(m: Model, field: str) -> jax.Array:
    if field in OPT_FIELDS:
        return getattr(m.opt, field)
    return getattr(m, field)


def _set_field(m: Model, field: str, value: jax.Array) -> Model:
    if field in OPT_FIELDS:
        return m.replace(opt=m.opt.replace(**{field: value}))
    return m.replace(**{field: value})


def _has_prefixes(name: str, prefixes: Union[str, Sequence[str]]) -> bool:
    if isinstance(prefixes, str):
        prefixes = [prefixes]
    return any(name.startswith(p) for p in prefixes)


class SimRandomizer(Randomizer[Model]):
    """Base for Model-transform randomizers. Captures initial field values at
    bind time (the reference captures them at `initialize`, sim.py:40-51)."""

    def __init__(self, name: str):
        super().__init__(name)
        self._initial_value: Optional[np.ndarray] = None

    def initialize(self, model: Model):
        """Capture pristine values from the compiled model (host-side)."""
        self._initialize(model)

    def _initialize(self, model: Model):
        pass


class GravityRandomizer(SimRandomizer):
    """(sim.py:115-137): gravity += random direction * (exp(value)-1)."""

    def __init__(self):
        super().__init__("gravity")
        self._register_sim_parameter(value_min=0.0)

    def _initialize(self, model: Model):
        self._initial_value = np.asarray(model.opt.gravity)

    def _apply(self, m: Model, key: jax.Array, values: jax.Array) -> Model:
        dtype = m.opt.gravity.dtype
        direction = rot.random_unity2(key).astype(dtype)
        mag = jnp.exp(values[0]) - 1.0
        noise = direction * 1.0 * mag
        return m.replace(
            opt=m.opt.replace(
                gravity=jnp.asarray(self._initial_value, dtype) + noise
            )
        )


class PidRandomizer(SimRandomizer):
    """(sim.py:140-167): multiplicative lognormal noise on one PID user-gain
    column across all actuators."""

    def __init__(self, field_name: str):
        super().__init__(field_name)
        self._idx = PID_GAIN_PARAMS.index(field_name)
        self._register_sim_parameter("mean")
        self._register_sim_parameter("std", value_min=0.0)

    def _initialize(self, model: Model):
        self._initial_value = np.asarray(model.actuator_gainprm[:, self._idx])

    def _apply(self, m: Model, key: jax.Array, values: jax.Array) -> Model:
        dtype = m.actuator_gainprm.dtype
        init = jnp.asarray(self._initial_value, dtype)
        noise = values[0] + jnp.abs(values[1]) * jax.random.normal(
            key, init.shape, dtype
        )
        new_col = init * jnp.exp(noise)
        return m.replace(
            actuator_gainprm=m.actuator_gainprm.at[:, self._idx].set(new_col)
        )


class JointMarginRandomizer(SimRandomizer):
    """(sim.py:170-187)."""

    def __init__(self):
        super().__init__("jnt_margin")
        self._register_sim_parameter(value_min=0.0)

    def _initialize(self, model: Model):
        self._initial_value = np.asarray(model.jnt_margin)

    def _apply(self, m: Model, key: jax.Array, values: jax.Array) -> Model:
        dtype = m.jnt_margin.dtype
        init = jnp.asarray(self._initial_value, dtype)
        u = jax.random.uniform(key, init.shape, dtype)
        return m.replace(
            jnt_margin=init + u * (jnp.exp(values[0]) - 1.0) * 0.15
        )


class GeomSolimpRandomizer(SimRandomizer):
    """(sim.py:190-266): lognormal perturbation of (dmin, dmax, width) with
    dmin <= dmax clipped into drange."""

    def __init__(self, drange=(0.5, 0.99)):
        super().__init__("geom_solimp")
        self._drange = drange
        for nm in ("dmax", "delta", "width"):
            self._register_sim_parameter(name=f"{nm}_mean")
            self._register_sim_parameter(name=f"{nm}_std", value_min=0.0)

    def _initialize(self, model: Model):
        self._initial_value = np.asarray(model.geom_solimp[:, :3])

    def _apply(self, m: Model, key: jax.Array, values: jax.Array) -> Model:
        dtype = m.geom_solimp.dtype
        init = jnp.asarray(self._initial_value, dtype)
        n = init.shape[0]
        k1, k2, k3 = jax.random.split(key, 3)
        dmax_mean, dmax_std, delta_mean, delta_std, width_mean, width_std = (
            values[0], jnp.abs(values[1]), values[2], jnp.abs(values[3]),
            values[4], jnp.abs(values[5]),
        )
        dmax = 1.0 - (1.0 - init[:, 1]) * jnp.exp(
            dmax_mean + dmax_std * jax.random.normal(k1, (n,), dtype)
        )
        dmax = jnp.clip(dmax, *self._drange)
        delta = (init[:, 1] - init[:, 0]) * jnp.exp(
            delta_mean + delta_std * jax.random.normal(k2, (n,), dtype)
        )
        dmin = jnp.clip(dmax - delta, *self._drange)
        width = init[:, 2] * jnp.exp(
            width_mean + width_std * jax.random.normal(k3, (n,), dtype)
        )
        solimp = (
            m.geom_solimp.at[:, 0].set(dmin).at[:, 1].set(dmax).at[:, 2].set(width)
        )
        return m.replace(geom_solimp=solimp)


class GeomSolrefRandomizer(SimRandomizer):
    """(sim.py:269-314)."""

    def __init__(self):
        super().__init__("geom_solref")
        self._register_sim_parameter("timeconst_mean")
        self._register_sim_parameter("timeconst_std", value_min=0.0)
        self._register_sim_parameter("dampratio_mean")
        self._register_sim_parameter("dampratio_std", value_min=0.0)

    def _initialize(self, model: Model):
        self._initial_value = np.asarray(model.geom_solref)

    def _apply(self, m: Model, key: jax.Array, values: jax.Array) -> Model:
        dtype = m.geom_solref.dtype
        init = jnp.asarray(self._initial_value, dtype)
        n = init.shape[0]
        k1, k2 = jax.random.split(key)
        tc = init[:, 0] * jnp.exp(
            values[0] + jnp.abs(values[1]) * jax.random.normal(k1, (n,), dtype)
        )
        dr = init[:, 1] * jnp.exp(
            values[2] + jnp.abs(values[3]) * jax.random.normal(k2, (n,), dtype)
        )
        return m.replace(
            geom_solref=m.geom_solref.at[:, 0].set(tc).at[:, 1].set(dr)
        )


class GenericSimRandomizer(SimRandomizer):
    """Generic Model-field randomizer with the reference's 13 apply modes
    (sim.py:343-589) and name-prefix id selection (sim.py:446-498)."""

    MODES_ONE_PARAM = (
        "coupled", "uncoupled", "coupled_mean_variance", "max_additive",
        "coupled_additive", "coupled_symmetric_ranges", "variance",
        "variance_additive",
    )
    MODES_TWO_PARAM = (
        "ranges", "coupled_ranges", "semicorrelated", "variance_mean_additive",
        "uncoupled_mean_variance",
    )

    def __init__(
        self,
        name: str,
        field_name: str,
        apply_mode: str = "uncoupled_mean_variance",
        coef: float = 1.0,
        geom_prefix=None,
        body_prefix=None,
        dof_jnt_prefix=None,
        jnt_prefix=None,
        positive_only: bool = False,
        zero_threshold: float = 0.0,
    ):
        super().__init__(name)
        self._field_name = field_name
        self._apply_mode = apply_mode
        self._coef = coef
        self._positive_only = positive_only
        self._geom_prefix = geom_prefix
        self._body_prefix = body_prefix
        self._dof_jnt_prefix = dof_jnt_prefix
        self._jnt_prefix = jnt_prefix
        self._zero_threshold = zero_threshold
        self._ids: Optional[np.ndarray] = None

        if apply_mode in (
            "coupled", "uncoupled", "coupled_mean_variance", "max_additive",
        ):
            self._register_sim_parameter()
        elif apply_mode in (
            "coupled_additive", "coupled_symmetric_ranges", "variance",
            "variance_additive",
        ):
            self._register_sim_parameter(value_min=0.0)
        elif apply_mode in ("ranges", "coupled_ranges", "semicorrelated"):
            self._register_sim_parameter(name="low")
            self._register_sim_parameter(name="high")
        elif apply_mode == "variance_mean_additive":
            self._register_sim_parameter(name="mean", value_min=0.0)
            self._register_sim_parameter(name="std", value_min=0.0)
        elif apply_mode == "uncoupled_mean_variance":
            self._register_sim_parameter(name="mean")
            self._register_sim_parameter(name="std", value_min=0.0)
        else:
            raise ValueError(f"Invalid mode: {apply_mode}")

    # ---- host-side binding -------------------------------------------------
    def _identify_ids(self, model: Model) -> Optional[np.ndarray]:
        """(sim.py:446-498): select ids by name prefix."""
        c = model.const
        if self._geom_prefix is not None:
            assert self._field_name.startswith("geom_")
            ids = [
                gid for name, gid in c.names["geom"].items()
                if _has_prefixes(name, self._geom_prefix)
            ]
        elif self._body_prefix is not None:
            assert self._field_name.startswith("body_")
            ids = [
                bid for name, bid in c.names["body"].items()
                if _has_prefixes(name, self._body_prefix)
            ]
        elif self._dof_jnt_prefix is not None:
            assert self._field_name.startswith("dof_")
            jnt_names = {jid: name for name, jid in c.names["joint"].items()}
            ids = [
                idx for idx, jid in enumerate(np.asarray(c.dof_jntid))
                if _has_prefixes(jnt_names[int(jid)], self._dof_jnt_prefix)
            ]
        elif self._jnt_prefix is not None:
            assert self._field_name.startswith("jnt_")
            ids = [
                jid for name, jid in c.names["joint"].items()
                if _has_prefixes(name, self._jnt_prefix)
            ]
        else:
            return None
        ids = np.asarray(sorted(ids), np.int32)
        assert len(ids) > 0, f"no IDs matched for {self._field_name}"
        return ids

    def _initialize(self, model: Model):
        self._ids = self._identify_ids(model)
        full = np.asarray(_get_field(model, self._field_name))
        self._initial_value = full[self._ids] if self._ids is not None else full
        self._sanity_check()

    def _sanity_check(self):
        multiplicative = {
            "coupled", "uncoupled", "ranges", "coupled_ranges", "semicorrelated",
            "coupled_symmetric_ranges", "variance", "coupled_mean_variance",
            "uncoupled_mean_variance",
        }
        if self._apply_mode in multiplicative:
            zeros = np.isclose(self._initial_value, 0.0).mean()
            assert zeros <= self._zero_threshold, (
                f"Mode is multiplicative on field {self._field_name}, but "
                f"{zeros:.3f} of values are zero (max {self._zero_threshold:.3f})"
            )

    # ---- device-side apply --------------------------------------------------
    def _apply(self, m: Model, key: jax.Array, values: jax.Array) -> Model:
        assert self._initial_value is not None, (
            f"randomizer {self.name} not initialized — call initialize(model)"
        )
        field = _get_field(m, self._field_name)
        dtype = field.dtype
        init = jnp.asarray(self._initial_value, dtype)
        pv = (values * self._coef).astype(dtype)
        shape = init.shape
        mode = self._apply_mode

        if mode == "coupled":
            new = init * jnp.exp(pv[0])
        elif mode == "coupled_additive":
            new = init + (jnp.exp(pv[0]) - 1.0)
        elif mode == "uncoupled":
            n = pv[0] + jax.random.normal(key, shape, dtype)
            new = init * jnp.exp(n * jnp.abs(pv[0]))
        elif mode in ("ranges", "semicorrelated"):
            low = jnp.minimum(0.0, -pv[0])
            high = jnp.maximum(0.0, pv[1])
            new = init * jnp.exp(
                jax.random.uniform(key, shape, dtype, low, high)
            )
        elif mode == "coupled_ranges":
            low = jnp.minimum(0.0, -pv[0])
            high = jnp.maximum(0.0, pv[1])
            new = init * jnp.exp(jax.random.uniform(key, (), dtype, low, high))
        elif mode == "coupled_symmetric_ranges":
            low, high = -jnp.abs(pv[0]), jnp.abs(pv[0])
            new = init * jnp.exp(
                jax.random.uniform(key, shape, dtype, low, high)
            )
        elif mode == "variance":
            new = init * jnp.exp(
                jax.random.normal(key, shape, dtype) * jnp.abs(pv[0])
            )
        elif mode == "variance_additive":
            scale = jnp.exp(jnp.abs(pv[0])) - 1.0
            new = init + scale * jax.random.normal(key, shape, dtype)
        elif mode == "variance_mean_additive":
            pos = jnp.exp(pv[0]) - 1.0
            scale = jnp.exp(jnp.abs(pv[1])) - 1.0
            noise = jnp.abs(pos + scale * jax.random.normal(key, shape, dtype))
            new = init + noise
        elif mode == "coupled_mean_variance":
            new = init * jnp.exp(
                pv[0] + jnp.abs(pv[0]) * jax.random.normal(key, shape, dtype)
            )
        elif mode == "uncoupled_mean_variance":
            new = init * jnp.exp(
                pv[0] + jnp.abs(pv[1]) * jax.random.normal(key, shape, dtype)
            )
        elif mode == "max_additive":
            high = jnp.exp(jnp.abs(pv[0])) - 1.0
            new = init + jax.random.uniform(key, shape, dtype, 0.0, high)
        else:
            raise RuntimeError(mode)

        if self._positive_only:
            new = jnp.maximum(new, 0.0)

        if self._ids is not None:
            full = field.at[jnp.asarray(self._ids)].set(new)
        else:
            full = jnp.broadcast_to(new, field.shape).astype(dtype)
        return _set_field(m, self._field_name, full)
