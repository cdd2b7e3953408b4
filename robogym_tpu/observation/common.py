"""Observation provider framework (TPU build).

Re-implements the reference observation core
(/root/reference/robogym/observation/common.py:8-127): providers own data
refreshed at a `SyncType` cadence; observations are cheap reads of provider
state. In the functional TPU design a provider is a pure function
`(env, EnvState) -> pytree` plus a static sync cadence; `ObservationStack`
stages the reads so RESET/RESET_GOAL-cadence values are computed once and
carried in the env state rather than recomputed per step (the reference's
caching semantics, robot_env.py:273-301).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Callable, Dict, Optional


class SyncType(enum.Enum):
    """(observation/common.py:8-33): how often provider data refreshes."""

    STEP = 0
    RESET_GOAL = 1
    RESET = 2


@dataclasses.dataclass(frozen=True)
class ObservationProvider:
    """A named pure read of (env, state) with a sync cadence."""

    name: str
    read: Callable[[Any, Any], Any]
    sync_type: SyncType = SyncType.STEP


class Observation:
    """A cheap view over provider data (observation/common.py:83-127)."""

    def __init__(self, provider: str, key: Optional[str] = None):
        self.provider = provider
        self.key = key

    def get(self, provider_data: Dict[str, Any]):
        data = provider_data[self.provider]
        return data[self.key] if self.key is not None else data


class ObservationStack:
    """Stages provider reads by cadence.

    At reset every provider runs; at goal reset, RESET_GOAL + STEP; at step
    only STEP providers. Cached (slower-cadence) values ride in the env
    state's `goal_aux` pytree, preserving the reference's staleness
    semantics for e.g. goal images (observation/goal.py:46-82).
    """

    def __init__(self, providers: Dict[str, ObservationProvider]):
        self.providers = dict(providers)

    def sync(self, env, state, cached: Optional[Dict] = None,
             sync_type: SyncType = SyncType.STEP) -> Dict[str, Any]:
        out = dict(cached or {})
        for name, p in self.providers.items():
            # refresh when the provider's cadence is due at this sync level;
            # also populate any missing entry (first RESET) so the cache
            # pytree has a stable structure across lax.cond branches. STEP
            # providers are read directly at observe time — their cache
            # entry is never consumed, only structural.
            if sync_type.value <= p.sync_type.value or name not in out:
                out[name] = p.read(env, state)
        return out

    def observe(self, obs_map: Dict[str, Observation],
                provider_data: Dict[str, Any]) -> Dict[str, Any]:
        return {k: o.get(provider_data) for k, o in obs_map.items()}
