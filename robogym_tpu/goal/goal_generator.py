"""Abstract goal-generator protocol (TPU build).

Re-implements /root/reference/robogym/goal/goal_generator.py:7-68 as a
functional protocol: a goal generator produces goal pytrees from PRNG keys
and measures distances as pure functions. Concrete generators:
robogym_tpu.envs.dactyl.locked (LockedParallelGoal logic),
robogym_tpu.envs.dactyl.reach (FingertipPosGoal logic),
robogym_tpu.envs.rearrange.goals (ObjectState/Reach/Stack/PickAndPlace).
"""

from __future__ import annotations

from typing import Any, Dict, Protocol, Set

import jax


class GoalGenerator(Protocol):
    """Functional goal API (goal_generator.py:7-68):

    next_goal(key, ...) -> goal pytree        (reference next_goal)
    goal_distance(goal, data, ...) -> dict    (reference goal_distance)

    `current_state`/`relative_goal` of the reference are observation-side
    conveniences; the wrapper layer's RelativeGoalWrapper provides the
    relative-goal observations (wrappers/util.py:221-285 analogue).
    """

    def next_goal(self, key: jax.Array, *args, **kwargs) -> Dict[str, Any]:
        ...

    def goal_distance(self, goal: Dict[str, Any], *args, **kwargs) -> Dict[str, Any]:
        ...


def goal_types() -> Set[str]:
    return {"generic"}
