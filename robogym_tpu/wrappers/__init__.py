"""Wrapper layer registry (reference robogym/wrappers/__init__ +
named_wrappers.py). All transforms are importable by name for
`apply_named_wrappers`."""

from robogym_tpu.wrappers.core import (
    Transform,
    WrappedEnv,
    apply_named_wrappers,
    edit_wrappers,
)
from robogym_tpu.wrappers.util import (
    ClipActionWrapper,
    RewardNameWrapper,
    ClipObservationWrapper,
    ClipRewardWrapper,
    DiscretizeActionWrapper,
    PreviousActionObservationWrapper,
    RelativeGoalWrapper,
    RewardObservationWrapper,
    SmoothActionWrapper,
    SummedRewardsWrapper,
    UnifiedGoalObservationWrapper,
)
from robogym_tpu.wrappers.randomizations import (
    ActionDelayWrapper,
    ActionNoiseWrapper,
    BacklashWrapper,
    FreezingPhasespaceMarkers,
    ObservationDelayWrapper,
    RandomizeObservationWrapper,
    RandomizedActionLatency,
    RandomizedBodyInertiaWrapper,
    RandomizedBrokenActuatorWrapper,
    RandomizedCubeFrictionWrapper,
    RandomizedDampingWrapper,
    RandomizedFrictionWrapper,
    RandomizedGravityWrapper,
    RandomizedJointLimitWrapper,
    RandomizedKpWrapper,
    RandomizedRobotFrictionWrapper,
    RandomizedTendonRangeWrapper,
    RandomizedTimestepWrapper,
    RandomizedWindWrapper as RandomizedOptWindWrapper,
)
from robogym_tpu.wrappers.dactyl import (
    AngleObservationWrapper,
    FingerSeparationWrapper,
    CubeFreezingPhasespaceBody,
    FingersFreezingPhasespaceMarkers,
    FingersOccludedPhasespaceMarkers,
    FixedWristWrapper,
    FreezingPhasespaceBody,
    RandomizedCubeSizeWrapper,
    RandomizedPhasespaceFingersWrapper,
    RandomizedWindWrapper,
    StopOnFallWrapper,
)
from robogym_tpu.wrappers.randomizations import (
    RandomizedRobotDampingWrapper,
    RandomizedRobotKpWrapper,
)
from robogym_tpu.wrappers.face import RandomizedFaceDampingWrapper
from robogym_tpu.wrappers.parametric import RandomizedPerpendicularCubeSizeWrapper

__all__ = [n for n in dir() if not n.startswith("_")]


def construct_default_dactyl_wrappers(
    *,
    randomize: bool = True,
    n_action_bins: int = 11,
    fixed_wrist: bool = False,
    relative_goal_wrapper: bool = True,
    drop_reward: float = -20.0,
    min_episode_length: int = -1,
    noise_levels=None,
    observation_delay_levels=None,
):
    """Default dactyl wrapper stack
    (reference envs/dactyl/common/dactyl_cube_wrappers.py:8-91), innermost
    first. StopOnFall runs innermost (env-side drop detection disabled when
    this stack is applied)."""
    wrappers = []
    if fixed_wrist:
        wrappers.append(["FixedWristWrapper"])
    wrappers.append(["ClipActionWrapper"])
    wrappers.append([
        "StopOnFallWrapper",
        dict(min_episode_length=min_episode_length, drop_reward=drop_reward),
    ])
    if randomize:
        wrappers.append(["BacklashWrapper"])
        wrappers += [
            ["RandomizedActionLatency"],
            ["RandomizedCubeSizeWrapper"],
            ["RandomizedBodyInertiaWrapper"],
            ["RandomizedTimestepWrapper"],
            ["RandomizedRobotFrictionWrapper"],
            ["RandomizedCubeFrictionWrapper"],
            ["RandomizedGravityWrapper"],
            ["RandomizedWindWrapper"],
            ["RandomizedPhasespaceFingersWrapper"],
            ["RandomizedRobotDampingWrapper"],
            ["RandomizedRobotKpWrapper"],
            ["RandomizedJointLimitWrapper"],
            ["RandomizedTendonRangeWrapper"],
        ]
        if noise_levels is None:
            # locked-env defaults (locked.py:231-244)
            noise_levels = {
                "fingertip_pos": {"uncorrelated": 0.002, "additive": 0.001},
                "hand_angle": {"additive": 0.1, "uncorrelated": 0.1},
                "cube_pos": {"additive": 0.005, "uncorrelated": 0.001},
                "cube_quat": {"additive": 0.1, "uncorrelated": 0.09},
            }
    else:
        noise_levels = noise_levels or {}
    observation_delay_levels = observation_delay_levels or {
        "interpolators": {"cube_quat": "QuatInterpolator"}, "groups": {},
    }
    wrappers.append(["ObservationDelayWrapper", dict(levels=observation_delay_levels)])
    wrappers.append(["RandomizeObservationWrapper", dict(levels=noise_levels)])
    wrappers.append(["SmoothActionWrapper"])
    if relative_goal_wrapper:
        wrappers.append(["RelativeGoalWrapper", dict(obs_prefix="cube_")])
    if randomize:
        wrappers += [
            ["FingersFreezingPhasespaceMarkers"],
            ["CubeFreezingPhasespaceBody"],
            ["ActionNoiseWrapper"],
        ]
    wrappers.append(["AngleObservationWrapper"])
    wrappers.append([
        "UnifiedGoalObservationWrapper", dict(goal_parts=["pos", "quat"]),
    ])
    wrappers.append(["ClipObservationWrapper"])
    wrappers.append(["ClipRewardWrapper"])
    wrappers.append(["PreviousActionObservationWrapper"])
    wrappers.append(["RewardObservationWrapper", {"reward_inds": [1, 2]}])
    wrappers.append(["DiscretizeActionWrapper", {"n_action_bins": n_action_bins}])
    return wrappers


def apply_dactyl_wrappers(env, **kwargs) -> WrappedEnv:
    """(dactyl_cube_wrappers.apply_wrappers equivalent)."""
    wrappers = construct_default_dactyl_wrappers(**kwargs)
    return apply_named_wrappers(env, wrappers)
