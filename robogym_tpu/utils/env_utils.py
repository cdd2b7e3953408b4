"""Env resolution/loading (TPU build).

Re-implements /root/reference/robogym/utils/env_utils.py:64-166: resolve an
environment factory from a python-file path, a json/jsonnet config, or a
name fragment matched against the env zoo, then call `make_env(**kwargs)`.
"""

from __future__ import annotations

import glob
import json
import os
import runpy
from typing import Any, Callable, Dict, Optional

ENVS_ROOT = os.path.join(os.path.dirname(os.path.dirname(__file__)), "envs")


class InvalidSimulationError(Exception):
    """(env_utils.py:13-16): unrecoverable invalid simulation state."""


def get_function(fn_data: Dict[str, Any]) -> Callable:
    """Resolve {"function": "module:fn", "args": {...}} references
    (env_utils.py:43-61). Module paths from the reference's shipped configs
    (`robogym.envs...`) are remapped to this package."""
    import functools
    import importlib

    name = fn_data["function"]
    extra_args = fn_data.get("args", {})
    module_path, fn_name = name.split(":")
    if module_path.startswith("robogym."):
        module_path = "robogym_tpu." + module_path[len("robogym."):]
    module = importlib.import_module(module_path)
    fn = getattr(module, fn_name)
    if extra_args:
        return functools.partial(fn, **extra_args)
    return fn


def gym_space_from_arrays(arrays):
    """Observation-space construction from an obs pytree
    (env_utils.py:17-28). Returns {key: shape} — the TPU build has no gym
    dependency; shapes serve the same introspection role."""
    import numpy as np

    if isinstance(arrays, dict):
        return {k: gym_space_from_arrays(v) for k, v in arrays.items()}
    return tuple(np.asarray(arrays).shape)


class MakeEnvFinder:
    """(env_utils.py:64-134)."""

    @classmethod
    def find(cls, pattern: str, arg_filter: Optional[str] = "make_env"):
        # 1. python file path
        if pattern.endswith(".py") and os.path.exists(pattern):
            module = runpy.run_path(pattern)
            return module.get(arg_filter or "make_env")
        # 2. json config: {"make_env": {"function": ..., "args": ...}}
        if pattern.endswith(".json") and os.path.exists(pattern):
            with open(pattern) as f:
                config = json.load(f)
            spec = config["make_env"]
            return get_function(spec)
        # 2b. jsonnet config (the reference's holdout tier, env_utils.py:96)
        # evaluated by the from-scratch subset evaluator in utils/jsonnet
        if (pattern.endswith(".jsonnet") or pattern.endswith(".libsonnet")) \
                and os.path.exists(pattern):
            from robogym_tpu.utils import jsonnet

            config = jsonnet.evaluate_file(pattern)
            return get_function(config["make_env"])
        # 3. name fragment against the env zoo
        matches = []
        for path in sorted(
            glob.glob(os.path.join(ENVS_ROOT, "**", "*.py"), recursive=True)
        ):
            rel = os.path.relpath(path, ENVS_ROOT)
            if pattern in rel and not rel.split(os.sep)[-1].startswith("_"):
                matches.append(path)
        if not matches:
            return None
        module = runpy.run_path(matches[0])
        return module.get(arg_filter or "make_env")


def _recursive_update(base: dict, update: dict) -> dict:
    """(reference common/utils.py:36-42 recursive_dict_update)."""
    out = dict(base)
    for k, v in update.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _recursive_update(out[k], v)
        else:
            out[k] = v
    return out


def load_env(
    pattern: str,
    constants: Optional[dict] = None,
    parameters: Optional[dict] = None,
    **kwargs,
):
    """(env_utils.py:137-166). Extension over the reference: when the
    pattern resolves to a config-bound factory (json/jsonnet), caller
    constants/parameters are MERGED into the config's recursively instead
    of replacing them wholesale."""
    import functools

    make_env = MakeEnvFinder.find(pattern)
    assert make_env is not None, f"No env found for pattern {pattern!r}"
    bound = (
        make_env.keywords if isinstance(make_env, functools.partial) else {}
    )
    call_kwargs = {}
    if constants is not None:
        call_kwargs["constants"] = _recursive_update(
            bound.get("constants", {}) or {}, constants
        )
    if parameters is not None:
        call_kwargs["parameters"] = _recursive_update(
            bound.get("parameters", {}) or {}, parameters
        )
    import inspect

    sig = inspect.signature(make_env)
    for k, v in kwargs.items():
        if k in sig.parameters:
            call_kwargs[k] = v
    if "parameters" in call_kwargs and "parameters" not in sig.parameters:
        del call_kwargs["parameters"]
    return make_env(**call_kwargs)
