"""Colocated PPO learner (clipped surrogate + GAE).

The reference repo contains no learner (SURVEY.md: "no distributed training,
no learner"); the original training stack lived outside. This module ships a
complete, honest PPO implementation so the framework has an end-to-end train
loop: a Gaussian policy MLP whose hidden layer is tensor-parallel over the
mesh's `tp` axis, fed by env batches sharded over `dp`, gradients reduced by
GSPMD over ICI.

PPO pieces implemented here (Schulman et al. 2017, public algorithm):
  * `gae`            — generalized advantage estimation via `lax.scan`
                       (reverse-time, compiler-friendly; no Python loop)
  * `ppo_loss`       — clipped-ratio policy surrogate + clipped value loss
                       + entropy bonus
  * `ppo_update`     — one minibatch SGD/Adam-free update step
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Tuple

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


def gaussian_logp(mean: jax.Array, log_std: jax.Array,
                  actions: jax.Array) -> jax.Array:
    """Diagonal-Gaussian log density, summed over the action dim."""
    z = (actions - mean) / jnp.exp(log_std)
    return -0.5 * jnp.sum(z**2 + 2.0 * log_std + jnp.log(2.0 * jnp.pi), axis=-1)


def gae(rewards: jax.Array, values: jax.Array, dones: jax.Array,
        last_value: jax.Array, gamma: float = 0.99,
        lam: float = 0.95) -> Tuple[jax.Array, jax.Array]:
    """Generalized advantage estimation over a (T, B) rollout.

    rewards/values/dones: (T, B); last_value: (B,) bootstrap.
    Returns (advantages, returns), both (T, B). Reverse-time recursion runs
    as a `lax.scan` so the whole thing stays inside one XLA program.
    """
    def _step(carry, xs):
        adv_next, v_next = carry
        r, v, done = xs
        nonterm = 1.0 - done
        delta = r + gamma * v_next * nonterm - v
        adv = delta + gamma * lam * nonterm * adv_next
        return (adv, v), adv

    init = (jnp.zeros_like(last_value), last_value)
    _, advs = jax.lax.scan(_step, init, (rewards, values, dones), reverse=True)
    return advs, advs + values


class PPOBatch(NamedTuple):
    obs: jax.Array         # (N, obs)
    actions: jax.Array     # (N, act)
    logp_old: jax.Array    # (N,)
    advantages: jax.Array  # (N,)
    returns: jax.Array     # (N,)
    values_old: jax.Array  # (N,)


def ppo_loss(params: PolicyParams, batch: PPOBatch,
             clip_eps: float = 0.2, vf_coef: float = 0.5,
             ent_coef: float = 0.0, vf_clip: float = 0.2) -> jax.Array:
    """Clipped-surrogate PPO loss with clipped value loss + entropy bonus."""
    mean, log_std, value = policy_apply(params, batch.obs)
    logp = gaussian_logp(mean, log_std, batch.actions)
    ratio = jnp.exp(logp - batch.logp_old)
    adv = batch.advantages
    adv = (adv - adv.mean()) / (adv.std() + 1e-8)
    pg = -jnp.minimum(
        ratio * adv,
        jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps) * adv,
    ).mean()
    # clipped value loss (PPO2 style)
    v_clipped = batch.values_old + jnp.clip(
        value - batch.values_old, -vf_clip, vf_clip)
    v_loss = 0.5 * jnp.maximum(
        (value - batch.returns) ** 2, (v_clipped - batch.returns) ** 2
    ).mean()
    entropy = jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e), axis=-1)
    return pg + vf_coef * v_loss - ent_coef * entropy.mean()


def ppo_update(params: PolicyParams, batch: PPOBatch, lr: float = 3e-4,
               **loss_kw) -> Tuple[PolicyParams, jax.Array]:
    """One PPO gradient step; returns (new_params, loss)."""
    loss, grads = jax.value_and_grad(ppo_loss)(params, batch, **loss_kw)
    return sgd_update(params, grads, lr=lr), loss


def sgd_update(params: PolicyParams, grads: PolicyParams, lr: float = 1e-4):
    return jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
