"""PPO learner unit tests: GAE recursion and clipped-surrogate semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.train import ppo


def _gae_numpy(rewards, values, dones, last_value, gamma, lam):
    T, B = rewards.shape
    advs = np.zeros((T, B))
    adv = np.zeros(B)
    v_next = last_value
    for t in reversed(range(T)):
        nonterm = 1.0 - dones[t]
        delta = rewards[t] + gamma * v_next * nonterm - values[t]
        adv = delta + gamma * lam * nonterm * adv
        advs[t] = adv
        v_next = values[t]
    return advs, advs + values


def test_gae_matches_reference_recursion():
    rng = np.random.default_rng(0)
    T, B = 7, 3
    rewards = rng.normal(size=(T, B))
    values = rng.normal(size=(T, B))
    dones = (rng.random((T, B)) < 0.2).astype(np.float64)
    last_value = rng.normal(size=B)
    adv, ret = ppo.gae(jnp.asarray(rewards), jnp.asarray(values),
                       jnp.asarray(dones), jnp.asarray(last_value),
                       gamma=0.97, lam=0.9)
    adv_np, ret_np = _gae_numpy(rewards, values, dones, last_value, 0.97, 0.9)
    np.testing.assert_allclose(np.asarray(adv), adv_np, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ret), ret_np, atol=1e-10)


def _make_batch(key, n=32, obs=6, act=3):
    ks = jax.random.split(key, 6)
    params = ppo.init_policy(ks[0], obs, act, hidden=16)
    o = jax.random.normal(ks[1], (n, obs))
    mean, log_std, value = ppo.policy_apply(params, o)
    a = mean + jax.random.normal(ks[2], mean.shape) * jnp.exp(log_std)
    logp = ppo.gaussian_logp(mean, log_std, a)
    adv = jax.random.normal(ks[3], (n,))
    ret = value + jax.random.normal(ks[4], (n,)) * 0.1
    return params, ppo.PPOBatch(o, a, logp, adv, ret, value)


def test_ppo_ratio_is_one_at_old_params():
    """At the sampling params the ratio is exactly 1, so the clipped and
    unclipped surrogates coincide and grad wrt clip_eps direction is the
    vanilla PG grad."""
    params, batch = _make_batch(jax.random.key(0))
    mean, log_std, _ = ppo.policy_apply(params, batch.obs)
    logp = ppo.gaussian_logp(mean, log_std, batch.actions)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(batch.logp_old),
                               atol=1e-12)
    l_tight = ppo.ppo_loss(params, batch, clip_eps=0.05)
    l_loose = ppo.ppo_loss(params, batch, clip_eps=0.5)
    np.testing.assert_allclose(float(l_tight), float(l_loose), atol=1e-10)


def test_ppo_clipped_surrogate_formula():
    """ppo_loss's policy term equals the textbook clipped surrogate
    -E[min(r*A, clip(r, 1-eps, 1+eps)*A)] on normalized advantages."""
    params, batch = _make_batch(jax.random.key(1))
    batch = batch._replace(logp_old=batch.logp_old - 0.3)  # ratio = e^0.3
    eps = 0.2
    loss = float(ppo.ppo_loss(params, batch, clip_eps=eps, vf_coef=0.0,
                              ent_coef=0.0))

    mean, log_std, _ = ppo.policy_apply(params, batch.obs)
    logp = np.asarray(ppo.gaussian_logp(mean, log_std, batch.actions))
    r = np.exp(logp - np.asarray(batch.logp_old))
    adv = np.asarray(batch.advantages)
    adv = (adv - adv.mean()) / (adv.std() + 1e-8)
    expected = -np.minimum(r * adv, np.clip(r, 1 - eps, 1 + eps) * adv).mean()
    # the clip must actually bind for this batch to be a meaningful check
    assert np.any(r > 1 + eps)
    np.testing.assert_allclose(loss, expected, rtol=1e-10)


def test_ppo_update_reduces_loss():
    params, batch = _make_batch(jax.random.key(2))
    l0 = float(ppo.ppo_loss(params, batch))
    p = params
    for _ in range(5):
        p, loss = ppo.ppo_update(p, batch, lr=1e-3)
    assert float(ppo.ppo_loss(p, batch)) < l0
