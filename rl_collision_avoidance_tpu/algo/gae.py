"""Generalized Advantage Estimation as a ``lax.scan``.

Semantics of ``model/ppo.py:122-139`` (``generate_train_data``): backward
recursion over the horizon with episode cuts at ``done``; targets are
GAE + value, advantages are targets - values.  The recursion carries O(E)
state only, so the horizon axis stays local to each shard (no collective
traffic when arenas are sharded over devices).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def generate_train_data(rewards, values, last_value, dones, gamma, lam):
    """rewards/values/dones: (T, E); last_value: (E,).

    Returns (targets, advs), both (T, E).
    """
    not_done = 1.0 - dones.astype(rewards.dtype)

    def backward(gae, inp):
        r, v, v_next, nd = inp
        delta = r + gamma * v_next * nd - v
        gae = delta + gamma * lam * nd * gae
        return gae, gae + v

    v_next = jnp.concatenate([values[1:], last_value[None, :]], axis=0)
    _, targets = jax.lax.scan(
        backward, jnp.zeros_like(last_value),
        (rewards, values, v_next, not_done), reverse=True)
    advs = targets - values
    return targets, advs


def calculate_returns(rewards, dones, last_value, gamma=0.99):
    """Plain discounted returns (``model/ppo.py:111-119``; unused by the
    reference trainers but part of its public API)."""
    not_done = 1.0 - dones.astype(rewards.dtype)

    def backward(ret, inp):
        r, nd = inp
        ret = gamma * ret * nd + r
        return ret, ret

    _, returns = jax.lax.scan(backward, last_value, (rewards, not_done),
                              reverse=True)
    return returns
