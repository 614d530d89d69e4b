"""Diagonal-Gaussian policy head math.

Matches ``model/utils.py:90-97`` (log density summed over the action axis,
keepdim) and ``model/net.py:78-79`` (state-independent entropy from the
learned logstd).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG_2PI = jnp.log(2.0 * jnp.pi)


def log_normal_density(x, mean, logstd):
    """Log N(x; mean, exp(logstd)^2), summed over the last axis, keepdims."""
    var = jnp.exp(2.0 * logstd)
    d = -((x - mean) ** 2) / (2.0 * var) - 0.5 * _LOG_2PI - logstd
    return jnp.sum(d, axis=-1, keepdims=True)


def sample(key, mean, logstd):
    return mean + jnp.exp(logstd) * jax.random.normal(key, mean.shape)


def entropy(logstd):
    """Per-sample entropy of the diagonal Gaussian: sum_i (0.5 + 0.5 log 2pi
    + logstd_i).  State-independent (model/net.py:78-79)."""
    return jnp.sum(0.5 + 0.5 * _LOG_2PI + logstd, axis=-1)
