"""Parallel-algorithm running mean/std (``model/utils.py:101-128``).

Unused by the reference trainers but part of its public API surface; provided
here as a functional pytree so it can live inside jitted training steps
(e.g. for observation or reward normalization experiments).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RunningMeanStd(NamedTuple):
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray

    @staticmethod
    def create(shape=(), epsilon: float = 1e-4) -> "RunningMeanStd":
        return RunningMeanStd(mean=jnp.zeros(shape), var=jnp.ones(shape),
                              count=jnp.asarray(epsilon))

    def update(self, x: jnp.ndarray) -> "RunningMeanStd":
        """Chan et al. parallel moments merge over the leading axis of x."""
        batch_mean = jnp.mean(x, axis=0)
        batch_var = jnp.var(x, axis=0)
        batch_count = x.shape[0]
        delta = batch_mean - self.mean
        tot = self.count + batch_count
        new_mean = self.mean + delta * batch_count / tot
        m2 = (self.var * self.count + batch_var * batch_count
              + delta**2 * self.count * batch_count / tot)
        return RunningMeanStd(mean=new_mean, var=m2 / tot, count=tot)

    @property
    def std(self):
        return jnp.sqrt(self.var)
