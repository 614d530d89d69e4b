"""Deterministic 50-robot circle-swap evaluation with metric aggregation.

The reference's ``circle_test.py`` runs forever and computes no metrics; the
paper's evaluation quantities — success rate, extra travel time, collision
count — are aggregated here on device (cf. BASELINE.md "configs").  Actions
are the policy mean, no sampling (``model/ppo.py:84-107``); a finished robot
keeps its pose with v = 0 (``circle_test.py:64-66``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.env import Env, RESULT_CRASH, RESULT_GOAL
from ..models import CNNPolicy
from ..worlds import circle as circle_world


@partial(jax.jit, static_argnums=(1, 2, 3))
def _run(params, model, env, max_steps, key):
    state, obs = env.reset(key[None])
    start_dist = jnp.linalg.norm(env._goal_table - env._pose_table[:, :2],
                                 axis=-1)

    def body(carry, i):
        state, obs, done_step, first_result = carry
        n = env.n_robots
        value, mean, logstd = model.apply(params, obs.scans[0], obs.goal[0],
                                          obs.speed[0])
        action = jnp.stack([jnp.clip(mean[:, 0], 0.0, 1.0),
                            jnp.clip(mean[:, 1], -1.0, 1.0)], axis=-1)
        state, obs, reward, done, info = env.step(state, action[None])
        newly = (info.result[0] != 0) & (first_result == 0)
        first_result = jnp.where(newly, info.result[0], first_result)
        done_step = jnp.where(newly, i + 1, done_step)
        return (state, obs, done_step, first_result), None

    n = env.n_robots
    init = (state, obs, jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32))
    (state, obs, done_step, first_result), _ = jax.lax.scan(
        body, init, jnp.arange(max_steps))
    return done_step, first_result, start_dist


def run_circle_eval(params, model: CNNPolicy | None = None, spec=None,
                    max_steps: int = 2000, seed: int = 0) -> dict:
    """Returns success rate, collision count, mean (extra) travel time."""
    model = model or CNNPolicy()
    spec = spec or circle_world()
    env = Env(spec)
    done_step, first_result, start_dist = jax.device_get(
        _run(params, model, env, max_steps, jax.random.PRNGKey(seed)))

    success = first_result == RESULT_GOAL
    crashed = first_result == RESULT_CRASH
    unfinished = first_result == 0
    travel_time = done_step * spec.dt * spec.substeps
    straight_time = start_dist / 1.0  # v_max = 1 m/s
    extra = travel_time - straight_time
    n = len(first_result)
    return {
        "n_robots": n,
        "success_rate": float(success.mean()),
        "collisions": int(crashed.sum()),
        "unfinished": int(unfinished.sum()),
        "mean_travel_time_s": float(travel_time[success].mean()) if success.any() else float("nan"),
        "mean_extra_time_s": float(extra[success].mean()) if success.any() else float("nan"),
        "max_steps": max_steps,
    }
