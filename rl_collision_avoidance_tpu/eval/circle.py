"""Deterministic 50-robot circle-swap evaluation with metric aggregation.

The reference's ``circle_test.py`` runs forever and computes no metrics; the
paper's evaluation quantities — success rate, extra travel time, collision
count — are aggregated here on device (cf. BASELINE.md "configs").  Actions
are the policy mean, no sampling (``model/ppo.py:84-107``); a finished robot
stops translating but keeps steering with the policy's w
(``circle_test.py:64-66`` zeroes only ``action[0]`` — the env applies this
for FIXED_TABLES worlds).

The harness is batched over arenas.  The reference scenario is fully
deterministic (fixed tables, mean actions), so identical arenas would be
redundant — ``pose_noise`` optionally jitters each arena's initial poses
with a per-arena key, turning the batch into a cheap robustness study with
mean±std over perturbations (arena 0 is always left unperturbed so the
headline deterministic numbers are preserved in ``arena0_*``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.env import Env, RESULT_CRASH, RESULT_GOAL
from ..models import CNNPolicy
from ..worlds import circle as circle_world


@partial(jax.jit, static_argnums=(1, 2, 3, 5))
def _run(params, model, env, max_steps, keys, pose_noise):
    a = keys.shape[0]
    n = env.n_robots
    state, obs = env.reset(keys)
    if pose_noise:
        jit_keys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
        noise = jax.vmap(lambda k: jax.random.uniform(
            k, (n, 2), minval=-pose_noise, maxval=pose_noise))(jit_keys)
        noise = noise.at[0].set(0.0)  # arena 0 stays the reference scenario
        pose = state.pose.at[..., :2].add(noise)
        state = env.teleport(state, pose)
        first = env._scan_obs(pose)
        state = state.replace(scan_hist=jnp.repeat(
            first[:, :, None, :], env.frames, axis=2))
        obs = env._obs(state)
    start_dist = jnp.linalg.norm(
        state.goal - state.pose[..., :2], axis=-1)            # (A, N)

    def body(carry, i):
        state, obs, done_step, first_result = carry
        flat = lambda x: x.reshape(a * n, *x.shape[2:])
        value, mean, logstd = model.apply(params, flat(obs.scans),
                                          flat(obs.goal), flat(obs.speed))
        action = jnp.stack([jnp.clip(mean[:, 0], 0.0, 1.0),
                            jnp.clip(mean[:, 1], -1.0, 1.0)],
                           axis=-1).reshape(a, n, 2)
        state, obs, reward, done, info = env.step(state, action)
        newly = (info.result != 0) & (first_result == 0)
        first_result = jnp.where(newly, info.result, first_result)
        done_step = jnp.where(newly, i + 1, done_step)
        return (state, obs, done_step, first_result), None

    init = (state, obs, jnp.zeros((a, n), jnp.int32),
            jnp.zeros((a, n), jnp.int32))
    (state, obs, done_step, first_result), _ = jax.lax.scan(
        body, init, jnp.arange(max_steps))
    return done_step, first_result, start_dist


_ENV_CACHE: dict = {}


def run_circle_eval(params, model: CNNPolicy | None = None, spec=None,
                    max_steps: int = 2000, seed: int = 0, n_arenas: int = 1,
                    pose_noise: float = 0.0,
                    env_kwargs: dict | None = None) -> dict:
    """Success rate, collision count, mean (extra) travel time.

    With ``n_arenas > 1`` and ``pose_noise > 0`` the scenario is replicated
    with jittered initial positions (arena 0 unperturbed) and the metrics
    gain mean±std across arenas.  ``env_kwargs`` forwards to :class:`Env`
    (e.g. ``{"disc_cull_k": 12}`` for the culled rect path).
    """
    model = model or CNNPolicy()
    spec = spec or circle_world()
    env_kwargs = env_kwargs or {}
    # The jitted _run is keyed on the (static) env instance: reuse one per
    # world so repeated evals (e.g. checkpoint selection during stage-2
    # training) hit the jit cache instead of recompiling.  Key by a digest
    # of the actual geometry and scenario tables, not just name/shape:
    # circle(n_robots=12) shares the name "circle" with the 50-robot
    # default, and two same-shape variants (e.g. different table radii)
    # must not collide either.
    def _digest(*arrays):
        import hashlib
        h = hashlib.sha1()
        for arr in arrays:
            if arr is not None:
                a = np.ascontiguousarray(arr)
                # Frame each array with its shape/dtype so byte streams of
                # different layouts can't alias across concatenation.
                h.update(repr((a.shape, a.dtype.str)).encode())
                h.update(a.tobytes())
        return h.hexdigest()[:16]

    cache_key = (spec.name, spec.n_robots, spec.footprint,
                 tuple(sorted(env_kwargs.items())),
                 _digest(spec.seg_p, spec.seg_e, spec.seg_valid,
                         spec.init_pose_table, spec.goal_table))
    env = _ENV_CACHE.setdefault(cache_key, Env(spec, **env_kwargs))
    keys = jax.random.split(jax.random.PRNGKey(seed), n_arenas)
    done_step, first_result, start_dist = jax.device_get(
        _run(params, model, env, max_steps, keys, float(pose_noise)))

    success = first_result == RESULT_GOAL                     # (A, N)
    crashed = first_result == RESULT_CRASH
    unfinished = first_result == 0
    travel_time = done_step * spec.dt * spec.substeps
    straight_time = start_dist / 1.0  # v_max = 1 m/s
    extra = travel_time - straight_time

    def _mean_extra(a):
        # None (JSON null) when no robot succeeded — a bare NaN token would
        # make the serialized report invalid JSON.
        m = success[a]
        return float(extra[a][m].mean()) if m.any() else None

    per_arena_succ = success.mean(axis=1)
    per_arena_extra = np.array(
        [x if x is not None else np.nan
         for x in (_mean_extra(i) for i in range(len(keys)))], np.float64)
    out = {
        "n_robots": int(success.shape[1]),
        "n_arenas": int(success.shape[0]),
        "pose_noise_m": float(pose_noise),
        "max_steps": int(max_steps),
        # headline (deterministic reference scenario = arena 0)
        "success_rate": float(per_arena_succ[0]),
        "collisions": int(crashed[0].sum()),
        "unfinished": int(unfinished[0].sum()),
        "mean_travel_time_s": (float(travel_time[0][success[0]].mean())
                               if success[0].any() else None),
        "mean_extra_time_s": _mean_extra(0),
    }
    if len(keys) > 1:
        any_extra = np.any(~np.isnan(per_arena_extra))
        out.update({
            "success_rate_mean": float(per_arena_succ.mean()),
            "success_rate_std": float(per_arena_succ.std()),
            "collisions_mean": float(crashed.sum(axis=1).mean()),
            "mean_extra_time_mean": (float(np.nanmean(per_arena_extra))
                                     if any_extra else None),
            "mean_extra_time_std": (float(np.nanstd(per_arena_extra))
                                    if any_extra else None),
        })
    return out
