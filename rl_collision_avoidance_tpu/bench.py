"""Headline benchmark: stage-1 acting throughput (policy + env, fused).

The reference's equivalent path is one RL step of 24 MPI ranks against the
10 Hz stageros loop — MPI gather, one GPU forward, MPI scatter, ROS pub/sub,
reward — i.e. wall-clock-bound at roughly 24 x 10 = 240 robot-steps/s
(stageros.cpp:819).  Here the same semantics run as a jitted scan over
thousands of arenas on one chip.  North-star target from BASELINE.json:
5M robot-steps/s per host.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

BASELINE_STEPS_PER_S = 5.0e6


def build_step(n_arenas: int, inner_steps: int, policy_dtype=jnp.bfloat16,
               lidar_mode: str | None = None):
    from .engine.env import Env
    from .models import CNNPolicy, distributions
    from .worlds import stage1

    spec = stage1()
    env = Env(spec, lidar_mode=lidar_mode)
    model = CNNPolicy(dtype=policy_dtype)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 3, 512)), jnp.zeros((1, 2)),
                        jnp.zeros((1, 2)))
    env_state, obs = env.reset(jax.random.split(key, n_arenas))

    # params flow in as a jit ARGUMENT: closing over a device array (of any
    # size) permanently poisons axon dispatch (docs/PERF.md).
    def one_step(carry, _):
        params, env_state, obs, key = carry
        key, k = jax.random.split(key)
        a, n = obs.scans.shape[:2]
        flat = lambda x: x.reshape(a * n, *x.shape[2:])
        _, mean, logstd = model.apply(params, flat(obs.scans),
                                      flat(obs.goal), flat(obs.speed))
        raw = distributions.sample(k, mean, logstd)
        act = jnp.stack([jnp.clip(raw[:, 0], 0.0, 1.0),
                         jnp.clip(raw[:, 1], -1.0, 1.0)],
                        axis=-1).reshape(a, n, 2)
        env_state, obs, r, d, info = env.step(env_state, act)
        return (params, env_state, obs, key), r[0, 0]

    @jax.jit
    def run(params, env_state, obs, key):
        (params, env_state, obs, key), rs = jax.lax.scan(
            one_step, (params, env_state, obs, key), None, length=inner_steps)
        return env_state, obs, key, rs.sum()

    def run_threaded(env_state, obs, key):
        return run(params, env_state, obs, key)

    return spec, run_threaded, (env_state, obs, key)


def measure(n_arenas: int = 512, inner_steps: int = 256, repeats: int = 5,
            policy_dtype=jnp.bfloat16, lidar_mode: str | None = None):
    spec, run, carry = build_step(n_arenas, inner_steps, policy_dtype,
                                  lidar_mode)
    env_state, obs, key = carry
    # compile + warmup.  NOTE: timings must fetch a result to host —
    # block_until_ready returns early on the axon runtime (docs/PERF.md).
    env_state, obs, key, s = run(env_state, obs, key)
    jax.device_get(s)
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        env_state, obs, key, s = run(env_state, obs, key)
        jax.device_get(s)
        dt = time.perf_counter() - t0
        steps = n_arenas * spec.n_robots * inner_steps
        best = max(best, steps / dt)
    return best


def main(argv=None):
    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--arenas", type=int, default=None)
    p.add_argument("--inner-steps", type=int, default=32)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--f32", action="store_true",
                   help="policy in float32 instead of bfloat16")
    p.add_argument("--lidar", choices=["xla", "pallas", "dense"], default=None,
                   help="lidar backend (default: engine's platform default)")
    args = p.parse_args(argv)

    platform = jax.devices()[0].platform
    n_arenas = args.arenas or (128 if platform != "cpu" else 8)
    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    steps_per_s = None
    while n_arenas >= 1:
        try:
            steps_per_s = measure(n_arenas, args.inner_steps, args.repeats,
                                  dtype, args.lidar)
            break
        except Exception as e:  # compile/OOM fallback: halve the batch
            print(f"bench: {n_arenas} arenas failed ({type(e).__name__}); "
                  "retrying smaller", file=__import__("sys").stderr)
            n_arenas //= 2
    if steps_per_s is None:
        raise SystemExit("bench failed at all arena counts")
    print(json.dumps({
        "metric": "stage1_env_steps_per_s",
        "value": round(steps_per_s, 1),
        "unit": "robot-steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
