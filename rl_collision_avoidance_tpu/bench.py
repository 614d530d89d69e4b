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


def build_step(n_arenas: int, inner_steps: int, policy_dtype=jnp.float32,
               lidar_mode: str | None = None, world: str = "stage1",
               shard: bool = False, disc_cull_k: int | None = None,
               obs_dtype=None, footprint: str | None = None):
    import dataclasses

    from .engine.env import Env
    from .models import CNNPolicy
    from .worlds import get_world
    from . import models

    distributions = models.distributions
    spec = get_world(world)
    if footprint is not None:
        spec = dataclasses.replace(spec, footprint=footprint)
    env = Env(spec, lidar_mode=lidar_mode, disc_cull_k=disc_cull_k,
              obs_dtype=obs_dtype)
    model = CNNPolicy(dtype=policy_dtype)
    key = jax.random.PRNGKey(0)
    f, b = spec.laser_frames, spec.obs_beams or spec.n_beams
    params = model.init(key, jnp.zeros((1, f, b)), jnp.zeros((1, 2)),
                        jnp.zeros((1, 2)))
    env_state, obs = env.reset(jax.random.split(key, n_arenas))
    if shard:
        from .parallel import mesh as meshlib

        mesh = meshlib.make_mesh()
        env_state = meshlib.shard_arenas(env_state, mesh)
        obs = meshlib.shard_arenas(obs, mesh)
        params = meshlib.replicate(params, mesh)

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


def measure(n_arenas: int = 512, inner_steps: int = 1024, repeats: int = 5,
            policy_dtype=jnp.float32, lidar_mode: str | None = None,
            world: str = "stage1", shard: bool = False,
            disc_cull_k: int | None = None, obs_dtype=None,
            footprint: str | None = None):
    spec, run, carry = build_step(n_arenas, inner_steps, policy_dtype,
                                  lidar_mode, world, shard, disc_cull_k,
                                  obs_dtype, footprint)
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


def measure_training(n_arenas: int = 32, updates: int = 5, world: str = "stage1",
                     policy_dtype=jnp.float32, obs_store_dtype=None,
                     apply_impl: str = "conv"):
    """Full training throughput: rollout + GAE + PPO env-steps per second
    (one Trainer update = HORIZON env steps per robot, like the reference's
    buffer/update unit at ppo_stage1.py:102-116).

    ``policy_dtype=bfloat16`` = mixed-precision training (f32 params/Adam,
    bf16 activations); the update phase is HBM-activation-bound, so this is
    the big lever (docs/PERF.md, update-phase table).  f32 is the parity
    default the committed curves use."""
    from .train import TrainConfig, Trainer

    cfg = (TrainConfig.stage1 if world == "stage1"
           else TrainConfig.stage2)(n_arenas=n_arenas,
                                    policy_dtype=policy_dtype,
                                    obs_store_dtype=obs_store_dtype,
                                    apply_impl=apply_impl)
    tr = Trainer(cfg)
    state = tr.init_state()
    state, metrics = tr._step_fn(state)               # compile + warmup
    jax.device_get(metrics["policy_loss"])
    steps_per_update = cfg.horizon * n_arenas * tr.spec.n_robots
    best = 0.0
    for _ in range(updates):
        t0 = time.perf_counter()
        state, metrics = tr._step_fn(state)
        jax.device_get(metrics["policy_loss"])
        best = max(best, steps_per_update / (time.perf_counter() - t0))
    return best


def measure_scaling(n_devices: int, arenas_per_device: int = 4,
                    inner_steps: int = 64):
    """Data-parallel scaling proof on virtual CPU devices: steps/s at 1 vs
    N devices with arenas scaled proportionally.  Runs in subprocesses so
    XLA_FLAGS can differ; on an oversubscribed host (virtual devices >>
    cores) the efficiency bounds below hardware reality — the point is that
    the sharded program runs and scales, cf. tests/test_distributed.py for
    the multi-process equivalent."""
    import os
    import subprocess
    import sys

    rates = {}
    for d in (1, n_devices):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": (env.get("XLA_FLAGS", "")
                          + f" --xla_force_host_platform_device_count={d}").strip(),
        })
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu');"
            "from rl_collision_avoidance_tpu.bench import measure;"
            f"print('RATE', measure({arenas_per_device * d}, {inner_steps},"
            f" repeats=3, world='mini', shard=True))"
        )
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True,
                             cwd=os.path.dirname(os.path.dirname(
                                 os.path.abspath(__file__))))
        if out.returncode != 0:
            raise RuntimeError(out.stderr[-2000:])
        rates[d] = float([l for l in out.stdout.splitlines()
                          if l.startswith("RATE")][0].split()[1])
    return rates[1], rates[n_devices]


def main(argv=None):
    import sys

    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--arenas", type=int, default=None)
    # Long inner scans amortize the fixed per-dispatch cost (~26 ms through
    # the axon tunnel, docs/PERF.md) — ~0.013 ms/step at 2048 (measured +2%
    # headline over 1024).
    p.add_argument("--inner-steps", type=int, default=2048)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--bf16", action="store_true", default=None,
                   help="bfloat16 policy activations (+ the obs store via "
                        "--obs-bf16).  For the ACTING bench this is the "
                        "DEFAULT (the validated fast mode, README); pass "
                        "--f32 for the exact-parity configuration.  For "
                        "--train the default stays f32 (the parity curves' "
                        "configuration).")
    p.add_argument("--f32", action="store_true",
                   help="force the f32 parity configuration")
    p.add_argument("--lidar", choices=["xla", "pallas", "dense"], default=None,
                   help="lidar backend (default: engine's platform default)")
    p.add_argument("--disc-cull", type=int, default=None, metavar="K",
                   help="opt-in approximate robot-silhouette culling (k "
                        "nearest neighbors; NOT the parity config — see "
                        "lidar.raycast_culled / raycast_boxes_culled)")
    p.add_argument("--footprint", choices=["disc", "rect"], default=None,
                   help="override the world's collision/silhouette "
                        "footprint (rect = Stage's exact 0.44 x 0.38 box "
                        "for both collision and lidar; combine with "
                        "--disc-cull beyond eval scale)")
    p.add_argument("--train", action="store_true",
                   help="measure full training (rollout+GAE+PPO) throughput")
    p.add_argument("--obs-bf16", action="store_true",
                   help="store lidar frames as bfloat16 (acting: the "
                        "scan_hist state tensor, Env(obs_dtype=...); "
                        "training: additionally the rollout buffer) — "
                        "halves the dominant HBM traffic at large A")
    p.add_argument("--apply-impl",
                   choices=["conv", "matmul", "fused", "pallas"],
                   default="conv",
                   help="with --train: PPO-update policy apply "
                        "implementation (pallas = fused VMEM-resident "
                        "trunk fwd+bwd kernels, ops/trunk_pallas.py; "
                        "matmul = im2col convs, documented negative)")
    p.add_argument("--scaling", type=int, default=None, metavar="N",
                   help="CPU data-parallel scaling proof at N virtual devices")
    args = p.parse_args(argv)

    if args.scaling:
        r1, rn = measure_scaling(args.scaling)
        print(json.dumps({
            "metric": f"cpu_scaling_efficiency_{args.scaling}dev",
            "value": round(rn / (args.scaling * r1), 4),
            "unit": "fraction",
            "vs_baseline": round(rn / (args.scaling * r1) / 0.8, 4),
            "steps_per_s_1dev": round(r1, 1),
            f"steps_per_s_{args.scaling}dev": round(rn, 1),
        }))
        return

    platform = jax.devices()[0].platform
    if args.train:
        n_arenas = args.arenas or (32 if platform != "cpu" else 2)
        use_bf16 = bool(args.bf16) and not args.f32
        dtype = jnp.bfloat16 if use_bf16 else jnp.float32
        steps_per_s = measure_training(
            n_arenas, updates=args.repeats, policy_dtype=dtype,
            obs_store_dtype=jnp.bfloat16 if args.obs_bf16 else None,
            apply_impl=args.apply_impl)
        print(json.dumps({
            "metric": "stage1_training_steps_per_s"
                      + ("_bf16" if use_bf16 else ""),
            "value": round(steps_per_s, 1),
            "unit": "robot-steps/s",
            "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 4),
        }))
        return

    n_arenas = args.arenas or (128 if platform != "cpu" else 8)
    # Acting headline default: the validated bf16 fast mode (activations +
    # obs store; README "Mixed-precision training", same plateau as f32).
    # --f32 selects the exact-parity configuration the r2-r4 headline used.
    use_bf16 = not args.f32 if args.bf16 is None else (args.bf16
                                                       and not args.f32)
    obs_bf16 = (args.obs_bf16 or args.bf16 is None) and not args.f32
    dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    steps_per_s = None
    while n_arenas >= 1:
        try:
            steps_per_s = measure(n_arenas, args.inner_steps, args.repeats,
                                  dtype, args.lidar,
                                  disc_cull_k=args.disc_cull,
                                  obs_dtype=(jnp.bfloat16 if obs_bf16
                                             else None),
                                  footprint=args.footprint)
            break
        except (jax.errors.JaxRuntimeError, MemoryError) as e:
            # Halve the batch ONLY on resource exhaustion (device OOM /
            # allocation failure); any other error is a real regression and
            # must fail the benchmark, not silently shrink it.
            msg = str(e)
            if not isinstance(e, MemoryError) and not any(
                    s in msg.upper() for s in
                    ("RESOURCE_EXHAUSTED", "OUT OF MEMORY", "OOM")):
                raise
            print(f"bench: {n_arenas} arenas exhausted device memory "
                  f"({msg.splitlines()[0][:120]}); retrying smaller",
                  file=sys.stderr)
            n_arenas //= 2
    if steps_per_s is None:
        raise SystemExit("bench failed at all arena counts")
    # The axon tunnel very occasionally serves a whole run ~25x slow (one
    # 208k reading reproduced at 5.5M immediately after, docs/PERF.md);
    # a TPU reading far below any plausible true rate is re-measured once.
    if platform != "cpu" and steps_per_s < 1e6 and n_arenas >= 32:
        print(f"bench: implausibly low reading ({steps_per_s:.0f}); "
              "re-measuring once (transient tunnel slowdowns happen)",
              file=sys.stderr)
        steps_per_s = max(steps_per_s, measure(
            n_arenas, args.inner_steps, args.repeats, dtype, args.lidar,
            disc_cull_k=args.disc_cull,
            obs_dtype=jnp.bfloat16 if obs_bf16 else None,
            footprint=args.footprint))
    print(json.dumps({
        "metric": "stage1_env_steps_per_s",
        "value": round(steps_per_s, 1),
        "unit": "robot-steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 4),
        "mode": "bf16" if use_bf16 else "f32_parity",
    }))


if __name__ == "__main__":
    main()
