"""Command-line entry points.

The reference's entry scripts are ``mpiexec -np 24 python ppo_stage1.py``,
``-np 44 ppo_stage2.py``, ``-np 50 circle_test.py`` with hyperparameters as
module constants (``ppo_stage1.py:22-35``).  Here each workload is a
subcommand over a dataclass config; no MPI launcher — robot and arena
parallelism live inside the program.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import jax


def _add_common(p):
    p.add_argument("--arenas", type=int, default=None,
                   help="world replicas (default: 1 per device)")
    p.add_argument("--updates", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-dir", type=str, default=None)
    p.add_argument("--checkpoint-dir", type=str, default="checkpoints")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--warm-start", type=str, default=None,
                   help="params-only checkpoint to initialize from "
                        "(curriculum transfer, ppo_stage2.py:194-200)")
    p.add_argument("--logstd-min", type=float, default=None,
                   help="floor for the policy logstd, projected after "
                        "every optimizer step (entropy-collapse guard; "
                        "default: none for stage 1/2 parity, -2.0 for "
                        "the circle fine-tune)")
    p.add_argument("--bf16", action="store_true",
                   help="mixed-precision training: bfloat16 policy "
                        "activations, f32 params and Adam state (the "
                        "supported fast mode, ~1.7x f32; validated curve "
                        "results/stage1_bf16_metrics.csv)")
    p.add_argument("--obs-bf16", action="store_true",
                   help="store the lidar scan history and rollout obs "
                        "buffer in bfloat16 (halves the dominant HBM "
                        "traffic; ~1-2 mm quantization at 6 m range)")
    p.add_argument("--world", type=str, default=None,
                   help="override the stage's world (testing/experiments; "
                        "the stage presets pick their parity world)")
    p.add_argument("--batch-size", type=int, default=None,
                   help="override the PPO minibatch size (default: the "
                        "stage preset scaled by the arena count)")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="capture a device trace (XProf/TensorBoard) of 3 "
                        "post-warmup updates into DIR")
    # Multi-host launch (jax.distributed): run the SAME command on every
    # host with its own --process-id; arenas shard over all chips of the
    # slice and the only cross-host traffic is the gradient psum
    # (docs/PERF.md, collective-volume budget).  See README "Multi-host".
    p.add_argument("--coordinator", type=str, default=None, metavar="IP:PORT",
                   help="coordinator address for jax.distributed (host 0's "
                        "reachable IP:port); omit for single-host")
    p.add_argument("--num-processes", type=int, default=None,
                   help="total number of launched processes (hosts)")
    p.add_argument("--process-id", type=int, default=None,
                   help="this process's rank in [0, num-processes)")


def _train(stage: str, args):
    from .parallel.mesh import setup_distributed

    # Honor JAX_PLATFORMS even where a platform plugin's site hook forces
    # its own value at interpreter start (the axon TPU plugin does).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    # Must run before any JAX backend use so every process sees the global
    # device set (the reference's mpiexec rank wiring, README.md:30-46,
    # collapsed into three flags).
    setup_distributed(args.coordinator, args.num_processes, args.process_id)
    multiproc = jax.process_count() > 1
    proc0 = jax.process_index() == 0

    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from .train import Trainer, TrainConfig
    from .utils.checkpoint import (CheckpointManager, load_params,
                                   load_params_npz)
    from .utils.metrics import MetricLogger

    n_arenas = args.arenas or len(jax.devices())
    maker = {"stage1": TrainConfig.stage1, "stage2": TrainConfig.stage2,
             "circle_ft": TrainConfig.circle_ft}[stage]
    cfg = maker(n_arenas=n_arenas, seed=args.seed, max_updates=args.updates)
    if args.world is not None:
        cfg.world = args.world
    if args.batch_size is not None:
        cfg.ppo = cfg.ppo._replace(batch_size=args.batch_size)
    if args.logstd_min is not None:
        cfg.ppo = cfg.ppo._replace(logstd_min=args.logstd_min)
    if args.bf16:
        import jax.numpy as jnp
        cfg.policy_dtype = jnp.bfloat16
    if args.obs_bf16:
        import jax.numpy as jnp
        cfg.obs_store_dtype = jnp.bfloat16
    trainer = Trainer(cfg)
    # Host-side IO is rank-0-only.  The full-train-state (exact-resume)
    # checkpoint is single-host: its env_state shards are not addressable
    # from one process on a multi-host mesh; params (replicated) still
    # export everywhere below — the reference's torch.save scope.
    logger = MetricLogger(args.log_dir) if proc0 else None
    ckpt = (CheckpointManager(f"{args.checkpoint_dir}/{stage}")
            if not multiproc else None)

    state = trainer.init_state()
    if args.resume and ckpt is not None and ckpt.latest_step() is not None:
        state = trainer.shard_state(ckpt.restore(ckpt.latest_step(), state))
    elif args.warm_start:
        tmpl = jax.device_get(state.params)
        loader = (load_params_npz if args.warm_start.endswith(".npz")
                  else load_params)
        state = trainer.shard_state(state.replace(
            params=loader(args.warm_start, tmpl)))
    state = trainer.train(state, updates=args.updates,
                          log_fn=logger.log_update if logger else None,
                          checkpoint_manager=ckpt, profile_dir=args.profile)
    # Params-only export for curriculum transfer (the reference's
    # torch.save(state_dict) role): warm-start the next stage with
    # --warm-start <dir>/<stage>/params.npz.
    if proc0:
        from .utils.checkpoint import save_params_npz

        out_dir = (ckpt.directory if ckpt is not None
                   else os.path.join(args.checkpoint_dir, stage))
        os.makedirs(out_dir, exist_ok=True)
        save_params_npz(os.path.join(out_dir, "params.npz"),
                        jax.device_get(state.params))


def main_stage1(argv=None):
    p = argparse.ArgumentParser(description="Train stage 1 (random rink)")
    _add_common(p)
    _train("stage1", p.parse_args(argv))


def main_stage2(argv=None):
    p = argparse.ArgumentParser(description="Train stage 2 (structured map)")
    _add_common(p)
    _train("stage2", p.parse_args(argv))


def main_circle_ft(argv=None):
    p = argparse.ArgumentParser(
        description="Train stage 3: fine-tune on the jittered 50-robot "
                    "circle swap (worlds.circle_train; warm-start from "
                    "stage-2 params recommended)")
    _add_common(p)
    _train("circle_ft", p.parse_args(argv))


def main_circle(argv=None):
    p = argparse.ArgumentParser(description="50-robot circle-swap evaluation")
    p.add_argument("--params", type=str, required=False, default=None,
                   help="params checkpoint (policy/stage2 equivalent); "
                        "random-init policy if omitted")
    p.add_argument("--max-steps", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--arenas", type=int, default=1,
                   help="replicas of the scenario (with --pose-noise: a "
                        "robustness study with mean±std across arenas)")
    p.add_argument("--pose-noise", type=float, default=0.0,
                   help="uniform per-robot initial-pose jitter in meters "
                        "(arena 0 always stays the exact reference scenario)")
    p.add_argument("--footprint", choices=["disc", "rect"], default="disc",
                   help="robot footprint: disc (parity default) or rect = "
                        "Stage's exact 0.44 x 0.38 box for collision AND "
                        "lidar silhouettes (results/circle_eval_rect.json)")
    args = p.parse_args(argv)

    from .eval.circle import run_circle_eval
    from .models import CNNPolicy
    from .utils.checkpoint import load_params, load_params_npz
    import jax.numpy as jnp

    model = CNNPolicy()
    if args.params:
        if args.params.endswith(".npz"):
            tmpl = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 512)),
                              jnp.zeros((1, 2)), jnp.zeros((1, 2)))
            params = load_params_npz(args.params, tmpl)
        else:
            params = load_params(args.params)
    else:
        # The reference exits when the checkpoint is missing
        # (circle_test.py:116-118); we default to a random policy so the
        # harness runs end-to-end, but say so.
        print("warning: no --params given, evaluating a random policy",
              file=sys.stderr)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 512)),
                            jnp.zeros((1, 2)), jnp.zeros((1, 2)))
    spec = None
    if args.footprint == "rect":
        import dataclasses

        from .worlds import circle as circle_world
        spec = dataclasses.replace(circle_world(), footprint="rect")
    print(json.dumps(run_circle_eval(params, model, spec=spec,
                                     max_steps=args.max_steps,
                                     seed=args.seed, n_arenas=args.arenas,
                                     pose_noise=args.pose_noise)))


def main_bench(argv=None):
    from . import bench
    bench.main(argv)


def main(argv=None):
    p = argparse.ArgumentParser(prog="rca")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("train-stage1", "train-stage2", "train-circle",
                 "circle-test", "bench"):
        sub.add_parser(name, add_help=False)
    args, rest = p.parse_known_args(argv)
    {"train-stage1": main_stage1, "train-stage2": main_stage2,
     "train-circle": main_circle_ft,
     "circle-test": main_circle, "bench": main_bench}[args.cmd](rest)


if __name__ == "__main__":
    main()
