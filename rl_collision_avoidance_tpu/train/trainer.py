"""The training loop: rollout + GAE + PPO as one jitted program.

This is the TPU-native collapse of the reference's hot path
(``ppo_stage1.py:39-130``): the per-step MPI gather -> GPU forward -> MPI
scatter -> ROS publish -> reward fan-in becomes a ``lax.scan`` of the fused
policy+env step over the horizon, followed by on-device GAE and PPO epochs.
One call = one reference "update" (HORIZON env steps + PPO), with zero
host<->device traffic except scalar metrics out.
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..algo import gae
from ..algo.ppo import (Batch, PPOConfig, normalize_advantages,
                        ppo_update_sharded)
from ..engine.env import Env, EnvState
from ..models import CNNPolicy, distributions
from ..parallel import mesh as meshlib
from ..worlds import get_world


@dataclasses.dataclass
class TrainConfig:
    """Hyperparameters; defaults = stage-1 reference (ppo_stage1.py:22-35)."""
    world: str = "stage1"
    n_arenas: int = 1          # arenas (replicas of the world); reference = 1
    horizon: int = 128
    gamma: float = 0.99
    lam: float = 0.95
    ppo: PPOConfig = PPOConfig(batch_size=1024, epochs=2, clip_value=0.1,
                               coeff_entropy=5e-4, learning_rate=5e-5)
    seed: int = 0
    max_updates: int = 2000
    policy_dtype: Any = jnp.float32
    # Storage dtype for rollout lidar frames (the dominant training buffer:
    # horizon x arenas x robots x 3 x 512).  bfloat16 halves HBM, letting
    # ~2x more arenas fit; None keeps exact f32 (parity default).
    obs_store_dtype: Any = None
    # Lidar backend for the training env ("xla"/"pallas"/"dense"); None =
    # the engine's platform default (xla on TPU, dense on CPU).
    lidar_mode: str | None = None
    # Policy apply implementation for the PPO UPDATE phase: "conv" = flax
    # CNNPolicy.apply (parity reference), "matmul" = im2col formulation
    # (documented negative result), "fused" = stacked-first-conv forward,
    # "pallas" = ops.trunk_pallas.cnn_pallas_apply — VMEM-resident fused
    # trunk fwd + custom-vjp bwd that never materializes conv activations
    # in HBM (the measured update-phase bottleneck, docs/PERF.md).  The
    # rollout always uses the flax apply (a Pallas custom call inside the
    # rollout scan would pay ~0.4 ms dispatch per env step).
    apply_impl: str = "conv"

    @staticmethod
    def stage1(**kw) -> "TrainConfig":
        """Stage-1 hyperparameters (ppo_stage1.py:22-35).

        The minibatch size scales with the arena count so the number of
        gradient steps per update stays at the reference's (PPO over-replays
        and collapses otherwise); pass an explicit ``ppo`` to override.
        """
        a = kw.get("n_arenas", 1)
        kw.setdefault("ppo", PPOConfig(batch_size=1024 * a, epochs=2,
                                       clip_value=0.1, coeff_entropy=5e-4,
                                       learning_rate=5e-5))
        return TrainConfig(**kw)

    @staticmethod
    def stage2(**kw) -> "TrainConfig":
        """Stage-2 hyperparameters (ppo_stage2.py:22-35); see stage1 re:
        batch scaling."""
        a = kw.get("n_arenas", 1)
        kw.setdefault("world", "stage2")
        kw.setdefault("ppo", PPOConfig(batch_size=512 * a, epochs=4,
                                       clip_value=0.1, coeff_entropy=5e-4,
                                       learning_rate=5e-5))
        return TrainConfig(**kw)

    @staticmethod
    def circle_ft(**kw) -> "TrainConfig":
        """Stage-3: fine-tune directly on the jittered 50-robot circle swap
        (world ``circle_train`` — our addition; the reference never trains on
        its flagship eval task).  Stage-2 PPO settings plus a logstd floor:
        the committed stage-2 run's entropy collapses 0.6 -> -3.1
        (results/stage2_metrics.csv), leaving no exploration for the new
        task; the floor keeps the policy's noise at >= exp(-2) ~ 0.135.

        Rollout per update = 128 x 50 x a = 6400*a samples; batch 640*a
        gives 10 minibatches x 4 epochs (stage-2's ~44 grad steps scaled to
        the longer-episode task)."""
        a = kw.get("n_arenas", 1)
        kw.setdefault("world", "circle_train")
        kw.setdefault("ppo", PPOConfig(batch_size=640 * a, epochs=4,
                                       clip_value=0.1, coeff_entropy=5e-4,
                                       learning_rate=5e-5, logstd_min=-2.0))
        return TrainConfig(**kw)


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    env_state: EnvState      # leading axis = arenas
    key: jnp.ndarray
    update: jnp.ndarray      # int32 update counter


class Trainer:
    """Owns the jitted train step plus host-side logging/checkpointing."""

    def __init__(self, cfg: TrainConfig, mesh=None):
        self.cfg = cfg
        self.spec = get_world(cfg.world)
        # obs_store_dtype is plumbed into the env so the live scan history
        # (A, N, F, B) — not just the rollout buffer — is stored at the
        # reduced precision: the training-mode analog of the acting bench's
        # --obs-bf16 (docs/PERF.md round 4).
        self.env = Env(self.spec, lidar_mode=cfg.lidar_mode,
                       obs_dtype=cfg.obs_store_dtype)
        self.model = CNNPolicy(dtype=cfg.policy_dtype)
        from ..models.policy import cnn_fused_apply, cnn_matmul_apply
        from ..ops.trunk_pallas import cnn_pallas_apply
        impls = {
            "conv": self.model.apply,
            "matmul": partial(cnn_matmul_apply, dtype=cfg.policy_dtype),
            "fused": partial(cnn_fused_apply, dtype=cfg.policy_dtype),
            "pallas": partial(cnn_pallas_apply, dtype=cfg.policy_dtype),
        }
        # Rollout/bootstrap forward: always the flax apply.  PPO update:
        # the configured implementation (see TrainConfig.apply_impl).
        self.apply_fn = (impls["conv"] if cfg.apply_impl == "pallas"
                         else impls[cfg.apply_impl])
        self.update_apply_fn = impls[cfg.apply_impl]
        self.tx = optax.adam(cfg.ppo.learning_rate)  # torch Adam defaults
        self.mesh = mesh if mesh is not None else meshlib.make_mesh()
        self._step_fn = jax.jit(self._train_step, donate_argnums=(0,))

    # ------------------------------------------------------------------

    def init_state(self, seed: int | None = None) -> TrainState:
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed if seed is None else seed)
        key, k_env, k_model = jax.random.split(key, 3)
        env_keys = jax.random.split(k_env, cfg.n_arenas)
        # jit the reset: eager op-by-op dispatch of the fused reset over a
        # sharded arena batch costs minutes on CPU meshes (driver dryrun)
        # and pays per-op tunnel RTT on TPU.
        env_state, _ = jax.jit(self.env.reset)(env_keys)
        n, f, b = self.spec.n_robots, self.spec.laser_frames, self.spec.n_beams
        params = self.model.init(k_model, jnp.zeros((1, f, b)),
                                 jnp.zeros((1, 2)), jnp.zeros((1, 2)))
        opt_state = self.tx.init(params)
        state = TrainState(params=params, opt_state=opt_state,
                           env_state=env_state, key=key,
                           update=jnp.zeros((), jnp.int32))
        return self.shard_state(state)

    def shard_state(self, state: TrainState) -> TrainState:
        """Arenas over the data axis; params/opt replicated."""
        arena = meshlib.arena_sharding(self.mesh)
        repl = meshlib.replicated(self.mesh)
        return TrainState(
            params=jax.device_put(state.params, repl),
            opt_state=jax.device_put(state.opt_state, repl),
            env_state=jax.tree_util.tree_map(
                lambda x: jax.device_put(x, arena), state.env_state),
            key=jax.device_put(state.key, repl),
            update=jax.device_put(state.update, repl),
        )

    # ------------------------------------------------------------------

    def _policy_forward(self, params, obs):
        """Batched forward over (arena, robot) -> value/mean/logstd flat."""
        a, n = obs.scans.shape[:2]
        flat = lambda x: x.reshape(a * n, *x.shape[2:])
        value, mean, logstd = self.apply_fn(params, flat(obs.scans),
                                            flat(obs.goal), flat(obs.speed))
        return value, mean, logstd, (a, n)

    def _generate_action(self, params, obs, key):
        """Sampled action + logprob + value (model/ppo.py:57-82)."""
        value, mean, logstd, (a, n) = self._policy_forward(params, obs)
        raw = distributions.sample(key, mean, logstd)
        logprob = distributions.log_normal_density(raw, mean, logstd)
        scaled = jnp.stack([
            jnp.clip(raw[:, 0], 0.0, 1.0),
            jnp.clip(raw[:, 1], -1.0, 1.0)], axis=-1)
        reshape = lambda x: x.reshape(a, n, *x.shape[1:])
        return (reshape(value[:, 0]), reshape(raw), reshape(logprob[:, 0]),
                reshape(scaled))

    def _train_step(self, state: TrainState):
        cfg = self.cfg
        env_step = self.env.step

        def rollout_body(carry, _):
            env_state, obs, key = carry
            key, k_act = jax.random.split(key)
            value, raw, logprob, scaled = self._generate_action(
                state.params, obs, k_act)
            env_state, obs_next, reward, done, info = env_step(env_state, scaled)
            obs_store = obs
            if cfg.obs_store_dtype is not None:
                obs_store = obs.replace(
                    scans=obs.scans.astype(cfg.obs_store_dtype))
            out = (obs_store, raw, logprob, value, reward, done, info)
            return (env_state, obs_next, key), out

        # Observation is a pure function of env state; recompute at entry
        # (avoids aliased buffers in the donated train state).
        obs0 = self.env._obs(state.env_state)
        (env_state, obs, key), traj = jax.lax.scan(
            rollout_body, (state.env_state, obs0, state.key), None,
            length=cfg.horizon)
        (obs_t, raw_t, logprob_t, value_t, reward_t, done_t, info_t) = traj

        # Bootstrap value at the horizon (ppo_stage1.py:94-97).
        last_value, _, _, (a, n) = self._policy_forward(state.params, obs)
        last_value = last_value[:, 0].reshape(a * n)

        t = cfg.horizon
        e = a * n
        flat_e = lambda x: x.reshape(t, e, *x.shape[3:])
        targets, advs = gae.generate_train_data(
            flat_e(reward_t), flat_e(value_t), last_value,
            flat_e(done_t.astype(jnp.float32)), cfg.gamma, cfg.lam)
        advs = normalize_advantages(advs)

        # Arena-major flattening (A, N, T) so the batch's leading axis is
        # shard-contiguous: each device's samples form one block, letting
        # ppo_update_sharded permute minibatches shard-locally with zero
        # cross-device regather (the grad psum is the only collective).
        flat_m = lambda x: jnp.moveaxis(x, 0, 2).reshape(
            t * e, *x.shape[3:])
        flat_te = lambda x: x.T.reshape(t * e)
        batch = Batch(
            scans=flat_m(obs_t.scans),
            goal=flat_m(obs_t.goal),
            speed=flat_m(obs_t.speed),
            action=flat_m(raw_t),
            logprob=flat_m(logprob_t)[:, None],
            target=flat_te(targets)[:, None],
            adv=flat_te(advs)[:, None],
            weight=flat_m(info_t.valid).astype(jnp.float32),
        )

        key, k_ppo = jax.random.split(key)
        params, opt_state, loss_metrics = ppo_update_sharded(
            self.update_apply_fn, state.params, state.opt_state, self.tx,
            batch, k_ppo, cfg.ppo, self.mesh, meshlib.DATA_AXIS)

        episodes = jnp.sum(done_t & info_t.valid.astype(bool))
        metrics = {
            **loss_metrics,
            "episodes": episodes,
            "ep_return_sum": jnp.sum(info_t.ep_return),
            "reached": jnp.sum(info_t.reached),
            "crashed": jnp.sum(info_t.crashed),
            "reward_mean": jnp.mean(reward_t),
            "env_steps": jnp.array(t * e, jnp.int32),
        }
        new_state = TrainState(params=params, opt_state=opt_state,
                               env_state=env_state, key=key,
                               update=state.update + 1)
        return new_state, metrics

    # ------------------------------------------------------------------

    def train(self, state: TrainState | None = None, updates: int | None = None,
              log_fn=None, checkpoint_manager=None, checkpoint_every: int = 20,
              profile_dir: str | None = None, profile_updates: int = 3):
        """Host loop: n updates of the jitted step + logging/checkpointing.

        Checkpoint cadence matches the reference (every 20 updates,
        ``ppo_stage1.py:122-126``) but saves the *full* train state
        (params + optimizer + env + RNG) for exact resume.

        ``profile_dir``: capture a device trace (XProf/TensorBoard) of
        ``profile_updates`` post-warmup updates — updates 2..2+n, so the
        trace excludes compilation (utils/profiling.trace).
        """
        from ..utils.profiling import StepTimer, trace

        if state is None:
            state = self.init_state()
        n = updates if updates is not None else self.cfg.max_updates
        timer = StepTimer()
        profiling = None
        for i in range(n):
            if profile_dir is not None and i == min(1, n - 1):
                profiling = trace(profile_dir)
                profiling.__enter__()
            timer.start()
            state, metrics = self._step_fn(state)
            metrics = jax.device_get(metrics)
            rate = timer.stop(int(metrics["env_steps"]))
            update = int(jax.device_get(state.update))
            metrics["update"] = update
            metrics["steps_per_s"] = rate
            metrics["steps_per_s_ema"] = timer.ema
            if profiling is not None and i == min(1, n - 1) + profile_updates - 1:
                profiling.__exit__(None, None, None)
                profiling = None
            if log_fn is not None:
                log_fn(metrics)
            if checkpoint_manager is not None and update % checkpoint_every == 0:
                checkpoint_manager.save(update, state)
                ep = max(float(metrics.get("episodes", 0)), 1.0)
                checkpoint_manager.save_best(
                    update, state, float(metrics.get("reached", 0)) / ep)
        if profiling is not None:
            profiling.__exit__(None, None, None)
        return state
