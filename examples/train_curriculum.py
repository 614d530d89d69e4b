"""End-to-end curriculum: stage-1 training -> stage-2 fine-tune -> circle eval.

Reproduces the reference workflow (README.md:30-46: mpiexec ppo_stage1 ->
ppo_stage2 -> circle_test) as three sequential single-process phases on one
or more TPU chips.  Takes ~15 minutes on one v5e chip.
"""
import json
import time

import jax

from rl_collision_avoidance_tpu.algo import PPOConfig  # noqa: F401 (override)
from rl_collision_avoidance_tpu.eval import run_circle_eval
from rl_collision_avoidance_tpu.models import CNNPolicy
from rl_collision_avoidance_tpu.train import Trainer, TrainConfig
from rl_collision_avoidance_tpu.utils.checkpoint import (CheckpointManager,
                                                         load_params,
                                                         save_params)
from rl_collision_avoidance_tpu.utils.metrics import MetricLogger


def train(stage: str, updates: int, n_arenas: int, warm_start=None):
    cfg = (TrainConfig.stage1 if stage == "stage1"
           else TrainConfig.stage2)(n_arenas=n_arenas)
    tr = Trainer(cfg)
    state = tr.init_state()
    if warm_start:
        params = load_params(warm_start, jax.device_get(state.params))
        state = tr.shard_state(state.replace(params=params))
    logger = MetricLogger(f"log/{stage}")
    ckpt = CheckpointManager(f"checkpoints/{stage}")
    t0 = time.time()
    state = tr.train(state, updates=updates, log_fn=logger.log_update,
                     checkpoint_manager=ckpt, checkpoint_every=25)
    best = ckpt.restore_best(jax.device_get(state))
    save_params(f"checkpoints/{stage}_params", best.params)
    print(f"{stage}: {updates} updates in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    train("stage1", updates=1200, n_arenas=32)
    train("stage2", updates=800, n_arenas=16,
          warm_start="checkpoints/stage1_params")
    params = load_params("checkpoints/stage2_params")
    # Report both the exact symmetric scenario (which deterministic
    # lockstep makes a wholesale stall for any policy — see PARITY.md) and
    # the jittered robustness study that stands in for the reference's
    # asynchronous timing.
    out = {"deterministic_symmetric":
           run_circle_eval(params, CNNPolicy(), max_steps=2000),
           "jitter_1.0m":
           run_circle_eval(params, CNNPolicy(), max_steps=2000,
                           n_arenas=16, pose_noise=1.0)}
    print(json.dumps(out))
