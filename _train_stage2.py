import jax, time
from rl_collision_avoidance_tpu.train import Trainer, TrainConfig
from rl_collision_avoidance_tpu.utils.checkpoint import (CheckpointManager,
                                                         load_params,
                                                         save_params)
from rl_collision_avoidance_tpu.utils.metrics import MetricLogger

cfg = TrainConfig.stage2(n_arenas=16)   # batch scales to 8192: 11 mb x 4 ep
tr = Trainer(cfg)
state = tr.init_state()
params = load_params("checkpoints/stage1_params", jax.device_get(state.params))
state = tr.shard_state(state.replace(params=params))
logger = MetricLogger("log/stage2b")
ckpt = CheckpointManager("checkpoints/stage2")
t0 = time.time()
state = tr.train(state, updates=800, log_fn=logger.log_update,
                 checkpoint_manager=ckpt, checkpoint_every=25)
best = ckpt.restore_best(jax.device_get(state))
save_params("checkpoints/stage2_params", best.params)
print("TOTAL", round(time.time() - t0, 1), "s")
