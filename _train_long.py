import jax, time, json
from rl_collision_avoidance_tpu.train import Trainer, TrainConfig
from rl_collision_avoidance_tpu.algo import PPOConfig
from rl_collision_avoidance_tpu.utils.checkpoint import CheckpointManager, save_params
from rl_collision_avoidance_tpu.utils.metrics import MetricLogger

cfg = TrainConfig(world="stage1", n_arenas=32, horizon=128,
                  ppo=PPOConfig(batch_size=1024, epochs=2, learning_rate=5e-5))
tr = Trainer(cfg)
state = tr.init_state()
logger = MetricLogger("log/stage1")
ckpt = CheckpointManager("checkpoints/stage1")
t0 = time.time()
state = tr.train(state, updates=1200, log_fn=logger.log_update,
                 checkpoint_manager=ckpt, checkpoint_every=100)
save_params("checkpoints/stage1_params", jax.device_get(state.params))
print("TOTAL", round(time.time() - t0, 1), "s")
