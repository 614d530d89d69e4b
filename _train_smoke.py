import jax, time, json
from rl_collision_avoidance_tpu.train import Trainer, TrainConfig
from rl_collision_avoidance_tpu.algo import PPOConfig

# Small-but-real stage-1 run: 8 arenas x 24 robots = 192 envs, horizon 128.
cfg = TrainConfig(world="stage1", n_arenas=8, horizon=128,
                  ppo=PPOConfig(batch_size=1024, epochs=2,
                                learning_rate=5e-5))
tr = Trainer(cfg)
state = tr.init_state()
logs = []
t0 = time.time()
def log(m):
    logs.append(m)
    if m["update"] % 10 == 0:
        print(json.dumps({k: round(float(v), 3) for k, v in m.items()}), flush=True)
state = tr.train(state, updates=150, log_fn=log)
print("TOTAL", round(time.time()-t0, 1), "s")
import numpy as np
rm = [m["reward_mean"] for m in logs]
print("reward_mean first10", round(float(np.mean(rm[:10])), 4),
      "last10", round(float(np.mean(rm[-10:])), 4))
succ = [m["reached"] for m in logs]
print("reached first10", float(np.mean(succ[:10])), "last10", float(np.mean(succ[-10:])))
