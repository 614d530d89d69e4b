import json
from rl_collision_avoidance_tpu.eval import run_circle_eval
from rl_collision_avoidance_tpu.models import CNNPolicy
from rl_collision_avoidance_tpu.utils.checkpoint import load_params

params = load_params("checkpoints/stage1_params")
out = run_circle_eval(params, CNNPolicy(), max_steps=1500)
print(json.dumps(out))
