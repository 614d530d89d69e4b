"""Circle-swap evaluation harness (few steps, random policy)."""
import jax
import jax.numpy as jnp
import numpy as np

from rl_collision_avoidance_tpu.eval import run_circle_eval
from rl_collision_avoidance_tpu.models import CNNPolicy


def test_circle_eval_runs_and_aggregates():
    model = CNNPolicy()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 512)),
                        jnp.zeros((1, 2)), jnp.zeros((1, 2)))
    out = run_circle_eval(params, model, max_steps=5)
    assert out["n_robots"] == 50
    assert 0.0 <= out["success_rate"] <= 1.0
    assert out["collisions"] >= 0
    # a random policy cannot cross a 50 m circle in 5 steps
    assert out["success_rate"] == 0.0
    assert out["unfinished"] + out["collisions"] == 50
