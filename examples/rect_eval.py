"""Circle-50 evaluation under the FULL Stage footprint (VERDICT r4 #3).

The committed parity results run the disc approximation of the robot
footprint; Stage itself collides and raytraces the 0.44 x 0.38 m box
(`/root/reference/worlds/stage1.world:83`).  This evaluates the committed
stage-3 policy on the circle scenario with ``footprint="rect"`` — exact
box collision AND box lidar silhouettes — quantifying the disc-vs-rect
behavioral delta, plus the culled-box variant (disc_cull_k) that makes
rect usable at training scale.

Writes results/circle_eval_rect.json.
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rl_collision_avoidance_tpu.eval import run_circle_eval
from rl_collision_avoidance_tpu.models import CNNPolicy
from rl_collision_avoidance_tpu.utils.cache import enable_compilation_cache
from rl_collision_avoidance_tpu.utils.checkpoint import load_params_npz
from rl_collision_avoidance_tpu.worlds import circle as circle_world

RESULTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "results")


def main():
    enable_compilation_cache()
    model = CNNPolicy()
    tmpl = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 512)),
                      jnp.zeros((1, 2)), jnp.zeros((1, 2)))
    params = load_params_npz(os.path.join(RESULTS, "circle_ft_params.npz"),
                             tmpl)
    disc = circle_world()
    rect = dataclasses.replace(disc, footprint="rect")
    out = {
        "note": ("stage-3 (circle_ft) policy — trained on disc worlds — "
                 "evaluated under Stage's exact 0.44 x 0.38 box footprint "
                 "(collision + lidar silhouettes).  'rect_culled' uses the "
                 "k-nearest-neighbor box culling (disc_cull_k=12)."),
        "disc_deterministic": run_circle_eval(params, model, spec=disc,
                                              max_steps=3000),
        "rect_deterministic": run_circle_eval(params, model, spec=rect,
                                              max_steps=3000),
        "disc_jitter_0.3m": run_circle_eval(params, model, spec=disc,
                                            max_steps=3000, n_arenas=16,
                                            pose_noise=0.3),
        "rect_jitter_0.3m": run_circle_eval(params, model, spec=rect,
                                            max_steps=3000, n_arenas=16,
                                            pose_noise=0.3),
        "rect_culled_deterministic": run_circle_eval(
            params, model, spec=rect, max_steps=3000,
            env_kwargs={"disc_cull_k": 12}),
    }
    with open(os.path.join(RESULTS, "circle_eval_rect.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
