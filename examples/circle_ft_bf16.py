"""Stage-3 circle fine-tune in bf16 mixed precision (VERDICT r4 missing #1).

Re-runs the committed circle_ft phase (examples/make_results.py: 2000
updates, 16 arenas, warm-started from results/stage2_params.npz, best-on-
jittered-circle checkpoint selection every 50 updates) with
``policy_dtype=bfloat16`` + bf16 obs storage, then evaluates the selected
params on the deterministic scenario and the 0.3 m jitter sweep.

Artifacts:
    results/circle_ft_bf16_metrics.csv   per-update training metrics
    results/circle_ft_bf16_params.npz    selected policy weights
    results/circle_ft_bf16_eval.json     deterministic + jitter eval

Usage: python examples/circle_ft_bf16.py [--updates 2000]
"""
import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from make_results import RESULTS, SELECT_NOISE, _select_score
from rl_collision_avoidance_tpu.eval import run_circle_eval
from rl_collision_avoidance_tpu.models import CNNPolicy
from rl_collision_avoidance_tpu.train import Trainer, TrainConfig
from rl_collision_avoidance_tpu.utils.cache import enable_compilation_cache
from rl_collision_avoidance_tpu.utils.checkpoint import (load_params_npz,
                                                         save_params_npz)
from rl_collision_avoidance_tpu.utils.metrics import MetricLogger


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--updates", type=int, default=2000)
    p.add_argument("--select-every", type=int, default=50)
    p.add_argument("--f32-obs", action="store_true",
                   help="keep the scan history in f32 (bf16 activations "
                        "only) — isolates whether the bf16 obs "
                        "quantization (~1.2 cm at 6 m) is what breaks the "
                        "deterministic sub-centimeter symmetry-breaking")
    args = p.parse_args()
    enable_compilation_cache()

    cfg = TrainConfig.circle_ft(
        n_arenas=16, policy_dtype=jnp.bfloat16,
        obs_store_dtype=None if args.f32_obs else jnp.bfloat16)
    suffix = "_f32obs" if args.f32_obs else ""
    tr = Trainer(cfg)
    state = tr.init_state()
    tmpl = jax.device_get(state.params)
    state = tr.shard_state(state.replace(params=load_params_npz(
        os.path.join(RESULTS, "stage2_params.npz"), tmpl)))

    log_dir = os.path.join(RESULTS, "log_circle_ft_bf16" + suffix)
    shutil.rmtree(log_dir, ignore_errors=True)
    logger = MetricLogger(log_dir)
    model = CNNPolicy()
    best_score, best_params = -10.0, jax.device_get(state.params)
    for done in range(0, args.updates, args.select_every):
        n = min(args.select_every, args.updates - done)
        state = tr.train(state, updates=n, log_fn=logger.log_update)
        params = jax.device_get(state.params)
        ev = run_circle_eval(params, model, max_steps=3000, n_arenas=8,
                             pose_noise=SELECT_NOISE)
        score = _select_score(ev)
        print(f"[select] update {done + n}: success "
              f"{ev['success_rate_mean']:.3f} coll "
              f"{ev['collisions_mean']:.1f}", flush=True)
        if score > best_score:
            best_score, best_params = score, params

    save_params_npz(os.path.join(RESULTS, f"circle_ft_bf16{suffix}_params.npz"),
                    best_params)
    shutil.copy(os.path.join(log_dir, "metrics.csv"),
                os.path.join(RESULTS, f"circle_ft_bf16{suffix}_metrics.csv"))
    out = {
        "note": ("circle_ft re-trained in bf16 mixed precision ("
                 + ("bf16 activations, f32 obs storage" if args.f32_obs
                    else "--bf16 --obs-bf16 equivalent")
                 + "); compare results/circle_eval.json (f32 run)"),
        "deterministic": run_circle_eval(best_params, model, max_steps=3000),
        "jitter_0.3m": run_circle_eval(best_params, model, max_steps=3000,
                                       n_arenas=32, pose_noise=0.3),
    }
    with open(os.path.join(RESULTS, f"circle_ft_bf16{suffix}_eval.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
