"""Stage-2 at the reference's EXACT configuration (VERDICT r4 missing #3).

The reference fine-tunes one 44-robot arena with minibatch 512 and 4
epochs (`/root/reference/ppo_stage2.py:22-35`: NUM_ENV=44, BATCH_SIZE=512,
EPOCH=4, HORIZON=128), warm-started from the stage-1 policy
(`ppo_stage2.py:194-200`).  The committed headline curve uses n_arenas=16
with the batch scaled 16x (`results/stage2_metrics.csv`); this script runs
the literal 1-arena configuration — warm-started from the SAME committed
stage-1 params the 16-arena run used — and writes
``results/stage2_refcfg_metrics.csv`` so the two curves can be compared
(each 1-arena update consumes 16x fewer samples, so equal sample counts
sit at 16x the update index).

Usage: python examples/stage2_refcfg.py [--updates 20000]
"""
import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from rl_collision_avoidance_tpu.train import Trainer, TrainConfig
from rl_collision_avoidance_tpu.utils.cache import enable_compilation_cache
from rl_collision_avoidance_tpu.utils.checkpoint import load_params_npz
from rl_collision_avoidance_tpu.utils.metrics import MetricLogger

RESULTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "results")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--updates", type=int, default=20000)
    args = p.parse_args()
    enable_compilation_cache()

    cfg = TrainConfig.stage2(n_arenas=1)  # == ppo_stage2.py:22-35 literally
    assert cfg.ppo.batch_size == 512 and cfg.ppo.epochs == 4
    tr = Trainer(cfg)
    assert tr.spec.n_robots == 44
    state = tr.init_state()
    tmpl = jax.device_get(state.params)
    state = tr.shard_state(state.replace(params=load_params_npz(
        os.path.join(RESULTS, "stage1_params.npz"), tmpl)))

    log_dir = os.path.join(RESULTS, "log_stage2_refcfg")
    shutil.rmtree(log_dir, ignore_errors=True)
    logger = MetricLogger(log_dir)
    tr.train(state, updates=args.updates, log_fn=logger.log_update)
    shutil.copy(os.path.join(log_dir, "metrics.csv"),
                os.path.join(RESULTS, "stage2_refcfg_metrics.csv"))
    print("wrote results/stage2_refcfg_metrics.csv")


if __name__ == "__main__":
    main()
